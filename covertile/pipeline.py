"""End-to-end pipeline stages: derive -> plan -> checkpointed index build.

All stages are Dataset -> Dataset (or Dataset -> small driver-side plan);
nothing here materializes the full input.  The only all-to-all exchange in
the build is ONE shuffle keyed by partition id (groupby(pid).map_groups),
replacing the reference's per-iteration Allreduce/Allgatherv collectives and
MPI_Alltoallv point routing (/root/reference/src/DistCoverTree.cpp:85-130,
861-880) with a single Ray Data hash shuffle; the iterative hub-chain build
runs entirely inside each group task on numpy arrays (SURVEY.md §4.3).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa

from . import cells, geometry, store
from .covertree import CoverTree
from .partition import (HierarchicalPlan, PartitionPlan, make_plan,
                        plan_from_json)

DEFAULT_BASE = 2.0
DEFAULT_TARGET_PARTITION_POINTS = 200_000


# ------------------------------------------------------------------- derive

def derive_points(docs_ds, resolution: int, id_col: str = "doc_id"):
    """documents -> points: (doc_id, x, y, cell) via the deterministic
    geometry derivation; vectorized, zero-copy Arrow in/out.

    The reference analogue is binary point decode (src/Point.cpp:113-142);
    here geometry is a pure function of doc_id (see geometry.py) so the
    DuckDB oracle can mirror it.
    """
    def to_points(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        x, y = geometry.derive_xy(ids)
        c = cells.cell_of(x, y, resolution)
        return pa.table({
            "doc_id": ids,
            "x": x,
            "y": y,
            "cell": c.astype(np.int64),
        })
    return docs_ds.map_batches(to_points, batch_format="pyarrow")


def auto_resolution(n_points: int, radius: float | None = None,
                    target_cell_points: int = 50_000) -> int:
    """Pick a Morton resolution: fine enough for >= ~4 cells/partition of
    load-balance headroom, coarse enough that a cell side stays >= ~2*radius
    (so halo fan-out is a 3x3 neighborhood, not dozens of cells)."""
    r_density = max(1, int(np.ceil(np.log2(max(2.0, n_points / target_cell_points)) / 2)) + 1)
    if radius is not None and radius > 0:
        r_radius = int(np.floor(np.log2(cells.WORLD_SIDE / (2.0 * radius))))
        return int(np.clip(min(r_density, r_radius), 1, 14))
    return int(np.clip(r_density, 1, 14))


# --------------------------------------------------------------------- plan

FLAT_PLAN_MAX_RES = 14  # flat plan arrays are one entry per occupied
                        # cell (<= 4^res): ~268M at res 14; beyond that
                        # the plan goes hierarchical automatically


def _combine_cell_counts(partials) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side final combine of (cell, n) partial tables (tiny)."""
    tbl = pa.concat_tables(
        partials.iter_batches(batch_size=None, batch_format="pyarrow"))
    cell = tbl["cell"].to_numpy().astype(np.uint64)
    n = tbl["n"].to_numpy().astype(np.int64)
    uniq, inv = np.unique(cell, return_inverse=True)
    counts = np.bincount(inv, weights=n).astype(np.int64)
    return uniq, counts


def compute_plan(points_ds, resolution: int, target_points: int,
                 min_partitions: int = 1, coarse_resolution: int | None = None):
    """Cell-count aggregate (small) -> PartitionPlan | HierarchicalPlan.

    Flat path (resolution <= 14): each block is reduced to (cell, count)
    partials inside map_batches, so what reaches the driver is bounded by
    blocks x distinct-cells — a final numpy combine on the driver replaces
    an all-to-all groupby shuffle whose fixed cost would dwarf the
    kilobytes being combined.  This is the A3 skew-detection aggregate
    (reference per-hub counts, /root/reference/src/DistCoverTree.cpp:45-83)
    as partial + driver-side final combine.

    Hierarchical path (resolution > 14, or coarse_resolution given):
    coarse-prefix counts first (driver bounded by 4^coarse_res), then a
    second distributed pass counts fine cells ONLY inside overweight
    prefixes; that partial table is range-sorted by cell code and streamed
    prefix-at-a-time through the driver, which holds at most ONE prefix's
    occupied fine cells (<= 4^(res - coarse_res)) while building its
    sub-plan.  See partition.HierarchicalPlan for the broadcast-size
    argument.
    """
    if coarse_resolution is None and resolution <= FLAT_PLAN_MAX_RES:
        def partial_counts(batch: pa.Table) -> pa.Table:
            c, n = np.unique(batch["cell"].to_numpy(), return_counts=True)
            return pa.table({"cell": c, "n": n.astype(np.int64)})

        uniq, counts = _combine_cell_counts(
            points_ds.map_batches(partial_counts, batch_format="pyarrow"))
        return make_plan(uniq, counts, resolution, target_points,
                         min_partitions)

    rc = (coarse_resolution if coarse_resolution is not None
          else FLAT_PLAN_MAX_RES)
    assert 1 <= rc < resolution
    shift = np.uint64(2 * (resolution - rc))

    def coarse_partial(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy().astype(np.uint64) >> shift
        u, n = np.unique(c, return_counts=True)
        return pa.table({"cell": u, "n": n.astype(np.int64)})

    uniq, counts = _combine_cell_counts(
        points_ds.map_batches(coarse_partial, batch_format="pyarrow"))
    total = int(counts.sum())
    target = max(1, min(int(target_points),
                        (total // max(1, min_partitions)) + 1))
    hot_m = counts > target
    hot = uniq[hot_m]  # sorted (np.unique)
    top = make_plan(uniq[~hot_m], counts[~hot_m], rc, target, 1)
    if len(hot) == 0:
        return HierarchicalPlan(resolution, rc, top, hot, [],
                                np.zeros(0, np.int64), top.num_partitions)

    def fine_partial(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy().astype(np.uint64)
        coarse = cell >> shift
        j = np.searchsorted(hot, coarse)
        j = np.clip(j, 0, len(hot) - 1)
        m = hot[j] == coarse
        u, n = np.unique(cell[m], return_counts=True)
        return pa.table({"cell": u, "n": n.astype(np.int64)})

    # range-sort the (fine cell, n) partials so prefixes arrive contiguous;
    # the driver then never holds more than one prefix's cells at a time
    stream = (points_ds.map_batches(fine_partial, batch_format="pyarrow")
              .sort("cell"))

    subs, sub_codes, sub_off = [], [], []
    pid_next = top.num_partitions
    cur = None
    buf_c: list[np.ndarray] = []
    buf_n: list[np.ndarray] = []

    def finalize():
        nonlocal pid_next
        codes = np.concatenate(buf_c)
        ns = np.concatenate(buf_n)
        u, inv = np.unique(codes, return_inverse=True)
        cnt = np.bincount(inv, weights=ns).astype(np.int64)
        sp = make_plan(u, cnt, resolution, target, 1)
        subs.append(sp)
        sub_codes.append(cur)
        sub_off.append(pid_next)
        pid_next += sp.num_partitions

    for batch in stream.iter_batches(batch_size=None,
                                     batch_format="pyarrow"):
        if len(batch) == 0:
            continue
        codes = batch["cell"].to_numpy().astype(np.uint64)
        ns = batch["n"].to_numpy().astype(np.int64)
        pref = codes >> shift
        seg = np.flatnonzero(np.diff(pref)) + 1
        for lo, hi in zip(np.r_[0, seg], np.r_[seg, len(codes)]):
            p = pref[lo]
            if cur is not None and p != cur:
                finalize()
                buf_c, buf_n = [], []
            cur = p
            buf_c.append(codes[lo:hi])
            buf_n.append(ns[lo:hi])
    if cur is not None and buf_c:
        finalize()
    return HierarchicalPlan(
        resolution, rc, top,
        np.asarray(sub_codes, np.uint64), subs,
        np.asarray(sub_off, np.int64), pid_next)


# -------------------------------------------------------------------- index

class Index:
    """Handle to a built (or building) checkpointed partitioned index."""

    def __init__(self, ckpt_dir: str, plan: PartitionPlan, base: float):
        self.ckpt_dir = ckpt_dir
        self.plan = plan
        self.base = base

    @classmethod
    def load(cls, ckpt_dir: str) -> "Index":
        with open(os.path.join(ckpt_dir, "plan.json")) as f:
            d = json.load(f)
        return cls(ckpt_dir, plan_from_json(d["plan"]), d["base"])

    def lineage(self) -> list[dict]:
        return store.load_manifests(self.ckpt_dir)


def config_hash(**kwargs) -> str:
    return hashlib.sha256(
        json.dumps(kwargs, sort_keys=True).encode()).hexdigest()[:16]


def build_index(
    points_ds,
    ckpt_dir: str,
    resolution: int,
    target_points: int = DEFAULT_TARGET_PARTITION_POINTS,
    base: float = DEFAULT_BASE,
    min_partitions: int = 1,
    coarse_resolution: int | None = None,
) -> Index:
    """Build per-partition cover trees with checkpoint/resume.

    Stages: (1) plan (reuse plan.json if present — pid stability across
    resumes), (2) filter out already-done partitions, (3) ONE shuffle
    groupby(pid), (4) per-group numpy tree build + atomic checkpoint write +
    lineage manifest.  Safe to re-run after a crash: completed partitions are
    skipped; re-built partitions overwrite byte-identically (pure function
    of partition input + config).
    """
    plan_path = os.path.join(ckpt_dir, "plan.json")
    if os.path.exists(plan_path):
        idx = Index.load(ckpt_dir)
        plan = idx.plan
    else:
        plan = compute_plan(points_ds, resolution, target_points,
                            min_partitions, coarse_resolution)
        store.atomic_write_bytes(plan_path, json.dumps({
            "plan": plan.to_json(),
            "base": base,
            "config": config_hash(resolution=resolution,
                                  target_points=target_points, base=base,
                                  coarse_resolution=coarse_resolution),
        }).encode())
        idx = Index(ckpt_dir, plan, base)

    done = store.done_pids(ckpt_dir)
    if len(done) >= plan.num_partitions:
        return idx  # fully built

    def assign_pid(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy().astype(np.uint64)
        ids = batch["doc_id"].to_numpy()
        pid = plan.pid_of_points(cell, ids)
        t = batch.append_column("pid", pa.array(pid, pa.int64()))
        if done:
            mask = ~np.isin(pid, np.fromiter(done, np.int64, len(done)))
            t = t.filter(pa.array(mask))
        return t

    ck = ckpt_dir
    b = base

    def build_group(group: pa.Table) -> pa.Table:
        pid = int(group["pid"][0].as_py())
        ids = group["doc_id"].to_numpy()
        # deterministic local order: sort by doc_id so point 0 (the root,
        # ref src/CoverTree.cpp:64) is the smallest doc id in the partition
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        xy = np.stack([group["x"].to_numpy()[order],
                       group["y"].to_numpy()[order]], axis=1)
        t0 = time.perf_counter()
        tree = CoverTree(xy, base=b).build()
        wall = time.perf_counter() - t0
        lineage = {
            "stage": "build", "pid": pid, "n_points": int(len(ids)),
            "n_vertices": int(tree.num_vertices),
            "n_levels": int(tree.num_levels), "niters": int(tree.niters),
            "build_wall_s": round(wall, 4),
            "max_radius": tree.max_radius,
        }
        store.save_tree(ck, pid, tree, ids, lineage)
        return pa.table({
            "pid": pa.array([pid], pa.int64()),
            "n_points": pa.array([len(ids)], pa.int64()),
            "n_vertices": pa.array([tree.num_vertices], pa.int64()),
            "build_wall_s": pa.array([wall], pa.float64()),
        })

    from .joins import mat
    (mat(points_ds.map_batches(assign_pid, batch_format="pyarrow"))
     .groupby("pid")
     .map_groups(build_group, batch_format="pyarrow")
     .count())  # consume: small lineage rows only
    return idx
