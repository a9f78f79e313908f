"""Hierarchical partition plan: res-16 construction with bounded driver
state, lookup invariants, and query-result invariance vs a flat plan."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _synth_cells(res: int) -> tuple[np.ndarray, np.ndarray]:
    """Skewed synthetic point cells at `res`: a hotspot coarse prefix with
    thousands of points over few fine cells, plus a uniform background."""
    rng = np.random.default_rng(7)
    side = np.uint64(1) << np.uint64(res)
    # hotspot: 6000 points in a 16x16 fine-cell square (one coarse prefix)
    hx = rng.integers(0, 16, 6000).astype(np.uint64)
    hy = rng.integers(0, 16, 6000).astype(np.uint64)
    # background: 2000 points uniform over the whole grid
    bx = rng.integers(0, int(side), 2000).astype(np.uint64)
    by = rng.integers(0, int(side), 2000).astype(np.uint64)
    from covertile import cells
    code = cells.morton_encode(np.concatenate([hx, bx]),
                               np.concatenate([hy, by]))
    ids = np.arange(len(code), dtype=np.int64)
    return code, ids


def test_hierarchical_plan_res16(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from covertile.partition import HierarchicalPlan, plan_from_json
    from covertile.pipeline import compute_plan

    res, coarse, target = 16, 6, 256
    code, ids = _synth_cells(res)
    ds = rd.from_arrow(pa.table({"cell": code.astype(np.int64)}))
    plan = compute_plan(ds, res, target, coarse_resolution=coarse)
    assert isinstance(plan, HierarchicalPlan)
    assert plan.resolution == res and plan.coarse_resolution == coarse
    assert len(plan.subs) >= 1  # the hotspot prefix was refined
    # driver-held state is the top plan + per-prefix sub-plans, each over
    # one prefix's occupied fine cells
    for sp in plan.subs:
        assert len(sp.cell_codes) <= 4 ** (res - coarse)

    # every point maps to a valid pid; loads respect the target except for
    # salted single fine cells
    pid = plan.pid_of_points(code, ids)
    assert (pid >= 0).all() and (pid < plan.num_partitions).all()
    assert len(np.unique(pid)) == plan.num_partitions  # no empty pids
    loads = np.bincount(pid, minlength=plan.num_partitions)
    fine_counts = np.bincount(
        np.unique(code, return_inverse=True)[1]).max()
    assert loads.max() <= max(target, fine_counts)

    # owner pid is always inside the cell's fan-out set
    rep, fan = plan.pids_of_cells(code)
    for i in np.random.default_rng(1).integers(0, len(code), 64):
        assert pid[i] in fan[rep == i]

    # a cell whose COARSE prefix is unoccupied: no fan-out, pid -1
    # (fine cells inside an occupied unrefined prefix map to its partition
    # by design — coarse granularity is the whole point of the top plan)
    shift = np.uint64(2 * (res - coarse))
    occ = np.unique(code >> shift)
    missing = np.setdiff1d(
        np.arange(4 ** coarse, dtype=np.uint64), occ)
    assert len(missing) > 0
    bogus = np.array([missing[0] << shift], np.uint64)
    assert plan.pid_of_points(bogus, np.zeros(1, np.int64))[0] == -1
    r2, f2 = plan.pids_of_cells(bogus)
    assert len(r2) == 0 and len(f2) == 0

    # serialization round-trip preserves every lookup
    p2 = plan_from_json(plan.to_json())
    assert isinstance(p2, HierarchicalPlan)
    assert np.array_equal(p2.pid_of_points(code, ids), pid)
    r3, f3 = p2.pids_of_cells(code)
    assert np.array_equal(r3, rep) and np.array_equal(f3, fan)


def test_hierarchical_no_hot_prefixes(ray_session):
    """All prefixes under target -> empty sub list, top plan serves all."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.pipeline import compute_plan

    res, coarse = 16, 6
    code, ids = _synth_cells(res)
    ds = rd.from_arrow(pa.table({"cell": code.astype(np.int64)}))
    plan = compute_plan(ds, res, 100_000, coarse_resolution=coarse)
    assert len(plan.subs) == 0
    pid = plan.pid_of_points(code, ids)
    assert (pid >= 0).all()


def test_hierarchical_index_query_invariance(ray_session, tmp_path):
    """epsilon over a hierarchical-plan index == epsilon over a flat-plan
    index, bitwise — partitioning must never change query results."""
    import ray.data as rd
    from covertile.partition import HierarchicalPlan
    from covertile.pipeline import build_index, derive_points
    from covertile.queries import epsilon_graph_self

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    radius = 0.5

    flat_idx = build_index(derive_points(docs, 3), str(tmp_path / "flat"),
                           3, target_points=64, min_partitions=4)
    hier_idx = build_index(derive_points(docs, 8), str(tmp_path / "hier"),
                           8, target_points=64, min_partitions=4,
                           coarse_resolution=3)
    assert isinstance(hier_idx.plan, HierarchicalPlan)
    assert hier_idx.plan.num_partitions >= 4

    def fetch(idx):
        return (epsilon_graph_self(idx, radius).to_pandas()
                .sort_values(["src_id", "dst_id"]).reset_index(drop=True))

    a, b = fetch(flat_idx), fetch(hier_idx)
    assert len(a) == len(b) and len(a) > 0
    for c in ["src_id", "dst_id"]:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy())
    assert np.array_equal(a["dist"].to_numpy().view(np.int64),
                          b["dist"].to_numpy().view(np.int64))
