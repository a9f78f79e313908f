"""Resumable partitioned query outputs.

Brief requirement: "write partitioned Parquet (one directory per input
shard / key range) so a failed run can skip finished partitions; never one
giant file."

`epsilon_graph_to_store` runs the bulk radius self-join with its results
written INSIDE the group task — one parquet per partition (atomic tmp +
rename) plus a manifest row per completed partition.  A re-run filters
already-done pids out BEFORE the shuffle, so only missing partitions are
recomputed; outputs are a pure function of (partition input, radius), so
resumed files are byte-identical to a fresh run's.  The same pattern
applies to any per-partition query stage.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import kernels, store
from .queries import route_queries

__all__ = ["epsilon_graph_to_store", "read_edge_store", "edge_store_lineage"]


def _edges_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, "edges", f"pid={pid}.parquet")


def _manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, "manifest", f"pid={pid}.json")


def _done(out_dir: str) -> set[int]:
    d = os.path.join(out_dir, "manifest")
    if not os.path.isdir(d):
        return set()
    return {int(f[4:-5]) for f in os.listdir(d)
            if f.startswith("pid=") and f.endswith(".json")}


def epsilon_graph_to_store(index, points_ds, radius: float,
                           out_dir: str) -> dict:
    """Radius self-join -> out_dir/edges/pid=N.parquet (+ manifest).

    Returns {"pids_written": k, "pids_skipped": s}.  Edges are sorted
    (src_id, dst_id) within each partition file; a global canonical order
    is the partition-major concatenation (each src belongs to exactly one
    routed pid set, and files are read back in pid order).
    """
    done = _done(out_dir)
    plan = index.plan
    ck = index.ckpt_dir

    def add_radius(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "src_id": batch["doc_id"],
            "x": batch["x"],
            "y": batch["y"],
            "radius": pa.array(np.full(n, radius), pa.float64()),
        })

    routed = route_queries(
        points_ds.map_batches(add_radius, batch_format="pyarrow"), plan)
    if done:
        done_arr = np.fromiter(done, np.int64, len(done))

        def drop_done(batch: pa.Table) -> pa.Table:
            pid = batch["pid"].to_numpy()
            return batch.filter(pa.array(~np.isin(pid, done_arr)))

        routed = routed.map_batches(drop_done, batch_format="pyarrow")

    def write_group(group: pa.Table) -> pa.Table:
        pid = int(group["pid"][0].as_py())
        tree, doc_ids = store.load_tree(ck, pid)
        t0 = time.perf_counter()
        s, d, dist = kernels.radius_kernel(
            tree, doc_ids, group["src_id"].to_numpy(),
            group["x"].to_numpy(), group["y"].to_numpy(),
            group["radius"].to_numpy())
        order = np.lexsort((d, s))
        tbl = pa.table({"src_id": s[order], "dst_id": d[order],
                        "dist": dist[order]})
        path = _edges_path(out_dir, pid)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        pq.write_table(tbl, tmp, compression="zstd")
        os.replace(tmp, path)
        store.atomic_write_bytes(_manifest_path(out_dir, pid), json.dumps({
            "stage": "epsilon_graph", "pid": pid,
            "n_queries": int(len(group)), "n_edges": int(len(s)),
            "radius": radius,
            "wall_s": round(time.perf_counter() - t0, 4),
        }).encode())
        return pa.table({"pid": pa.array([pid], pa.int64()),
                         "n_edges": pa.array([len(s)], pa.int64())})

    written = (routed.groupby("pid")
               .map_groups(write_group, batch_format="pyarrow").count())
    return {"pids_written": int(written), "pids_skipped": len(done)}


def read_edge_store(out_dir: str):
    """Edge store -> Dataset (reads only completed partitions)."""
    import ray.data as rd
    paths = [_edges_path(out_dir, pid) for pid in sorted(_done(out_dir))]
    return rd.read_parquet(paths)


def edge_store_lineage(out_dir: str) -> list[dict]:
    rows = []
    d = os.path.join(out_dir, "manifest")
    if not os.path.isdir(d):
        return rows
    for name in sorted(os.listdir(d)):
        with open(os.path.join(d, name)) as f:
            rows.append(json.load(f))
    return rows
