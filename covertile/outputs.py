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

__all__ = ["epsilon_graph_to_store", "read_edge_store", "edge_store_lineage",
           "knn_self_to_store", "read_knn_store"]


def _part_path(out_dir: str, sub: str, pid: int) -> str:
    return os.path.join(out_dir, sub, f"pid={pid}.parquet")


def _edges_path(out_dir: str, pid: int) -> str:
    return _part_path(out_dir, "edges", pid)


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


def knn_self_to_store(index, k: int, out_dir: str) -> dict:
    """Exact kNN SELF-join (queries = the indexed points) written as one
    parquet per HOME partition + manifest; a re-run recomputes only
    missing home pids.

    Same two-phase refinement as queries.knn_join(mode="self"): phase 1
    answers each todo pid's own checkpointed points locally; only the
    boundary sliver (d_k disc crossing cells of other pids) re-routes, and
    neighbor pids' trees are loaded read-only regardless of their own
    done-ness — a query's output depends only on its home pid, so home-pid
    granularity is a sound resume unit.  Use a dedicated out_dir per
    stage (the manifest dir is shared within an out_dir).

    Output files: (query_id, rank 1..k, neighbor_id, dist) sorted by
    (query_id, rank).  Returns {"pids_written": w, "pids_skipped": s}.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from .queries import (KNN_RADIUS_CAP, _knn_merge, route_queries)

    done = _done(out_dir)
    plan = index.plan
    ck = index.ckpt_dir
    todo = np.array(sorted(set(range(plan.num_partitions)) - done), np.int64)
    if len(todo) == 0:
        return {"pids_written": 0, "pids_skipped": len(done)}

    pids_ds = rd.range(len(todo), override_num_blocks=min(len(todo), 256)) \
        .map_batches(lambda b: pa.table({"pid": todo[b["id"].to_numpy()]}),
                     batch_format="pyarrow")

    def local_knn(batch: pa.Table) -> pa.Table:
        outs = []
        for pid in batch["pid"].to_numpy():
            tree, doc_ids = store.load_tree(ck, int(pid))
            t = pa.table(kernels.knn_home_kernel(
                tree, doc_ids, int(pid), doc_ids,
                tree.xy[:, 0], tree.xy[:, 1], k, plan, KNN_RADIUS_CAP))
            outs.append(t.append_column(
                "home_pid", pa.array(np.full(len(t), pid, np.int64))))
        return pa.concat_tables(outs) if outs else pa.table({
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "dist": pa.array([], pa.float64()),
            "home_pid": pa.array([], pa.int64()),
        })

    phase1 = pids_ds.map_batches(local_knn, batch_format="pyarrow") \
        .materialize()
    final = phase1.map_batches(
        lambda t: t.filter(pc.greater(t["rank"], 0)),
        batch_format="pyarrow")
    pending = phase1.map_batches(
        lambda t: t.filter(pc.equal(t["rank"], 0)), batch_format="pyarrow")

    if pending.count() > 0:
        def rehydrate(batch: pa.Table) -> pa.Table:
            x, y = kernels.unpack_xy(batch["neighbor_id"].to_numpy())
            return pa.table({"src_id": batch["query_id"], "x": x, "y": y,
                             "radius": batch["dist"]})

        # the pending sliver inherits phase-1's block structure; without a
        # repartition the phase-2 chain runs near-serial
        queries = (pending.map_batches(rehydrate, batch_format="pyarrow")
                   .repartition(64))
        routed = route_queries(queries, plan, with_home=True)

        def cand_group(group: pa.Table) -> pa.Table:
            pid = int(group["pid"][0].as_py())
            tree, doc_ids = store.load_tree(ck, pid)
            return pa.table(kernels.knn_candidate_kernel(
                tree, doc_ids, group["src_id"].to_numpy(),
                group["x"].to_numpy(), group["y"].to_numpy(),
                group["radius"].to_numpy(), group["home_pid"].to_numpy()))

        def merge_with_pid(g: pa.Table) -> pa.Table:
            t = _knn_merge(g, k)
            t = t.filter(pc.greater(t["rank"], 0))
            return pa.table({
                "query_id": t["query_id"],
                "rank": t["rank"],
                "neighbor_id": t["neighbor_id"],
                "dist": t["dist"],
                "home_pid": pa.array(np.full(
                    len(t), int(g["home_pid"][0].as_py()), np.int64)),
            })

        phase2 = (routed.groupby("pid")
                  .map_groups(cand_group, batch_format="pyarrow")
                  .groupby("home_pid")
                  .map_groups(merge_with_pid, batch_format="pyarrow"))
        final = final.union(phase2)

    def write_group(group: pa.Table) -> pa.Table:
        pid = int(group["home_pid"][0].as_py())
        q = group["query_id"].to_numpy()
        r = group["rank"].to_numpy()
        nb = group["neighbor_id"].to_numpy()
        d = group["dist"].to_numpy()
        t0 = time.perf_counter()
        order = np.lexsort((r, q))
        tbl = pa.table({"query_id": q[order], "rank": r[order],
                        "neighbor_id": nb[order], "dist": d[order]})
        path = _part_path(out_dir, "knn", pid)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        pq.write_table(tbl, tmp, compression="zstd")
        os.replace(tmp, path)
        store.atomic_write_bytes(_manifest_path(out_dir, pid), json.dumps({
            "stage": "knn_self", "pid": pid, "k": k,
            "n_queries": int(len(np.unique(q))), "n_rows": int(len(q)),
            "wall_s": round(time.perf_counter() - t0, 4),
        }).encode())
        return pa.table({"pid": pa.array([pid], pa.int64()),
                         "n_rows": pa.array([len(q)], pa.int64())})

    written = (final.groupby("home_pid")
               .map_groups(write_group, batch_format="pyarrow").count())
    return {"pids_written": int(written), "pids_skipped": len(done)}


def read_knn_store(out_dir: str):
    """kNN store -> Dataset (reads only completed partitions)."""
    import ray.data as rd
    paths = [_part_path(out_dir, "knn", pid) for pid in sorted(_done(out_dir))]
    return rd.read_parquet(paths)


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
