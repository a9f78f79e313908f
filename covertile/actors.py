"""Stateful query actors: load per-partition cover trees once, serve batches.

The Ray-Data-native analogue of the reference's "query server" role of a
built tree (/root/reference/src/CoverTree.cpp:354-384) and of the
replicated-top-tree + local-trees layout (src/DistCoverTree.cpp:760-934):
instead of replicating points to every rank and issuing one collective per
query point (:694-720 — the scalability cliff), query rows are shuffled BY
PARTITION KEY to an actor pool; each actor lazily loads the partitions it
sees from the checkpoint store (LRU-cached) and answers whole Arrow batches
vectorized.  Query routing sorts by pid first, so consecutive batches hit
the same cached tree.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pyarrow as pa

from . import kernels, store

__all__ = ["RadiusQueryActor", "KnnCandidateActor", "KnnHomeActor",
           "TreeCache"]


class TreeCache:
    """LRU of (tree, doc_ids) per pid, loaded from the checkpoint store."""

    def __init__(self, ckpt_dir: str, capacity: int = 8):
        self.ckpt_dir = ckpt_dir
        self.capacity = capacity
        self._cache: OrderedDict[int, tuple] = OrderedDict()

    def get(self, pid: int):
        if pid in self._cache:
            self._cache.move_to_end(pid)
            return self._cache[pid]
        item = store.load_tree(self.ckpt_dir, pid)
        self._cache[pid] = item
        if len(self._cache) > self.capacity:
            self._cache.popitem(last=False)
        return item


class RadiusQueryActor:
    """map_batches callable class (actor pool): epsilon-radius queries.

    Input batch:  (pid, src_id, x, y, radius)
    Output batch: (src_id, dst_id, dist) — every build point of partition
    `pid` within the closed ball of the query.  Each (src_id, pid) pair
    occurs once globally (the router dedups), and each point is owned by
    exactly one pid, so the global edge set needs no dedup shuffle.
    """

    def __init__(self, ckpt_dir: str, cache_capacity: int = 8):
        self.cache = TreeCache(ckpt_dir, cache_capacity)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pids = batch["pid"].to_numpy()
        src = batch["src_id"].to_numpy()
        qx = batch["x"].to_numpy()
        qy = batch["y"].to_numpy()
        radius = batch["radius"].to_numpy()
        out_s, out_d, out_dist = [], [], []
        for pid in np.unique(pids):
            tree, doc_ids = self.cache.get(int(pid))
            m = pids == pid
            s, d, dist = kernels.radius_kernel(
                tree, doc_ids, src[m], qx[m], qy[m], radius[m])
            out_s.append(s)
            out_d.append(d)
            out_dist.append(dist)
        if not out_s:
            return pa.table({"src_id": pa.array([], pa.int64()),
                             "dst_id": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.float64())})
        return pa.table({
            "src_id": np.concatenate(out_s),
            "dst_id": np.concatenate(out_d),
            "dist": np.concatenate(out_dist),
        })


class KnnHomeActor:
    """map_batches callable class (actor pool): phase-1 of the two-phase
    exact kNN join (SURVEY.md J7 — no reference implementation).

    Input batch:  (pid, src_id, x, y) — each query routed ONLY to its home
    partition, so every candidate for a query lands in this one batch.

    Per query: exact (k+1)-NN within the home partition (self later excluded
    by doc id), giving an upper bound d_k on the global kth-NN distance.  If
    the closed disc (q, d_k) touches only home-partition cells, the local
    top-k IS the global top-k (any closer point would live in this
    partition) -> emit final rows (rank 1..k).  Otherwise emit one pending
    row (rank=0, neighbor_id=-1, dist=d_k) for the phase-2 halo search.

    Output: (query_id, rank, neighbor_id, dist) — compact on purpose, the
    whole phase-1 result is materialized (see kernels.knn_home_kernel).
    """

    def __init__(self, ckpt_dir: str, k: int, plan, radius_cap: float,
                 cache_capacity: int = 8):
        self.cache = TreeCache(ckpt_dir, cache_capacity)
        self.k = k
        self.plan = plan
        self.radius_cap = radius_cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        from . import cells

        k = self.k
        pids = batch["pid"].to_numpy()
        src = batch["src_id"].to_numpy()
        bx = batch["x"].to_numpy()
        by = batch["y"].to_numpy()
        outs = []
        for pid in np.unique(pids):
            tree, doc_ids = self.cache.get(int(pid))
            m = pids == pid
            outs.append(pa.table(kernels.knn_home_kernel(
                tree, doc_ids, pid, src[m], bx[m], by[m], k,
                self.plan, self.radius_cap)))
        if not outs:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "dist": pa.array([], pa.float64()),
            })
        return pa.concat_tables(outs)


class KnnCandidateActor:
    """map_batches callable class (actor pool): kNN candidate generation.

    Input batch:  (pid, src_id, x, y, radius, home_pid)
    Output batch: (home_pid, src_id, dst_id, dist, radius) — partition
    points within the per-query search radius, self-pairs (dst == src)
    excluded, PLUS one sentinel row (dst_id=-1, dist=inf) per input row so
    zero-candidate queries still reach the merge stage and can widen their
    radius.  The merge (queries._knn_merge) keeps top-k per src_id.
    """

    def __init__(self, ckpt_dir: str, k: int, cache_capacity: int = 8):
        self.cache = TreeCache(ckpt_dir, cache_capacity)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        pids = batch["pid"].to_numpy()
        src = batch["src_id"].to_numpy()
        qx = batch["x"].to_numpy()
        qy = batch["y"].to_numpy()
        radius = batch["radius"].to_numpy()
        home = batch["home_pid"].to_numpy()
        outs = []
        for pid in np.unique(pids):
            tree, doc_ids = self.cache.get(int(pid))
            m = pids == pid
            outs.append(pa.table(kernels.knn_candidate_kernel(
                tree, doc_ids, src[m], qx[m], qy[m], radius[m], home[m])))
        if not outs:
            return pa.table({
                "home_pid": pa.array([], pa.int64()),
                "src_id": pa.array([], pa.int64()),
                "dst_id": pa.array([], pa.int64()),
                "dist": pa.array([], pa.float64()),
                "radius": pa.array([], pa.float64()),
            })
        return pa.concat_tables(outs)
