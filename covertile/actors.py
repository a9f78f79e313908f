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

from . import store

__all__ = ["RadiusQueryActor", "KnnCandidateActor", "TreeCache"]


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
            qxy = np.stack([qx[m], qy[m]], axis=1)
            qi, pi, di = tree.radius_query_batch(qxy, radius[m])
            out_s.append(src[m][qi])
            out_d.append(doc_ids[pi])
            out_dist.append(di)
        if not out_s:
            return pa.table({"src_id": pa.array([], pa.int64()),
                             "dst_id": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.float64())})
        return pa.table({
            "src_id": np.concatenate(out_s),
            "dst_id": np.concatenate(out_d),
            "dist": np.concatenate(out_dist),
        })


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
        out_h = [home]
        out_s = [src]
        out_d = [np.full(len(src), -1, np.int64)]   # sentinels
        out_dist = [np.full(len(src), np.inf)]
        out_r = [radius]
        for pid in np.unique(pids):
            tree, doc_ids = self.cache.get(int(pid))
            m = pids == pid
            qxy = np.stack([qx[m], qy[m]], axis=1)
            qi, pi, di = tree.radius_query_batch(qxy, radius[m])
            s = src[m][qi]
            d = doc_ids[pi]
            keep = d != s  # exclude self by doc id (duplicates still count)
            out_h.append(home[m][qi][keep])
            out_s.append(s[keep])
            out_d.append(d[keep])
            out_dist.append(di[keep])
            out_r.append(radius[m][qi][keep])
        return pa.table({
            "home_pid": np.concatenate(out_h),
            "src_id": np.concatenate(out_s),
            "dst_id": np.concatenate(out_d),
            "dist": np.concatenate(out_dist),
            "radius": np.concatenate(out_r),
        })
