"""Per-partition query kernels, shared by two execution strategies:

* **actor pool** (`actors.py`) — a `map_batches` callable class holding an
  LRU of loaded trees; the serving path when many query batches stream
  against a long-lived index.
* **bulk `map_groups`** (`queries.py` mode="groups") — queries are hash-
  shuffled by pid and each group task loads its one tree from the
  checkpoint store (a few hundred KB, amortized over the partition's whole
  query set).  No actor-pool spin-up, no extra sort: ONE shuffle per stage.
  This is the default for whole-table joins (epsilon graph / kNN self-join)
  where every partition is touched exactly once anyway.

Each kernel takes (tree, doc_ids, query columns) and returns numpy column
dicts; callers wrap them in Arrow tables.  All math is float64-over-float32
per the reference metric (/root/reference/src/Point.cpp:27-38).
"""

from __future__ import annotations

import numpy as np

__all__ = ["radius_kernel", "knn_home_kernel", "knn_candidate_kernel"]


def radius_kernel(tree, doc_ids, src, x, y, radius):
    """Closed-ball radius query against one partition's tree.

    Returns (src_id, dst_id, dist) arrays — every build point of the
    partition within each query's closed ball (reference contract
    /root/reference/src/CoverTree.cpp:354-384).
    """
    qxy = np.stack([x, y], axis=1)
    qi, pi, di = tree.radius_query_batch(qxy, radius)
    return src[qi], doc_ids[pi], di


def knn_home_kernel(tree, doc_ids, pid, src, x, y, k, plan, radius_cap):
    """Phase-1 kNN: exact local top-k + home-fit test (see
    actors.KnnHomeActor docstring).

    Returns a COMPACT 4-column dict — the phase-1 output is materialized
    in full (n*k rows), so every byte per row is paid twice (write+scan):
      done rows:    (query_id, rank 1..k, neighbor_id, dist)
      pending rows: (query_id, rank=0, neighbor_id=packed(x,y), dist=d_k)
    A pending row's float32 coordinates are bit-packed into its otherwise
    unused neighbor_id ((x_bits << 32) | y_bits, exact roundtrip) so the
    pending sliver carries everything phase 2 needs without widening the
    n*k done rows."""
    from . import cells

    nq = len(src)
    qxy = np.stack([x, y], axis=1)
    # density from OCCUPIED-cell area: a partition is a union of Morton
    # cells that may be non-compact, so a bounding-box estimate overshoots
    # the area (and hence the initial search radius) by up to ~10x
    n_cells = len(np.unique(cells.cell_of(x, y, plan.resolution)))
    area = n_cells * cells.cell_side(plan.resolution) ** 2
    init_r = float(np.sqrt(2.0 * (k + 1) * area / (np.pi * max(1, len(x)))))
    qk, pk, dk, _ = tree.knn_batch(qxy, k + 1, init_radius=init_r)
    keep = doc_ids[pk] != src[qk]
    qk, pk, dk = qk[keep], pk[keep], dk[keep]
    # rows are sorted by (query, dist, local id); local ids are in doc_id
    # order within a partition, so this IS (dist, doc_id)
    cnt = np.bincount(qk, minlength=nq)
    off = np.zeros(nq + 1, np.int64)
    np.cumsum(cnt, out=off[1:])
    rank = np.arange(len(qk), dtype=np.int64) - off[qk]
    topk = rank < k
    qk, pk, dk, rank = qk[topk], pk[topk], dk[topk], rank[topk]
    # per-query kth-distance bound (cap when home has < k neighbors); qk
    # stays sorted and full queries kept exactly k rows, so query q's kth
    # distance sits at first-occurrence(q) + k - 1
    d_k = np.full(nq, radius_cap, np.float64)
    full = cnt >= k
    d_k[full] = dk[np.searchsorted(qk, np.flatnonzero(full)) + k - 1]
    # home-fit test: does disc(q, d_k) stay inside this partition?
    rep, halo = cells.halo_cells(x, y, d_k, plan.resolution)
    crep, hp = plan.pids_of_cells(halo)
    foreign = hp != pid
    done = np.ones(nq, bool)
    done[np.unique(rep[crep[foreign]])] = False
    fin = done[qk]
    pend = np.flatnonzero(~done)
    n_p = len(pend)
    return {
        "query_id": np.concatenate([src[qk[fin]], src[pend]]),
        "rank": np.concatenate([rank[fin] + 1, np.zeros(n_p, np.int64)]),
        "neighbor_id": np.concatenate(
            [doc_ids[pk[fin]], pack_xy(x[pend], y[pend])]),
        "dist": np.concatenate([dk[fin], d_k[pend]]),
    }


def pack_xy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(float32, float32) -> int64, exact bit roundtrip with unpack_xy."""
    xb = np.ascontiguousarray(x, np.float32).view(np.uint32).astype(np.uint64)
    yb = np.ascontiguousarray(y, np.float32).view(np.uint32).astype(np.uint64)
    return ((xb << np.uint64(32)) | yb).view(np.int64)


def unpack_xy(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    p = np.asarray(packed, np.int64).view(np.uint64)
    x = (p >> np.uint64(32)).astype(np.uint32).view(np.float32)
    y = (p & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.float32)
    return x, y


def knn_candidate_kernel(tree, doc_ids, src, x, y, radius, home):
    """Phase-2 kNN candidate generation within one partition: points inside
    each query's search radius, self excluded by doc id, PLUS one sentinel
    row (dst=-1, dist=inf) per query row so zero-candidate queries still
    reach the merge.  Returns a dict of output columns."""
    qxy = np.stack([x, y], axis=1)
    qi, pi, di = tree.radius_query_batch(qxy, radius)
    s = src[qi]
    d = doc_ids[pi]
    keep = d != s  # exclude self by doc id (duplicates still count)
    return {
        "home_pid": np.concatenate([home, home[qi][keep]]),
        "src_id": np.concatenate([src, s[keep]]),
        "dst_id": np.concatenate(
            [np.full(len(src), -1, np.int64), d[keep]]),
        "dist": np.concatenate([np.full(len(src), np.inf), di[keep]]),
        "radius": np.concatenate([radius, radius[qi][keep]]),
    }
