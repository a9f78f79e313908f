"""Embedding-vector operators over the embeddings table (vec_id, embedding
list<float32>[64], label): similarity search + embedding-cosine near-dup.

Brief requirements (similarity search / dedup at training-data scale):

* ann_topk      — exact brute-force cosine top-k for a broadcast query set:
                  the baseline.  The query matrix is ray.put ONCE and every
                  map_batches task streams the corpus against it (numpy
                  matmul per batch); per-batch partial top-k then one tiny
                  groupby(query) merge.  Output has no float column — the
                  (cos desc, id asc) ORDER is the contract, which is stable
                  because adjacent-neighbor cosine gaps are ~1e-2 versus
                  ~1e-7 worst-case summation-order noise.
* cosine_pairs  — exact near-duplicate pairs with cosine >= tau, same
                  broadcast pattern (corpus fits the object store at bench
                  scale; the documented scale path is ivf_topk's routing).
* ivf_topk      — IVF approximate variant: deterministic k-means (fixed
                  seed, driver-side fit on a bounded sample) partitions the
                  corpus; queries probe the P nearest centroids only.  The
                  scale path: centroid assignment is a map_batches stage and
                  each probe list is a partition-key route, exactly like the
                  spatial cell index.  No SQL oracle (approximate); recall
                  vs ann_topk asserted in tests.

Oracles use DuckDB list_cosine_similarity; floats never cross the compare
boundary (id/rank columns only), so summation-order differences between
numpy matmul and DuckDB's sequential loop cannot flip a result — verified
by the threshold/tie gap checks in tests/test_vecops.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ANN_K = 5
ANN_NUM_QUERIES = 8
COS_TAU = 0.4
IVF_CLUSTERS = 16
IVF_PROBES = 6  # 6/16 buckets probed: >=0.7 top-k recall on the weakly
                # clustered synthetic embeddings (recall/cost is the knob)
EMBED_DIM = 64


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, float64 unit-normalized matrix) from an embeddings batch."""
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), np.float32).astype(np.float64)
    m = flat.reshape(len(batch), -1)
    nrm = np.sqrt((m * m).sum(1))
    nrm[nrm == 0.0] = 1.0
    return batch["vec_id"].to_numpy(), m / nrm[:, None]


def _load_queries(sf_dir_path: str, nq: int):
    """Deterministic query set: the nq lowest vec_ids (read driver-side,
    tiny)."""
    import pyarrow.parquet as pq
    t = pq.read_table(sf_dir_path, columns=["vec_id", "embedding"])
    order = np.argsort(t["vec_id"].to_numpy())[:nq]
    sub = t.take(pa.array(order))
    qid, qm = _emb_matrix(sub)
    return qid, qm


# ----------------------------------------------------------------- ann_topk

def ann_topk(emb_ds, query_ids: np.ndarray, query_mat: np.ndarray,
             k: int = ANN_K):
    """Exact cosine top-k per query over the corpus (self excluded).

    Broadcast small side: the (nq, d) query matrix rides the closure into
    every task via the object store (ray.put semantics of captured numpy),
    NOT re-shipped per batch.  Output: (query_id, rank, neighbor_id)."""
    import ray

    q_ref = ray.put((np.asarray(query_ids, np.int64), query_mat))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        ids, m = _emb_matrix(batch)
        cos = qm @ m.T                       # (nq, batch) — one BLAS call
        # self-exclusion without a per-query loop
        cos[qids[:, None] == ids[None, :]] = -np.inf
        return _tie_safe_block_topk(qids, ids, cos, k)

    return _topk_merge_bucketed(
        emb_ds.map_batches(partial, batch_format="pyarrow"), k)


def _tie_safe_block_topk(qids: np.ndarray, ids: np.ndarray,
                         cos: np.ndarray, k: int) -> pa.Table:
    """Per-block partial top-k that keeps EVERY candidate whose cosine
    equals the block's k-th value (per query), so tie survivors under the
    (cos desc, neighbor_id asc) contract always reach the global merge —
    truncating k+1 by cosine alone can drop the smaller-id tie the oracle
    requires.  Fully vectorized over queries (no per-query Python loop).
    Excluded candidates must already be -inf in `cos`."""
    nq, nb = cos.shape
    if nb > k:
        part = np.argpartition(-cos, k - 1, axis=1)[:, :k]
        kth = cos[np.arange(nq), part[:, k - 1]]
        keep = cos >= kth[:, None]
    else:
        keep = np.ones_like(cos, bool)
    keep &= np.isfinite(cos)
    qi, cj = np.nonzero(keep)
    return pa.table({
        "query_id": qids[qi],
        "neighbor_id": ids[cj],
        "cos": cos[qi, cj],
    })


def _topk_merge_bucketed(scored_ds, k: int):
    """(query_id, neighbor_id, cos) partials -> exact top-k per query,
    rank 1..k by (cos desc, neighbor_id asc).  ONE groupby on a 256-way
    hash of query_id; ALL queries in a coarse group are merged in a
    single lexsort pass — a map_groups UDF per query costs ~1ms of
    Python each and dominates once queries number in the thousands
    (same lesson as textops._candidate_pairs)."""

    def bucket(batch: pa.Table) -> pa.Table:
        q = batch["query_id"].to_numpy()
        bk = ((q.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
              >> np.uint64(56)).astype(np.int64)
        return batch.append_column("bk", pa.array(bk))

    def merge_bucket(group: pa.Table) -> pa.Table:
        q = group["query_id"].to_numpy()
        if len(q) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64())})
        nid = group["neighbor_id"].to_numpy()
        cos = group["cos"].to_numpy()
        order = np.lexsort((nid, -cos, q))
        q_s, nid_s = q[order], nid[order]
        first = np.empty(len(q_s), bool)
        first[0] = True
        first[1:] = q_s[1:] != q_s[:-1]
        start = np.maximum.accumulate(
            np.where(first, np.arange(len(q_s)), 0))
        rank = np.arange(len(q_s)) - start + 1
        keep = rank <= k
        return pa.table({"query_id": q_s[keep], "rank": rank[keep],
                         "neighbor_id": nid_s[keep]})

    return (scored_ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("bk").map_groups(merge_bucket, batch_format="pyarrow"))


def ann_topk_sql(nq: int = ANN_NUM_QUERIES, k: int = ANN_K) -> str:
    return f"""
WITH q AS (
  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {nq}
),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, e.embedding) AS cos
  FROM q, embeddings e WHERE e.vec_id != q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


# ------------------------------------------------------------- cosine pairs

def cosine_pairs(emb_ds, corpus_ids: np.ndarray, corpus_mat: np.ndarray,
                 tau: float = COS_TAU):
    """Exact embedding near-dup pairs: (a_id, b_id) with cosine >= tau,
    a_id < b_id.  One side broadcast (bench-scale corpus; see module doc
    for the partitioned scale path)."""
    import ray

    ref = ray.put((np.asarray(corpus_ids, np.int64), corpus_mat))

    def partial(batch: pa.Table) -> pa.Table:
        cids, cm = ray.get(ref)
        ids, m = _emb_matrix(batch)
        cos = m @ cm.T
        qi, cj = np.nonzero(cos >= tau)
        a = ids[qi]
        b = cids[cj]
        keep = a < b
        return pa.table({"a_id": a[keep], "b_id": b[keep]})

    return emb_ds.map_batches(partial, batch_format="pyarrow")


def cosine_pairs_sql(tau: float = COS_TAU) -> str:
    return f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.embedding, b.embedding) >= {tau}
ORDER BY a_id, b_id
"""


# ---------------------------------------------------------------- IVF top-k

def fit_centroids(sample_mat: np.ndarray, n_clusters: int = IVF_CLUSTERS,
                  iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means on a (bounded) sample: seeded init,
    cosine assignment, mean + renormalize."""
    rng = np.random.default_rng(42)
    n = len(sample_mat)
    cent = sample_mat[rng.choice(n, min(n_clusters, n), replace=False)].copy()
    for _ in range(iters):
        assign = (sample_mat @ cent.T).argmax(1)
        for c in range(len(cent)):
            sel = assign == c
            if sel.any():
                v = sample_mat[sel].mean(0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


def ivf_topk(emb_ds, query_ids: np.ndarray, query_mat: np.ndarray,
             centroids: np.ndarray, k: int = ANN_K,
             probes: int = IVF_PROBES):
    """Approximate top-k: corpus vectors are bucketed by nearest centroid
    (map_batches), queries only score vectors whose bucket is among the
    query's `probes` nearest centroids.  Same output schema as ann_topk."""
    import ray

    probe = np.argsort(-(query_mat @ centroids.T), axis=1)[:, :probes]
    ref = ray.put((np.asarray(query_ids, np.int64), query_mat, probe,
                   centroids))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qm, prb, cent = ray.get(ref)
        ids, m = _emb_matrix(batch)
        bucket = (m @ cent.T).argmax(1)
        out_q, out_n, out_c = [], [], []
        for i in range(len(qids)):  # probe pruning keeps this per-query
            mask = np.isin(bucket, prb[i]) & (ids != qids[i])
            cand = np.flatnonzero(mask)
            c = m[cand] @ qm[i]
            if len(cand) > k:
                part = np.argpartition(-c, k - 1)[:k]
                kth = c[part[k - 1]]
                top = np.flatnonzero(c >= kth)  # tie-safe (see ann_topk)
                cand, c = cand[top], c[top]
            out_q.append(np.full(len(cand), qids[i], np.int64))
            out_n.append(ids[cand])
            out_c.append(c)
        return pa.table({
            "query_id": np.concatenate(out_q) if out_q else
            np.zeros(0, np.int64),
            "neighbor_id": np.concatenate(out_n) if out_n else
            np.zeros(0, np.int64),
            "cos": np.concatenate(out_c) if out_c else np.zeros(0),
        })

    return _topk_merge_bucketed(
        emb_ds.map_batches(partial, batch_format="pyarrow"), k)
