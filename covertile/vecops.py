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
* cosine_pairs_partitioned — exact near-duplicate pairs with cosine >= tau:
                  centroid-bucket routing with a provably exact angular
                  halo (no whole-corpus broadcast, no driver read; see the
                  function docstring for the routing proof).
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

from .joins import mat
import pyarrow.compute as pc

ANN_K = 5
ANN_NUM_QUERIES = 8
COS_TAU = 0.4
IVF_CLUSTERS = 16
IVF_PROBES = 6  # 6/16 buckets probed: >=0.7 top-k recall on the weakly
                # clustered synthetic embeddings (recall/cost is the knob)
EMBED_DIM = 64


def _hive_int64(col) -> np.ndarray:
    """Decode a hive-partition column (dictionary<string> or plain string,
    depending on the reader) to int64 via Arrow casts — no object-dtype
    round trip."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_dictionary(col.type):
        col = col.cast(col.type.value_type)
    return pc.cast(col, pa.int64()).to_numpy()


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


def _emb_matrix32(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, float32 unit-normalized matrix) — the prescreen-side
    variant: cheaper matmuls/temporaries for conditions that are verified
    in float64 afterwards.  |f32 cos − true cos| < 4e-6 for unit vectors
    at d=64 (see pairs()); prescreens use a 1e-4 slack."""
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    m = np.asarray(col.flatten(), np.float32).reshape(len(batch), -1).copy()
    nrm = np.sqrt((m * m).sum(1))
    nrm[nrm == 0.0] = 1.0
    m /= nrm[:, None]
    return batch["vec_id"].to_numpy(), m


F32_SLACK = 1e-4  # >> 4e-6 worst-case f32 cosine error at d=64


def _load_query_table(sf_dir_path: str, nq: int) -> pa.Table:
    """The nq lowest-vec_id rows as a table — deterministic query set.

    Distributed min-k: each block keeps its nq smallest ids (tiny
    partial), the driver merges partials streamed via iter_batches —
    never a whole-corpus driver read."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["vec_id"].to_numpy()
        if len(v) > nq:
            sel = np.argpartition(v, nq - 1)[:nq]
            batch = batch.take(pa.array(sel, pa.int64()))
        return batch

    ds = rd.read_parquet(sf_dir_path, columns=["vec_id", "embedding"])
    parts = pa.concat_tables(ds.map_batches(
        partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"))
    order = np.argsort(parts["vec_id"].to_numpy())[:nq]
    return parts.take(pa.array(order, pa.int64()))


def _load_queries(sf_dir_path: str, nq: int):
    """(vec_ids, unit-normalized float64 matrix) for the nq lowest ids."""
    return _emb_matrix(_load_query_table(sf_dir_path, nq))


def _raw_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, RAW float32 matrix) — no normalization; the L2 kNN path
    uses the CoverTree metric (float64 accumulate over float32 coords)."""
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), np.float32)
    return batch["vec_id"].to_numpy(), flat.reshape(len(batch), -1)


def sample_head(sf_dir_path: str, n: int = 4096,
                columns=("vec_id", "embedding")) -> pa.Table:
    """Bounded deterministic sample: the first n records, read row-group
    by row-group — driver memory stays O(n) however large the file is."""
    import pyarrow.parquet as pq
    f = pq.ParquetFile(sf_dir_path)
    got, tot = [], 0
    for rg in range(f.metadata.num_row_groups):
        t = f.read_row_group(rg, columns=list(columns))
        got.append(t)
        tot += len(t)
        if tot >= n:
            break
    tbl = pa.concat_tables(got)
    return tbl.slice(0, n)


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


def _topk_merge_bucketed(scored_ds, k: int, value_col: str = "cos",
                         ascending: bool = False):
    """(query_id, neighbor_id, <value_col>) partials -> exact top-k per
    query, rank 1..k by (value desc|asc, neighbor_id asc).  ONE groupby on
    a size-derived hash of query_id (sizing.fanout); ALL queries in a coarse group are merged
    in a single lexsort pass — a map_groups UDF per query costs ~1ms of
    Python each and dominates once queries number in the thousands
    (same lesson as textops._candidate_pairs)."""

    from .sizing import bucket_shift
    _shift = bucket_shift()

    def bucket(batch: pa.Table) -> pa.Table:
        q = batch["query_id"].to_numpy()
        bk = ((q.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
              >> _shift).astype(np.int64)
        return batch.append_column("bk", pa.array(bk))

    def merge_bucket(group: pa.Table) -> pa.Table:
        q = group["query_id"].to_numpy()
        if len(q) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64())})
        nid = group["neighbor_id"].to_numpy()
        cos = group[value_col].to_numpy()
        order = np.lexsort((nid, cos if ascending else -cos, q))
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

    return (mat(scored_ds.map_batches(bucket, batch_format="pyarrow"))
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


#: label restriction for the filtered-ANN driver query (3 of the 10
#: synthetic classes, ~30% of the corpus)
ANN_FILTER_LABELS = (0, 1, 2)


def ann_topk_filtered_sql(labels=ANN_FILTER_LABELS,
                          nq: int = ANN_NUM_QUERIES,
                          k: int = ANN_K) -> str:
    """Filtered vector search oracle: identical ranking contract to
    ann_topk_sql but the CORPUS side is restricted to the given labels
    (queries are still the first nq rows of the full table — a query
    need not satisfy the predicate it searches under).  The engine twin
    pushes the predicate into the parquet read (sources.read_table
    filter=), so excluded row groups never leave storage — metadata
    filtering at the scan, not a post-scan mask."""
    lab = ", ".join(str(v) for v in labels)
    return f"""
WITH q AS (
  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {nq}
),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.embedding, e.embedding) AS cos
  FROM q, embeddings e
  WHERE e.vec_id != q.vec_id AND e.label IN ({lab})
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

def cosine_pairs_partitioned(emb_ds, centroids: np.ndarray,
                             tau: float = COS_TAU,
                             home_chunk: int = 4096):
    """EXACT embedding near-dup pairs with NO driver-side corpus read and
    no whole-corpus broadcast: centroid-bucket routing with an exact
    angular halo — the embedding-space analogue of the spatial
    partition-plus-halo discipline (queries.py epsilon routing).

    Routing rule (provably exact).  Home(v) = argmax_c v·c (unit vectors;
    the Voronoi cell of cosine space — halfspaces v·(c−h) ≤ 0).  A copy of
    v is ALSO routed to bucket c ≠ h iff a partner u with home c and
    cos(u,v) ≥ τ can exist:
        max {u·(c−h) : |u|=1, u·v ≥ τ} = |c−h|·cos(max(0, θ(v, c−h) − θ_τ))
    which is ≥ 0 iff  θ(v, c−h) ≤ 90° + θ_τ  iff
        v·(c−h) ≥ −sin(θ_τ)·|c−h|,   sin(θ_τ) = sqrt(1 − τ²).
    Both sides come free from the single (batch × K) centroid matmul:
    v·(c−h) = cos_c[:,c] − cos_c[:,home].

    Exactly-once emission: a pair (a, b), a = smaller vec_id, is emitted
    only in home(a), where b is guaranteed present (home or halo copy, by
    the rule above applied to the actual partner), with the predicate
    (x is home here) ∧ (x.id < y.id).

    Second (much tighter in high dimension) necessary condition — the
    per-bucket ANGULAR RADIUS bound, computed in a cheap first pass:
        R_c = max { θ(u, c) : home(u) = c }   (one (batch × K) matmul per
    block, per-bucket min-cos partials, one 256-row groupby — broadcast
    back as a K-vector).  A partner u with home c and cos(u,v) ≥ τ forces
    θ(v, c) ≤ θ(u, c) + θ_τ ≤ R_c + θ_τ (spherical triangle inequality),
    so v halos to c only if cos_c[:,c] ≥ cos(R_c + θ_τ) − slack.  The two
    conditions are independent necessities; route() takes their AND.
    Without the radius bound the halfspace test alone admits almost every
    (vector, bucket) pair once K is large and the dimension is high
    (measured: 5M 64-dim vectors × 256 centroids at τ=0.95 amplified the
    route output ~250× and stalled the shuffle; with it, halo copies are
    a small fraction of home rows).

    Pruning strength is data/τ-dependent: separated clusters + high τ
    (real near-dup corpora) halo only boundary vectors; in the worst case
    (uniform directions, low τ) every bucket sees most vectors and the
    job degrades gracefully to a K-way-distributed block all-pairs — the
    exact-join lower bound — while each group's matmul stays chunked
    (home_chunk × |copies|) so no task ever holds an n×n matrix."""
    import ray

    cent = np.asarray(centroids, np.float64)
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    cent32 = cent.astype(np.float32)
    cdist32 = np.linalg.norm(
        cent[:, None, :] - cent[None, :, :], axis=2).astype(np.float32)
    sin_tau = float(np.sqrt(max(0.0, 1.0 - tau * tau)))
    cent_ref = ray.put(cent32)

    # Both passes run their matmuls/comparisons in float32 with F32_SLACK
    # relaxation — sound because every condition here is a NECESSARY
    # prescreen (slack only adds halo copies; pairs() re-verifies in
    # float64) — and the home assignment is consistent because radius and
    # route compute argmax with IDENTICAL f32 arithmetic.

    # ---- pass 1: per-bucket home angular radius (as min home cosine)
    def radius_partial(batch: pa.Table) -> pa.Table:
        cent_ = ray.get(cent_ref)
        ids, m = _emb_matrix32(batch)
        if len(ids) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "min_cos": pa.array([], pa.float64())})
        cos_c = m @ cent_.T
        home = cos_c.argmax(1)
        hc = cos_c[np.arange(len(ids)), home].astype(np.float64)
        order = np.argsort(home, kind="stable")
        h_s, v_s = home[order], hc[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], h_s[1:] != h_s[:-1])))
        return pa.table({"bucket": h_s[starts].astype(np.int64),
                         "min_cos": np.minimum.reduceat(v_s, starts)})

    rad = (mat(emb_ds.map_batches(radius_partial,
                                  batch_format="pyarrow"))
           .groupby("bucket").min("min_cos")
           .take_all())  # ≤ K rows — a K-vector aggregate, never the data
    cos_r = np.full(len(cent), 2.0)  # empty bucket: no partner can home
    for row in rad:
        cos_r[int(row["bucket"])] = float(row["min(min_cos)"])
    # cos(R_c + θ_τ) = cosR·τ − sinR·sinθτ, with slack absorbing float
    # roundoff (relaxing a NECESSARY condition only adds halo copies)
    cr = np.clip(cos_r - F32_SLACK, -1.0, 1.0)
    halo_min_cos = np.where(
        cos_r > 1.0, 2.0,
        cr * tau - np.sqrt(1.0 - cr * cr) * sin_tau - F32_SLACK)
    ref = ray.put((cent32, cdist32, halo_min_cos.astype(np.float32)))

    def route(batch: pa.Table) -> pa.Table:
        cent_, cd, hmc = ray.get(ref)
        ids, m = _emb_matrix32(batch)
        if len(ids) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "is_home": pa.array([], pa.bool_()),
                             "embedding": pa.array([], pa.list_(pa.float32()))})
        cos_c = m @ cent_.T                       # (nb, K) float32
        home = cos_c.argmax(1)
        rows = np.arange(len(ids))
        # v·(c−h) ≥ −sinθτ·|c−h| per (row, bucket); home col handled apart
        cond = (cos_c - cos_c[rows, home][:, None]
                >= -np.float32(sin_tau) * cd[home] - np.float32(2 * F32_SLACK))
        cond &= cos_c >= hmc[None, :]             # radius bound (pass 1)
        cond[rows, home] = False
        hrow, hcol = np.nonzero(cond)
        out_rows = np.concatenate([rows, hrow])
        out_bkt = np.concatenate([home.astype(np.int64),
                                  hcol.astype(np.int64)])
        out_home = np.zeros(len(out_rows), bool)
        out_home[: len(rows)] = True
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        take = pa.array(out_rows, pa.int64())
        return pa.table({
            "bucket": pa.array(out_bkt),
            "vec_id": pa.array(ids[out_rows]),
            "is_home": pa.array(out_home),
            "embedding": emb.take(take),
        })

    def pairs(group: pa.Table) -> pa.Table:
        """Exact pairs within one bucket, cost-halved + f32-accelerated:

        * home rows are sorted by vec_id and lead the matrix, so row order
          == id order within the home region and the home×home block can
          be covered TRIANGULARLY (column chunks start at the home chunk's
          own offset) — each home-home pair is visited once, the a<b keep
          resolving the same-chunk double visit.  Halo columns (indices
          past the home region) are scanned by every home chunk, as the
          exactly-once proof requires.
        * the chunked matmul runs in float32 with a τ−3e-4 prescreen
          (error bound for unit vectors at d=64 is <4e-6, see inline), and
          only the sparse candidates are re-verified with the exact
          float64 dot — same output, ~2× less matmul + 2× less scan."""
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64())})
        if len(group) == 0:
            return empty
        ids, m = _emb_matrix(group)
        is_home = group["is_home"].to_numpy(zero_copy_only=False)
        hsel = np.flatnonzero(is_home)
        if len(hsel) == 0:
            return empty
        hsel = hsel[np.argsort(ids[hsel])]
        order = np.concatenate([hsel, np.flatnonzero(~is_home)])
        ids, m = ids[order], np.ascontiguousarray(m[order])
        nh = len(hsel)
        m32 = m.astype(np.float32)
        # |cos32 − cos64| ≤ γ_64·Σ|x_i y_i| + 2·eps32 ≤ 64·2⁻²⁴ + 1.2e-7
        # < 4e-6 for unit vectors (Cauchy–Schwarz on |x|·|y|); 3e-4 margin
        tau32 = np.float32(tau - 3e-4)
        out_a, out_b = [np.zeros(0, np.int64)], [np.zeros(0, np.int64)]
        copy_chunk = 4 * home_chunk
        # one task-lifetime GEMM output buffer: a fresh 256MB allocation
        # per chunk call costs more in first-touch page faults than the
        # thin-k (d=64) sgemm itself
        buf = np.empty((min(home_chunk, nh),
                        min(copy_chunk, len(ids))), np.float32)
        for lo in range(0, nh, home_chunk):
            hm32 = m32[lo: min(lo + home_chunk, nh)]
            for co in range(lo, len(ids), copy_chunk):
                # both sides chunked: the cos block stays
                # home_chunk × copy_chunk however large the bucket is
                cm32 = m32[co: co + copy_chunk]
                cos32 = np.matmul(hm32, cm32.T,
                                  out=buf[: len(hm32), : len(cm32)])
                qi, cj = np.nonzero(cos32 >= tau32)
                if len(qi) == 0:
                    continue
                ri, rj = lo + qi, co + cj
                ok = ri != rj
                ri, rj = ri[ok], rj[ok]
                cos = np.einsum("ij,ij->i", m[ri], m[rj])
                keep = (cos >= tau) & (ids[ri] < ids[rj])
                out_a.append(ids[ri][keep])
                out_b.append(ids[rj][keep])
        return pa.table({"a_id": np.concatenate(out_a),
                         "b_id": np.concatenate(out_b)})

    # mat(): the routed table duplicates halo vectors (bounded by the
    # angular-halo analysis) and the shuffle materializes it anyway; the
    # alternative is re-running the normalize+centroid-GEMM scan per
    # exchange consumer.
    return (mat(emb_ds.map_batches(route, batch_format="pyarrow"))
            .groupby("bucket").map_groups(pairs, batch_format="pyarrow"))


def cosine_pairs_sql(tau: float = COS_TAU) -> str:
    return f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_cosine_similarity(a.embedding, b.embedding) >= {tau}
ORDER BY a_id, b_id
"""


# --------------------------------------------- sign-LSH near-dup (approx)
#
# The APPROXIMATE scale path next to the exact cosine_pairs_partitioned:
# random-hyperplane (sign) LSH [Charikar, STOC'02].  Each vector gets
# n_bands keys of band_bits sign bits; two vectors collide in a band with
# probability (1 - theta/pi)^band_bits, so near-duplicates (small theta)
# land in a shared bucket in at least one band w.h.p. while far pairs
# almost never do.  Candidates are verified with the exact float64
# cosine, so precision is 1.0 by construction; recall is the probabilistic
# knob (for a pair at cos 0.97, miss probability at the default 16x8 is
# (1 - 0.92^8)^16 ~ 1e-5).  Unlike the exact operator there is no
# within-cluster all-pairs lower bound: cost is n_bands linear passes plus
# per-bucket work, the 100-TB shape when tau is high and clusters are big.

LSH_TAU = 0.9
LSH_BANDS = 16
LSH_BITS = 8   # recall/cost knob: expected bucket size is n / 2^band_bits
               # PER BAND — at 10^12 rows raise to >= 24 bits (and/or salt
               # by a corpus hash) so buckets stay task-sized; 8 bits is
               # sized to the sf tables' 500-1000 rows
LSH_SEED = 7
_LSH_PAIR_SHIFT = np.int64(1) << np.int64(32)  # vec ids < 2^31


def lsh_planes(dim: int = EMBED_DIM, n_bands: int = LSH_BANDS,
               band_bits: int = LSH_BITS,
               seed: int = LSH_SEED) -> np.ndarray:
    """Deterministic (seeded) Gaussian hyperplanes, float32
    (n_bands*band_bits, dim) — broadcast once via ray.put."""
    rs = np.random.RandomState(seed)
    return rs.standard_normal((n_bands * band_bits, dim)).astype(np.float32)


#: _verify_cosine path switches (textops._verify_jaccard's dual-path
#: shape).  Collect cap: distinct candidate ids held on the driver
#: (128 MB of int64).  Broadcast cap: raw f32 floats of the candidate
#: embedding bundle ray.put once (512 MB — plasma shares it zero-copy
#: per node); past it, embeddings attach via two bucketed hash joins and
#: the driver never holds vectors.
LSH_ID_COLLECT_MAX = 16_000_000
LSH_BCAST_MAX_FLOATS = 128_000_000


def _raw_f32_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, UNNORMALIZED float32 matrix) — exact raw corpus bits, so
    downstream float64 normalization reproduces _emb_matrix bit-for-bit."""
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    m = np.asarray(col.flatten(), np.float32).reshape(len(batch), -1)
    return batch["vec_id"].to_numpy(), m


def _norm64(m32: np.ndarray) -> np.ndarray:
    """float64 unit rows from raw f32 rows — _emb_matrix's exact math."""
    m = m32.astype(np.float64)
    nrm = np.sqrt((m * m).sum(1))
    nrm[nrm == 0.0] = 1.0
    return m / nrm[:, None]


def _verify_cosine(pairs_ds, emb_ds, tau: float, chunk: int = 4096):
    """DISTINCT candidate pairs (pair:int64) x corpus -> exact (a_id,
    b_id) rows with float64 cosine >= tau.

    Two executions for the id semi-join (switched on the pair count,
    free — pairs are materialized) and two for the verify (switched on
    the candidate float count), mirroring textops._verify_jaccard:
    driver-collect ids + isin corpus filter, else coarse-bucket distinct
    + hash semi-join; broadcast (ids, raw-f32 matrix) bundle + per-batch
    verify, else two bucketed hash joins attaching each side's vector.
    All paths share _norm64, so the output is path-independent
    (equality-tested in tests/test_vecops.py)."""
    import ray as _ray

    from .joins import hash_join_int_key
    from .textops import _coarse_bucket

    pairs = pairs_ds.materialize()
    n_pairs = pairs.count()
    out_empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64())})
    if n_pairs == 0:
        import ray.data as rd
        return rd.from_arrow(out_empty)

    # ---- candidate ids -> candidate (vec_id, embedding) subset
    if 2 * n_pairs <= LSH_ID_COLLECT_MAX:
        p_all = np.concatenate(
            [b["pair"].to_numpy()
             for b in pairs.iter_batches(batch_size=None,
                                         batch_format="pyarrow")])
        cand_ids = np.unique(np.concatenate(
            [p_all // _LSH_PAIR_SHIFT, p_all % _LSH_PAIR_SHIFT]))
        ids_ref = _ray.put(cand_ids)

        def cand_fn(batch: pa.Table) -> pa.Table:
            m = np.isin(batch["vec_id"].to_numpy(), _ray.get(ids_ref))
            return batch.select(["vec_id", "embedding"]).filter(
                pa.array(m))

        cand = emb_ds.map_batches(
            cand_fn, batch_format="pyarrow").materialize()
    else:
        def explode_ids(batch: pa.Table) -> pa.Table:
            p = batch["pair"].to_numpy()
            u = np.unique(np.concatenate(
                [p // _LSH_PAIR_SHIFT, p % _LSH_PAIR_SHIFT]))
            return pa.table({"vec_id": u, "bk": _coarse_bucket(u)})

        def uniq_ids(g: pa.Table) -> pa.Table:
            return pa.table({"vec_id": pa.array(
                np.unique(g["vec_id"].to_numpy()), pa.int64())})

        ids_ds = (pairs.map_batches(explode_ids, batch_format="pyarrow")
                  .groupby("bk").map_groups(uniq_ids,
                                            batch_format="pyarrow"))
        cand = hash_join_int_key(
            emb_ds.map_batches(
                lambda b: b.select(["vec_id", "embedding"]),
                batch_format="pyarrow"),
            ids_ds, "vec_id",
            right_schema=pa.schema([("vec_id", pa.int64())])).materialize()

    n_cand = cand.count()
    step = max(1, chunk * chunk // 64)

    if n_cand * EMBED_DIM <= LSH_BCAST_MAX_FLOATS:
        ids_l, mat_l = [], []
        for b in cand.iter_batches(batch_size=None,
                                   batch_format="pyarrow"):
            i, m = _raw_f32_matrix(b)
            ids_l.append(i)
            mat_l.append(m)
        ids_all = (np.concatenate(ids_l) if ids_l
                   else np.zeros(0, np.int64))
        mat_all = (np.concatenate(mat_l) if mat_l
                   else np.zeros((0, EMBED_DIM), np.float32))
        order = np.argsort(ids_all, kind="stable")
        bundle_ref = _ray.put((ids_all[order],
                               np.ascontiguousarray(mat_all[order])))

        def vfy(batch: pa.Table) -> pa.Table:
            p = batch["pair"].to_numpy()
            if len(p) == 0:
                return out_empty
            ids_s, mat = _ray.get(bundle_ref)
            a, b = p // _LSH_PAIR_SHIFT, p % _LSH_PAIR_SHIFT
            ia = np.searchsorted(ids_s, a)
            ib = np.searchsorted(ids_s, b)
            keep_a, keep_b = [], []
            for lo in range(0, len(p), step):
                sa, sb = ia[lo: lo + step], ib[lo: lo + step]
                # f64-normalize only the rows this chunk touches
                need = np.unique(np.concatenate([sa, sb]))
                remap = np.full(len(ids_s), -1, np.int64)
                remap[need] = np.arange(len(need))
                m64 = _norm64(mat[need])
                cos = np.einsum("ij,ij->i", m64[remap[sa]], m64[remap[sb]])
                k = cos >= tau
                keep_a.append(a[lo: lo + step][k])
                keep_b.append(b[lo: lo + step][k])
            return pa.table({"a_id": pa.array(np.concatenate(keep_a)),
                             "b_id": pa.array(np.concatenate(keep_b))})

        return pairs.map_batches(vfy, batch_format="pyarrow")

    # ---- join fallback: attach each side's vector, never broadcast
    esch = cand.schema()
    emb_t = dict(zip(esch.names, esch.types))["embedding"]

    def split_a(batch: pa.Table) -> pa.Table:
        p = batch["pair"].to_numpy()
        return pa.table({"vec_id": p // _LSH_PAIR_SHIFT,
                         "b_id": p % _LSH_PAIR_SHIFT})

    j1 = hash_join_int_key(
        pairs.map_batches(split_a, batch_format="pyarrow"), cand, "vec_id",
        left_schema=pa.schema([("vec_id", pa.int64()),
                               ("b_id", pa.int64())]),
        right_schema=esch)

    def rekey_b(batch: pa.Table) -> pa.Table:
        return pa.table({"a_id": batch["vec_id"],
                         "vec_id": batch["b_id"],
                         "a_emb": batch["embedding"]})

    j2 = hash_join_int_key(
        j1.map_batches(rekey_b, batch_format="pyarrow"), cand, "vec_id",
        left_schema=pa.schema([("a_id", pa.int64()),
                               ("vec_id", pa.int64()),
                               ("a_emb", emb_t)]),
        right_schema=esch)

    def vfy_joined(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return out_empty
        a_col = batch["a_emb"]
        b_col = batch["embedding"]
        if isinstance(a_col, pa.ChunkedArray):
            a_col = a_col.combine_chunks()
        if isinstance(b_col, pa.ChunkedArray):
            b_col = b_col.combine_chunks()
        ma = np.asarray(a_col.flatten(), np.float32).reshape(n, -1)
        mb = np.asarray(b_col.flatten(), np.float32).reshape(n, -1)
        cos = np.einsum("ij,ij->i", _norm64(ma), _norm64(mb))
        k = cos >= tau
        return pa.table({"a_id": batch["a_id"].to_numpy()[k],
                         "b_id": batch["vec_id"].to_numpy()[k]})

    return j2.map_batches(vfy_joined, batch_format="pyarrow")


def cosine_lsh_pairs(emb_ds, tau: float = LSH_TAU,
                     n_bands: int = LSH_BANDS, band_bits: int = LSH_BITS,
                     seed: int = LSH_SEED, chunk: int = 4096):
    """Near-dup pairs with cosine >= tau via banded sign-LSH.

    Stages (all streaming, ONE declared shuffle key each):
      1. map_batches: one (batch x planes) sgemm -> sign bits -> per band
         an int key; emits n_bands copies of (bucket, bk, vec_id) — IDS
         ONLY, 24 B/row.  (The first version carried the 256 B f32
         embedding on every band copy; ds.stats() at 5M vectors showed
         the resulting 23 GB sort WAS the stage — 247-437 s of which the
         verify einsum was 40 s.  Candidate-fetch drops the sorted bytes
         ~12x.)
      2. groupby(COARSE bucket, 256 groups).map_groups: rows sort by fine
         bucket inside each group and candidate pairs come from equal-key
         runs in one vectorized pass (textops._run_pairs — at high
         band_bits most buckets are tiny, and a per-bucket map_groups
         would mean millions of Python group calls); np.unique dedups
         within the group.
      3. coarse-bucket groupby + np.unique: pairs found in multiple bands
         dedup ONCE, BEFORE the cosine — each unique candidate pair is
         verified exactly once (the carry-the-vector version verified
         per colliding band).
      4. _verify_cosine: exact float64 verify against vectors fetched
         from the corpus (broadcast bundle under the caps, bucketed hash
         joins above them).

    Output: (a_id, b_id), subset of the exact operator's output by
    construction; recall at the operating point is asserted in
    tests/test_vecops.py."""
    import ray

    assert 1 <= band_bits <= 64
    planes_ref = ray.put(lsh_planes(EMBED_DIM, n_bands, band_bits, seed))
    pows = (np.uint64(1) << np.arange(band_bits, dtype=np.uint64))

    def band_rows(batch: pa.Table) -> pa.Table:
        from .textops import _coarse_bucket
        planes = ray.get(planes_ref)
        ids, m = _emb_matrix32(batch)
        n = len(ids)
        if n == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "bk": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64())})
        bits = (m @ planes.T) >= 0                     # (n, bands*bits)
        keys = np.empty((n_bands, n), np.int64)
        for bnd in range(n_bands):
            block = bits[:, bnd * band_bits:(bnd + 1) * band_bits]
            # band folded in by a splitmix-style 64-bit mix (key *
            # n_bands would overflow at band_bits > 59; a cross-band
            # key collision only adds rows to a verify bucket — exact
            # verify + pair dedup keep the output identical)
            salt = np.uint64((0x9E3779B97F4A7C15 * (bnd + 1))
                             & 0xFFFFFFFFFFFFFFFF)
            k = block.astype(np.uint64) @ pows + salt
            k ^= k >> np.uint64(29)
            k *= np.uint64(0xBF58476D1CE4E5B9)
            k ^= k >> np.uint64(32)
            keys[bnd] = k.view(np.int64)
        flat = keys.reshape(-1)
        return pa.table({"bucket": pa.array(flat),
                         "bk": pa.array(_coarse_bucket(flat)),
                         "vec_id": pa.array(np.tile(ids, n_bands))})

    def cands(group: pa.Table) -> pa.Table:
        from .textops import _run_pairs
        empty = pa.table({"pair": pa.array([], pa.int64())})
        if len(group) < 2:
            return empty
        id_s, _, ai, bi = _run_pairs(group["bucket"].to_numpy(),
                                     group["vec_id"].to_numpy())
        if len(ai) == 0:
            return empty
        p = np.unique(id_s[ai] * _LSH_PAIR_SHIFT + id_s[bi])
        return pa.table({"pair": pa.array(p)})     # id_s[ai] < id_s[bi]

    cand_pairs = (mat(emb_ds.map_batches(band_rows,
                                         batch_format="pyarrow"))
                  .groupby("bk").map_groups(cands, batch_format="pyarrow"))

    def pbucket(batch: pa.Table) -> pa.Table:
        from .textops import _coarse_bucket
        p = batch["pair"].to_numpy()
        return pa.table({"pair": p, "bk": _coarse_bucket(p)})

    def uniq(g: pa.Table) -> pa.Table:
        return pa.table({"pair": pa.array(np.unique(g["pair"].to_numpy()),
                                          pa.int64())})

    dedup = (mat(cand_pairs.map_batches(pbucket, batch_format="pyarrow"))
             .groupby("bk").map_groups(uniq, batch_format="pyarrow")
             .select_columns(["pair"]))
    return _verify_cosine(dedup, emb_ds, tau, chunk)


# Deterministic planted twins for the LSH driver query: the sf embeddings
# are weakly clustered (max natural cosine ~0.53), so a HIGH-tau near-dup
# setting — where sign-LSH is the right tool — needs planted near
# neighbors, the same practice bench.py uses for the 5M-vector dedup
# stage.  Twin of every vec_id % TWIN_EVERY == 0 vector: bump the first
# coordinate by +0.25 (unit-norm corpus => twin cosine in [0.968, 0.981],
# a >0.44 two-sided gap to every natural pair at both sf0.001/sf0.01,
# measured).  The derivation is one SQL list_concat away, so the oracle
# is the exact O(n^2) join over the same augmented table.

TWIN_EVERY = 10
TWIN_OFFSET = np.int64(10_000_000)
TWIN_BUMP = np.float32(0.25)


def with_planted_twins(emb_ds):
    def twins(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        sel = np.flatnonzero(ids % TWIN_EVERY == 0)
        emb = batch["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        n = len(sel)
        if n == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "embedding": pa.array(
                                 [], pa.list_(pa.float32()))})
        dim = len(emb[0])
        m = np.asarray(emb.take(pa.array(sel, pa.int64())).flatten(),
                       np.float32).reshape(n, dim).copy()
        m[:, 0] += TWIN_BUMP
        return pa.table({
            "vec_id": pa.array(ids[sel] + TWIN_OFFSET),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1), pa.float32()), dim).cast(
                    pa.list_(pa.float32())),
        })

    aug = emb_ds.map_batches(twins, batch_format="pyarrow")
    return emb_ds.select_columns(["vec_id", "embedding"]).union(aug)


def cosine_lsh_sql(tau: float = LSH_TAU) -> str:
    return f"""
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {int(TWIN_OFFSET)},
         list_concat([embedding[1] + 0.25], embedding[2:]) AS embedding
  FROM embeddings WHERE vec_id % {TWIN_EVERY} = 0
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id
FROM aug a, aug b
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
        cos = qm @ m.T                          # one BLAS call, all queries
        # probe mask without a per-query loop: (nq, batch) membership of
        # each row's bucket in each query's probe list
        ok = (bucket[None, :, None] == prb[:, None, :]).any(-1)
        ok &= qids[:, None] != ids[None, :]
        cos[~ok] = -np.inf
        return _tie_safe_block_topk(qids, ids, cos, k)

    return _topk_merge_bucketed(
        emb_ds.map_batches(partial, batch_format="pyarrow"), k)


# ------------------------------------------------------------ exact L2 kNN

TREE_DIM_MAX = 8
"""Dimension ceiling for the cover-tree strategy in emb_knn's "auto" mode.

Measured envelope (this host, 50k random unit vectors per block): the
hub-chain build runs 135k pts/s at d=2 and 33k pts/s at d=8, but
DEGENERATES at high dimension — at d=64 pairwise distances concentrate
around sqrt(2), so a hub's separation condition (farthest ≤ ball/base)
stays unmet and the chain extends ONE point per sweep: an O(n²·d) build
(>5 min for one 50k block; the reference's own sequential algorithm,
/root/reference/src/CoverTree.cpp:133-179, has the same behavior — it is
the curse of dimensionality, not an implementation artifact).  Past this
ceiling an exact metric index prunes nothing anyway, so the right exact
kernel is the blocked BLAS scan below."""


def emb_knn(emb_ds, query_ids: np.ndarray, query_raw: np.ndarray,
            k: int = ANN_K, strategy: str = "auto"):
    """EXACT Euclidean kNN over the embedding corpus.

    Two per-block strategies with IDENTICAL output (equality-tested in
    tests/test_vecops.py), dispatched on dimension in "auto" mode:

    * "tree" (d ≤ TREE_DIM_MAX): the d-dimensional CoverTree — the
      reference's metric index applied to its general-vector contract
      (/root/reference/src/VectorIO.cpp:25-67, snn_test.py) instead of
      the 2-D spatial case.  Each block builds a local tree (rows sorted
      by vec_id so the tree's (dist, local-id) tie order IS (dist,
      vec_id)) and answers all queries with the adaptive-radius knn_batch
      kernel; per-query descent is sublinear in block size at low
      intrinsic dimension.
    * "scan" (d > TREE_DIM_MAX): one float64 (nq × block) distance
      computation via BLAS (‖q‖² − 2q·x + ‖x‖²) with a tie-safe
      smallest-k cut — the exact-kNN analogue of ann_topk's partial.

    Both emit k(+ties) rows per (query, block); per-block truncation by
    (dist, vec_id) is exact for the global (dist asc, vec_id asc) merge:
    if a dropped candidate were in the global top-k, the k block-mates
    ranked above it would all be too — contradiction.  Scale shape is
    ann_topk's: broadcast queries, streamed corpus, tiny rank merge.
    Output (query_id, rank, neighbor_id); distances never cross the
    oracle boundary (rank gaps >> float noise, asserted in tests)."""
    import ray

    from .covertree import CoverTree

    dim = int(np.asarray(query_raw).shape[1])
    if strategy == "auto":
        strategy = "tree" if dim <= TREE_DIM_MAX else "scan"
    assert strategy in ("tree", "scan"), strategy

    q_ref = ray.put((np.asarray(query_ids, np.int64),
                     np.ascontiguousarray(query_raw, np.float32)))

    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.float64())})

    def tree_partial(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        ids, m = _raw_matrix(batch)
        if len(ids) == 0:
            return empty
        order = np.argsort(ids)  # (dist, local-id) tie order == vec_id order
        ids, m = ids[order], np.ascontiguousarray(m[order])
        tree = CoverTree(m).build()
        qi, pi, di, _ = tree.knn_batch(qm, k + 1)
        nid = ids[pi]
        keep = nid != qids[qi]  # self-exclusion
        return pa.table({"query_id": qids[qi[keep]],
                         "neighbor_id": nid[keep],
                         "dist": di[keep]})

    def scan_partial(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        ids, m = _raw_matrix(batch)
        if len(ids) == 0:
            return empty
        qm64 = qm.astype(np.float64)
        m64 = m.astype(np.float64)
        d2 = ((qm64 * qm64).sum(1)[:, None] - 2.0 * (qm64 @ m64.T)
              + (m64 * m64).sum(1)[None, :])
        np.maximum(d2, 0.0, out=d2)          # clamp BLAS cancellation
        d = np.sqrt(d2)
        d[qids[:, None] == ids[None, :]] = np.inf  # self-exclusion
        nq, nb = d.shape
        if nb > k:
            part = np.argpartition(d, k - 1, axis=1)[:, :k]
            kth = d[np.arange(nq), part[:, k - 1]]
            keep = d <= kth[:, None]  # tie-safe (see _tie_safe_block_topk)
        else:
            keep = np.ones_like(d, bool)
        keep &= np.isfinite(d)
        qi, cj = np.nonzero(keep)
        return pa.table({"query_id": qids[qi], "neighbor_id": ids[cj],
                         "dist": d[qi, cj]})

    partial = tree_partial if strategy == "tree" else scan_partial
    return _topk_merge_bucketed(
        emb_ds.map_batches(partial, batch_format="pyarrow"), k,
        value_col="dist", ascending=True)


def emb_knn_sql(nq: int = ANN_NUM_QUERIES, k: int = ANN_K) -> str:
    """Float64 explicit-order distance (list_transform keeps element
    order) — same accumulation discipline as covertree._dists_to; only
    int ranks cross the compare boundary."""
    return f"""
WITH q AS (
  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {nq}
),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         sqrt(list_sum(list_transform(
              list_zip(q.embedding, e.embedding),
              x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
                 * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))) AS d
  FROM q, embeddings e WHERE e.vec_id != q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY d, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


# ------------------------------------------------------ IVF bucketed store

def ivf_build_store(emb_ds, centroids: np.ndarray, store_dir: str):
    """Materialize the IVF index as a bucketed parquet store: one hive
    partition (bucket=N/) per centroid cell, plus the centroid matrix.
    This is the scale path the in-memory ivf_topk only simulates with
    masks: with the corpus physically bucketed, a query's probe list
    becomes a PARTITION-PRUNED READ — non-probed buckets never leave
    storage (the embedding-space twin of the spatial checkpoint store,
    store.py).  Assignment uses the identical float64 argmax as
    ivf_topk, so the two paths return byte-identical results
    (equality-tested in tests/test_vecops.py)."""
    import os

    import ray

    cent_ref = ray.put(np.asarray(centroids, np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        _, m = _emb_matrix(batch)
        b = ((m @ cent.T).argmax(1) if len(m) else
             np.zeros(0, np.int64)).astype(np.int64)
        return batch.append_column("bucket", pa.array(b))

    (emb_ds.map_batches(assign, batch_format="pyarrow")
     .write_parquet(store_dir, partition_cols=["bucket"]))
    np.save(os.path.join(store_dir, "centroids.npy"),
            np.asarray(centroids, np.float64))
    return store_dir


def ivf_topk_store(store_dir: str, query_ids: np.ndarray,
                   query_mat: np.ndarray, k: int = ANN_K,
                   probes: int = IVF_PROBES):
    """ivf_topk against an ivf_build_store directory: ONLY the union of
    the queries' probed buckets is read (partition pruning at the file
    list — the other buckets' bytes stay on disk); per-query probe masks
    then restrict scoring inside each batch exactly as ivf_topk does.
    Identical output to ivf_topk(emb_ds, ..., same centroids/probes)."""
    import glob
    import os

    import ray
    import ray.data as rd

    cent = np.load(os.path.join(store_dir, "centroids.npy"))
    probe = np.argsort(-(query_mat @ cent.T), axis=1)[:, :probes]
    files = []
    for b in np.unique(probe):
        files += sorted(glob.glob(
            os.path.join(store_dir, f"bucket={int(b)}", "*.parquet")))
    ref = ray.put((np.asarray(query_ids, np.int64), query_mat, probe))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qm, prb = ray.get(ref)
        ids, m = _emb_matrix(batch)
        bucket = _hive_int64(batch["bucket"])
        cos = qm @ m.T
        ok = (bucket[None, :, None] == prb[:, None, :]).any(-1)
        ok &= qids[:, None] != ids[None, :]
        cos[~ok] = -np.inf
        return _tie_safe_block_topk(qids, ids, cos, k)

    return _topk_merge_bucketed(
        rd.read_parquet(files).map_batches(partial, batch_format="pyarrow"),
        k)


# ------------------------------------------- int8 scalar quantization (SQ)

def _sq_codes(m32: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-vector symmetric int8 quantization: scale = max|x| / 127,
    code = clip(floor(x/scale + 0.5), -127, 127) — every arithmetic step
    (float32 abs/max, exact cast to float64, floor) is bitwise-mirrorable
    in SQL, which is why round() is avoided (numpy rounds half-to-even,
    DuckDB half-away).  Returns (scale float64 (n,), codes float64 (n,d)
    integer-valued)."""
    s = np.abs(m32).max(axis=1).astype(np.float64) / 127.0
    x = m32.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.floor(x / s[:, None] + 0.5)
    c = np.clip(c, -127.0, 127.0)
    return s, np.where(s[:, None] > 0.0, c, 0.0)


def sq_stats(emb_ds):
    """Quantization audit -> (vec_id, scale, code_sum, code_min,
    code_max) sorted by vec_id: the driver-checkable projection of the
    int8 codes (full code arrays are asserted element-wise in pytest —
    a list<int8> column would not survive the driver's hash compare).
    Pure per-batch map; at 100 TB this is the compression pass that cuts
    vector storage 4x before ANN serving."""
    def part(batch: pa.Table) -> pa.Table:
        ids, m = _raw_matrix(batch)
        s, c = _sq_codes(m)
        return pa.table({
            "vec_id": ids,
            "scale": s,
            "code_sum": c.sum(1).astype(np.int64),
            "code_min": c.min(1).astype(np.int64),
            "code_max": c.max(1).astype(np.int64),
        })

    return (emb_ds.map_batches(part, batch_format="pyarrow")
            .materialize()  # mat() rule
            .sort("vec_id"))


_SQ_CODE = ("COALESCE(LEAST(GREATEST(floor(CAST(v AS DOUBLE) / "
            "NULLIF(s, 0) + 0.5), -127), 127), 0)")
_SQ_SCALE = ("CAST(list_max(list_transform(embedding, v -> abs(v))) "
             "AS DOUBLE) / 127.0")


def sq_stats_sql() -> str:
    code = _SQ_CODE
    return f"""
WITH d AS (SELECT vec_id, embedding, {_SQ_SCALE} AS s FROM embeddings)
SELECT vec_id, s AS scale,
       CAST(list_sum(list_transform(embedding, v -> {code}))
            AS BIGINT) AS code_sum,
       CAST(list_min(list_transform(embedding, v -> {code}))
            AS BIGINT) AS code_min,
       CAST(list_max(list_transform(embedding, v -> {code}))
            AS BIGINT) AS code_max
FROM d ORDER BY vec_id
"""


def sq_ann_topk(emb_ds, query_ids: np.ndarray, query_mat: np.ndarray,
                k: int = ANN_K):
    """Cosine top-k where the CORPUS side is int8-dequantized (queries
    stay full precision) — search over the 4x-compressed representation,
    the serving shape at 100 TB of vectors.  Same broadcast-query /
    tie-safe-partial / bucketed-merge machinery as ann_topk; ids-only
    oracle (quantization error ~1e-2 dominates float-op ulp noise, and
    ranking gaps are asserted in pytest the same way as ann_topk)."""
    import ray

    q_ref = ray.put((np.asarray(query_ids, np.int64), query_mat))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(q_ref)
        ids, m = _raw_matrix(batch)
        s, c = _sq_codes(m)
        deq = c * s[:, None]
        nrm = np.sqrt((deq * deq).sum(1))
        nrm[nrm == 0.0] = 1.0
        deq /= nrm[:, None]
        cos = qm @ deq.T
        cos[qids[:, None] == ids[None, :]] = -np.inf
        return _tie_safe_block_topk(qids, ids, cos, k)

    return _topk_merge_bucketed(
        emb_ds.map_batches(partial, batch_format="pyarrow"), k)


def sq_ann_topk_sql(nq: int = ANN_NUM_QUERIES, k: int = ANN_K) -> str:
    code = _SQ_CODE
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS qe
  FROM embeddings ORDER BY vec_id LIMIT {nq}
),
d AS (SELECT vec_id, embedding, {_SQ_SCALE} AS s FROM embeddings),
dq AS (
  SELECT vec_id,
         list_transform(embedding, v -> {code} * s) AS deq
  FROM d
),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.deq) AS cos
  FROM q, dq e WHERE e.vec_id != q.vec_id
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


def ivf_sq_build_store(emb_ds, centroids: np.ndarray, store_dir: str):
    """IVF store with int8-COMPRESSED payload: one hive partition per
    centroid cell holding (vec_id, scale float64, codes list<int8>,
    bucket) — the raw float32 embedding never lands on disk, cutting
    the store ~4x.  Bucket assignment is ivf_build_store's identical
    float64 argmax; quantization is _sq_codes, so dequantized search
    over this store is bitwise-equal to sq_ann_topk over the raw
    corpus (codes and scale round-trip parquet exactly)."""
    import os

    import ray

    cent_ref = ray.put(np.asarray(centroids, np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        ids, mraw = _raw_matrix(batch)
        if len(ids) == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "scale": pa.array([], pa.float64()),
                "codes": pa.array([], pa.large_list(pa.int8())),
                "bucket": pa.array([], pa.int64()),
            })
        _, m = _emb_matrix(batch)
        b = (m @ cent.T).argmax(1).astype(np.int64)
        s, c = _sq_codes(mraw)
        d = mraw.shape[1]
        off = np.arange(0, (len(ids) + 1) * d, d, dtype=np.int64)
        codes = pa.LargeListArray.from_arrays(
            off, pa.array(c.reshape(-1).astype(np.int8), pa.int8()))
        return pa.table({"vec_id": ids, "scale": s, "codes": codes,
                         "bucket": b})

    (emb_ds.map_batches(assign, batch_format="pyarrow")
     .write_parquet(store_dir, partition_cols=["bucket"]))
    import numpy as _np
    _np.save(os.path.join(store_dir, "centroids.npy"),
             _np.asarray(centroids, _np.float64))
    return store_dir


def ivf_sq_topk_store(store_dir: str, query_ids: np.ndarray,
                      query_mat: np.ndarray, k: int = ANN_K,
                      probes: int = IVF_PROBES):
    """Cosine top-k against an ivf_sq_build_store directory: partition
    pruning (only probed buckets' files are listed) AND compression
    (only int8 codes + one float64 scale per vector leave storage).
    Dequantize per batch, score, tie-safe partial, bucketed merge —
    with probes=all the output is bitwise-equal to sq_ann_topk over
    the raw corpus."""
    import glob
    import os

    import ray
    import ray.data as rd

    cent = np.load(os.path.join(store_dir, "centroids.npy"))
    probe = np.argsort(-(query_mat @ cent.T), axis=1)[:, :probes]
    files = []
    for b in np.unique(probe):
        files += sorted(glob.glob(
            os.path.join(store_dir, f"bucket={int(b)}", "*.parquet")))
    ref = ray.put((np.asarray(query_ids, np.int64), query_mat, probe))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qm, prb = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        if len(ids) == 0:
            return _tie_safe_block_topk(
                qids, ids.astype(np.int64),
                np.zeros((len(qids), 0), np.float64), k)
        s = batch["scale"].to_numpy()
        col = batch["codes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(col.flatten(), np.int8).astype(np.float64)
        deq = flat.reshape(len(ids), -1) * s[:, None]
        nrm = np.sqrt((deq * deq).sum(1))
        nrm[nrm == 0.0] = 1.0
        deq /= nrm[:, None]
        bucket = _hive_int64(batch["bucket"])
        cos = qm @ deq.T
        ok = (bucket[None, :, None] == prb[:, None, :]).any(-1)
        ok &= qids[:, None] != ids[None, :]
        cos[~ok] = -np.inf
        return _tie_safe_block_topk(qids, ids, cos, k)

    ds = rd.read_parquet(files, columns=["vec_id", "scale", "codes",
                                         "bucket"])
    return _topk_merge_bucketed(
        ds.map_batches(partial, batch_format="pyarrow"), k)


# ------------------------------------------------ per-dimension profile

def dim_stats(emb_ds):
    """-> (dim, n_vecs, vmin, vmax) per embedding dimension, sorted —
    the per-coordinate profile a pipeline reads before choosing scalar
    quantization ranges (sq_stats' global min/max, refined per dim).

    Shape: each block collapses to d rows (dim, count, min, max) via
    one vectorized reduction; the groupby exchange carries d rows per
    block regardless of input size.  min/max of float32 are exact under
    any merge order (unlike float sums), so the oracle compare is
    bitwise; the final cast to float64 is exact."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = np.asarray(col.flatten(), np.float32).reshape(len(batch), -1)
        d = m.shape[1]
        return pa.table({
            "dim": np.arange(d, dtype=np.int64),
            "n": np.full(d, len(batch), np.int64),
            "vmin": m.min(axis=0),
            "vmax": m.max(axis=0),
        })

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "dim": batch["dim"],
            "n_vecs": batch["sum(n)"],
            "vmin": batch["min(vmin)"].to_numpy().astype(np.float64),
            "vmax": batch["max(vmax)"].to_numpy().astype(np.float64),
        })

    return (mat(emb_ds.map_batches(partial, batch_format="pyarrow"))
            .groupby("dim")
            .aggregate(Sum("n"), Min("vmin"), Max("vmax"))
            .map_batches(finalize, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort("dim"))


def dim_stats_sql() -> str:
    return """
SELECT CAST(dim - 1 AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(v) AS DOUBLE) AS vmin,
       CAST(max(v) AS DOUBLE) AS vmax
FROM (SELECT generate_subscripts(embedding, 1) AS dim,
             unnest(embedding) AS v
      FROM embeddings)
GROUP BY dim ORDER BY dim
"""


# ---------------------------------- incremental embedding near-dup (store)

def cosine_neardup_against_store(new_emb_ds, store_dir: str,
                                 tau: float = COS_TAU,
                                 probes: int | None = None):
    """Incremental embedding near-dup: which NEW vectors have cosine >=
    tau against an ivf_build_store corpus -> (a_id = new vec, b_id =
    store vec), sorted.  The ivf store doubles as the near-dup store —
    same hive bucket per centroid cell, raw vectors in place.

    Scale shape: each new vector routes to its `probes` nearest
    centroids' buckets (probes=None = ALL buckets -> provably exact,
    the ivf_topk_store operating-point discipline); each bucket group
    reads ONLY its own store partition.  A store vector lives in
    exactly one bucket, so pairs emit exactly once — no dedup pass.
    Scoring is a float64 GEMM prescreen with slack, then the per-pair
    einsum verify shared with _verify_cosine (line ~703), so the
    tau decision matches the exact operators' bitwise-tested path."""
    import glob as _glob
    import os

    import ray

    cent = np.load(os.path.join(store_dir, "centroids.npy"))
    nb = len(cent)
    p = nb if probes is None else min(int(probes), nb)
    cent_ref = ray.put(np.asarray(cent, np.float64))

    def route(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids, m = _emb_matrix(batch)
        if len(ids) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "embedding": batch["embedding"]})
        sim = m @ c.T
        top = np.argpartition(-sim, min(p, nb - 1), axis=1)[:, :p]
        n = len(ids)
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        rep = np.repeat(np.arange(n), p)
        return pa.table({
            "bucket": top.reshape(-1).astype(np.int64),
            "vec_id": np.repeat(ids, p),
            "embedding": col.take(pa.array(rep, pa.int64())),
        })

    def check(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64())})
        if len(group) == 0:
            return empty
        bk = int(group["bucket"][0].as_py())
        part = os.path.join(store_dir, f"bucket={bk}")
        files = sorted(_glob.glob(os.path.join(part, "*.parquet")))
        if not files:
            return empty
        st = pa.concat_tables([pq.read_table(f, columns=[
            "vec_id", "embedding"]) for f in files])
        a_ids, am = _emb_matrix(group.select(["vec_id", "embedding"]))
        b_ids, bm = _emb_matrix(st)
        if len(a_ids) == 0 or len(b_ids) == 0:
            return empty
        sim = am @ bm.T
        ai, bi = np.nonzero(sim >= tau - 1e-9)  # GEMM prescreen + slack
        if len(ai) == 0:
            return empty
        # exact per-pair verify on the shared einsum path (the decision
        # the margin tests pin down)
        cos = np.einsum("ij,ij->i", am[ai], bm[bi])
        keep = cos >= tau
        order = np.lexsort((b_ids[bi[keep]], a_ids[ai[keep]]))
        return pa.table({
            "a_id": a_ids[ai[keep]][order],
            "b_id": b_ids[bi[keep]][order],
        })

    return (mat(new_emb_ds.map_batches(route, batch_format="pyarrow"))
            .groupby("bucket").map_groups(check, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort(["a_id", "b_id"]))
