"""Full-text relevance search over the documents table: BM25 top-k.

The similarity-search family (vecops) covers embeddings; this is the
lexical side a training-data platform needs for corpus exploration and
targeted retrieval ("find the docs most about X").

Execution shape (two corpus passes, no shuffle at all):

  1. corpus statistics — per-block partials reduce to ONE row
     (doc count, total token count, per-query-term document frequency);
     driver combines a blocks-sized table of scalars.  This replaces an
     inverted-index build: for a FIXED query, df of the query terms is
     all the index knowledge BM25 needs, and it is a metadata-sized
     aggregate.  The reusable physical index exists too: bm25_build_store
     / bm25_topk_store below (hive-partitioned postings, the
     ivf_topk_store pattern) — the repeated-query path, which swaps the
     two FULL corpus passes for two PARTITION-PRUNED passes over only the
     query terms' buckets.
  2. scoring — per-block vectorized tf over the flattened token buffer
     (one equality mask per query term), BM25 in float64 with a PINNED
     operation order so the score is bitwise equal to the SQL oracle's
     expression tree, then a per-block top-k partial under the total
     order (score DESC, doc_id ASC); ≤ k rows per block reach the final
     single-task merge.

idf uses math.log (CPython → libm), which is bitwise-identical to
DuckDB's ln() (also libm) — verified in tests; numpy's SIMD log may
differ by 1 ulp, so the per-term scalar idf is computed driver-side.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa

from .joins import mat
import pyarrow.compute as pc

from . import textops as T

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("fast", "window", "hash")
BM25_K = 10


def _tok_arrays(batch: pa.Table):
    toks = T._token_lists(T._text_col(batch))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = np.asarray(pc.list_value_length(toks), np.int64)
    off = T._segment_offsets(lens)
    return toks.flatten(), lens, off


def bm25_topk(docs_ds, terms: tuple[str, ...] = BM25_QUERY,
              k: int = BM25_K, k1: float = BM25_K1, b: float = BM25_B):
    """-> (rank, doc_id, score): the k highest-BM25 documents for the
    query terms, rank 1..k by (score DESC, doc_id ASC); zero-scoring
    documents (no query term present) never rank."""
    terms = tuple(terms)

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, lens, off = _tok_arrays(batch)
        cols = {
            "n_docs": np.array([len(lens)], np.int64),
            "sum_dl": np.array([int(lens.sum())], np.int64),
        }
        for i, t in enumerate(terms):
            m = np.asarray(pc.equal(flat, t)).astype(np.int64)
            cols[f"df_{i}"] = np.array(
                [int((T._segment_sum(m, off) > 0).sum())], np.int64)
        return pa.table(cols)

    rows = docs_ds.map_batches(stats_partial,
                               batch_format="pyarrow").take_all()
    n_docs = sum(int(r["n_docs"]) for r in rows)
    sum_dl = sum(int(r["sum_dl"]) for r in rows)
    dfs = [sum(int(r[f"df_{i}"]) for r in rows) for i in range(len(terms))]
    if n_docs == 0:
        return docs_ds.map_batches(
            lambda _: pa.table({"rank": pa.array([], pa.int64()),
                                "doc_id": pa.array([], pa.int64()),
                                "score": pa.array([], pa.float64())}),
            batch_format="pyarrow")
    avgdl = sum_dl / n_docs
    # operation order pinned to the SQL oracle's expression tree
    idfs = [math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)) for df in dfs]
    c1 = k1 + 1.0
    c2 = 1.0 - b

    def score_partial(batch: pa.Table) -> pa.Table:
        flat, lens, off = _tok_arrays(batch)
        ids = batch["doc_id"].to_numpy()
        dl = lens.astype(np.float64)
        score = np.zeros(len(ids), np.float64)
        for t, idf in zip(terms, idfs):
            m = np.asarray(pc.equal(flat, t)).astype(np.int64)
            tf = T._segment_sum(m, off).astype(np.float64)
            score = score + (idf * (tf * c1)
                             / (tf + k1 * (c2 + b * dl / avgdl)))
        hit = score > 0.0
        ids, score = ids[hit], score[hit]
        order = np.lexsort((ids, -score))[:k]
        return pa.table({"doc_id": ids[order], "score": score[order]})

    def merge(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        score = batch["score"].to_numpy()
        order = np.lexsort((ids, -score))[:k]
        return pa.table({
            "rank": np.arange(1, len(order) + 1, dtype=np.int64),
            "doc_id": ids[order],
            "score": score[order],
        })

    return (docs_ds.map_batches(score_partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None))


def bm25_build_store(docs_ds, store_dir: str, nbuckets: int | None = None
                     ) -> str:
    """Materialize the repeated-query path: a hive-partitioned inverted
    postings store (the lexical twin of vecops.ivf_build_store).

    Layout:
      store_dir/bucket=N/*.parquet   — postings (term, doc_id, tf, dl),
                                       bucket = md5_u64(term) >> shift
      store_dir/bucket=-1/*.parquet  — per-block corpus-stats sentinel
                                       rows (tf=n_docs, dl=sum_dl); never
                                       read by queries (term buckets ≥ 0)
      store_dir/stats.json           — {n_docs, sum_dl, shift}, written
                                       LAST (its absence marks a partial
                                       build)

    dl is denormalized onto every posting row (2 extra int64s) so queries
    never join back to the corpus.  Bucket count derives from cluster/input
    size (sizing.fanout) unless pinned; the term->bucket map is pure
    md5_u64, so a query term's partition is computable without any lookup
    structure.  Postings extraction is one vectorized corpus pass
    (dictionary codes + one lexsort per batch, no Python row loop); the
    hive write is Ray's partitioned write — postings of one term always
    land in one bucket directory."""
    import json
    import shutil

    from . import store as ckstore
    from .sizing import bucket_shift

    # a partial build (killed between the postings write and stats.json)
    # must not leave stale partition files for a rebuild to merge with —
    # clobber the directory, and keep stats.json the LAST write so its
    # presence certifies a complete store
    if os.path.isdir(store_dir):
        shutil.rmtree(store_dir)

    shift = bucket_shift(nbuckets)

    def _stats_row(n_docs: int, sum_dl: int) -> pa.Table:
        return pa.table({"term": pa.array([""], pa.string()),
                         "doc_id": pa.array([-1], pa.int64()),
                         "tf": pa.array([n_docs], pa.int64()),
                         "dl": pa.array([sum_dl], pa.int64()),
                         "bucket": pa.array([-1], pa.int64())})

    def postings(batch: pa.Table) -> pa.Table:
        flat, lens, off = _tok_arrays(batch)
        ids = batch["doc_id"].to_numpy()
        if len(flat) == 0:
            return _stats_row(len(lens), 0)
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy().astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        order = np.lexsort((codes, doc_of))
        c_s, d_s = codes[order], doc_of[order]
        new = np.ones(len(c_s), bool)
        new[1:] = (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, len(c_s)))
        terms_arr = d.dictionary.take(pa.array(c_s[starts], pa.int64()))
        if terms_arr.type != pa.string():
            terms_arr = terms_arr.cast(pa.string())
        bk = (T.md5_u64(terms_arr) >> shift).astype(np.int64)
        out = pa.table({"term": terms_arr,
                        "doc_id": ids[d_s[starts]],
                        "tf": tf.astype(np.int64),
                        "dl": lens[d_s[starts]],
                        "bucket": bk})
        # corpus stats ride the SAME pass as one sentinel row per block
        # (bucket=-1), so the build is ONE corpus scan, not two
        return pa.concat_tables([out, _stats_row(len(lens),
                                                 int(lens.sum()))])

    (docs_ds.map_batches(postings, batch_format="pyarrow")
     .write_parquet(store_dir, partition_cols=["bucket"]))

    sdir = os.path.join(store_dir, "bucket=-1")
    sfiles = [os.path.join(sdir, f) for f in os.listdir(sdir)
              if f.endswith(".parquet")] if os.path.isdir(sdir) else []
    n_docs = sum_dl = 0
    import pyarrow.parquet as pq
    for f in sfiles:
        t = pq.read_table(f, columns=["tf", "dl"])
        n_docs += int(pc.sum(t["tf"]).as_py() or 0)
        sum_dl += int(pc.sum(t["dl"]).as_py() or 0)
    stats = {"n_docs": n_docs, "sum_dl": sum_dl, "shift": int(shift)}
    ckstore.atomic_write_bytes(
        os.path.join(store_dir, "stats.json"), json.dumps(stats).encode())
    return store_dir


def bm25_topk_store(store_dir: str, terms: tuple[str, ...] = BM25_QUERY,
                    k: int = BM25_K, k1: float = BM25_K1,
                    b: float = BM25_B):
    """bm25_topk against a bm25_build_store directory — byte-identical
    output (equality-tested in tests/test_search.py; same SQL oracle).

    Where bm25_topk makes TWO FULL CORPUS passes per query, this makes two
    PARTITION-PRUNED passes over only the query terms' postings buckets
    (the other buckets' bytes never leave storage — ivf_topk_store's
    pruning discipline on the lexical side):

      1. candidates — pruned read, per-batch filter term ∈ query terms;
         the survivors (docs containing ≥1 query term, one row per
         doc×present-term) are candidate-sized and stay in the object
         store.  df per term = a metadata-sized partial count over them.
      2. scoring — contributions pivot per doc inside hash-bucketed
         groups; summation runs in query-term order (absent terms add an
         exact 0.0), reproducing bm25_topk's pinned float64 expression
         tree bit for bit.  ≤ k rows per group reach the final merge."""
    import json

    import ray
    import ray.data as rd

    from .sizing import bucket_shift

    terms = tuple(terms)
    with open(os.path.join(store_dir, "stats.json")) as f:
        stats = json.load(f)
    n_docs, sum_dl = stats["n_docs"], stats["sum_dl"]
    shift = np.uint64(stats["shift"])

    empty = pa.table({"rank": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if n_docs == 0:
        return rd.from_arrow(empty)

    # duplicate query terms: postings are stored once per (term, doc), so
    # a term appearing in several query SLOTS must contribute once per
    # slot (bm25_topk and the SQL expression tree score each slot
    # independently).  index_in alone maps every occurrence to the FIRST
    # slot and silently drops the duplicates' contributions — expand each
    # matched posting row into one row per slot of its term instead.
    uniq_terms = list(dict.fromkeys(terms))
    slots_by_term = {t: [] for t in uniq_terms}
    for j, t in enumerate(terms):
        slots_by_term[t].append(j)
    reps_u = np.array([len(slots_by_term[t]) for t in uniq_terms], np.int64)
    soff_u = np.concatenate(([0], np.cumsum(reps_u)))
    slots_flat = np.array([j for t in uniq_terms for j in slots_by_term[t]],
                          np.int64)
    term_arr = pa.array(uniq_terms, pa.string())
    tbuckets = np.unique(
        (T.md5_u64(term_arr) >> shift).astype(np.int64))
    files = []
    for bk in tbuckets:
        d = os.path.join(store_dir, f"bucket={int(bk)}")
        if os.path.isdir(d):
            files += sorted(
                os.path.join(d, f) for f in os.listdir(d)
                if f.endswith(".parquet"))
    if not files:
        return rd.from_arrow(empty)

    tref = ray.put((term_arr, reps_u, soff_u, slots_flat))

    def candidates(batch: pa.Table) -> pa.Table:
        """term -> query SLOT index (one output row per matching slot);
        non-query terms dropped."""
        tq, reps, soff, sflat = ray.get(tref)
        idx = pc.index_in(batch["term"], value_set=tq)
        keep = pc.is_valid(idx)
        out = batch.filter(keep)
        u = pc.cast(idx.filter(keep), pa.int64()).to_numpy()
        r = reps[u]
        total = int(r.sum())
        goff = np.concatenate(([0], np.cumsum(r)))
        ti = sflat[np.repeat(soff[u], r)
                   + (np.arange(total) - np.repeat(goff[:-1], r))]
        take = pa.array(np.repeat(np.arange(len(u), dtype=np.int64), r))
        return pa.table({
            "ti": pa.array(ti),
            "doc_id": out["doc_id"].take(take),
            "tf": out["tf"].take(take),
            "dl": out["dl"].take(take),
        })

    cand = (rd.read_parquet(files, columns=["term", "doc_id", "tf", "dl"])
            .map_batches(candidates, batch_format="pyarrow")
            .materialize())  # candidate-sized: docs containing a query term

    def df_partial(batch: pa.Table) -> pa.Table:
        c = np.bincount(batch["ti"].to_numpy(), minlength=len(terms))
        return pa.table({"df": c.astype(np.int64),
                         "ti": np.arange(len(terms), dtype=np.int64)})

    dfs = np.zeros(len(terms), np.int64)
    for r in cand.map_batches(df_partial, batch_format="pyarrow").take_all():
        dfs[int(r["ti"])] += int(r["df"])

    avgdl = sum_dl / n_docs
    # pinned op order — identical to bm25_topk / the SQL expression tree
    idfs = np.array([math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                     for df in dfs], np.float64)
    c1 = k1 + 1.0
    c2 = 1.0 - b
    nt = len(terms)
    gshift = bucket_shift()
    FIB = np.uint64(11400714819323198485)

    def score_partial(batch: pa.Table) -> pa.Table:
        """Per-posting contribution + doc-hash group key."""
        ti = batch["ti"].to_numpy()
        tf = batch["tf"].to_numpy().astype(np.float64)
        dl = batch["dl"].to_numpy().astype(np.float64)
        contrib = (idfs[ti] * (tf * c1)
                   / (tf + k1 * (c2 + b * dl / avgdl)))
        ids = batch["doc_id"].to_numpy()
        gk = ((ids.astype(np.uint64) * FIB) >> gshift).astype(np.int64)
        return pa.table({"doc_id": ids, "ti": ti, "contrib": contrib,
                         "gk": gk})

    def group_topk(group: pa.Table) -> pa.Table:
        """Pivot a hash group's (doc, term) contributions and sum in
        query-term order — bitwise bm25_topk's accumulation — then keep
        the group-local top-k (a superset of each doc's global standing:
        all of a doc's postings hash to one group)."""
        ids = group["doc_id"].to_numpy()
        ti = group["ti"].to_numpy()
        cv = group["contrib"].to_numpy()
        u, inv = np.unique(ids, return_inverse=True)
        mat = np.zeros((len(u), nt), np.float64)
        mat[inv, ti] = cv
        score = np.zeros(len(u), np.float64)
        for j in range(nt):
            score = score + mat[:, j]
        hit = score > 0.0
        du, score = u[hit], score[hit]
        order = np.lexsort((du, -score))[:k]
        return pa.table({"doc_id": du[order], "score": score[order]})

    def merge(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        score = batch["score"].to_numpy()
        order = np.lexsort((ids, -score))[:k]
        return pa.table({
            "rank": np.arange(1, len(order) + 1, dtype=np.int64),
            "doc_id": ids[order],
            "score": score[order],
        })

    return (mat(cand.map_batches(score_partial, batch_format="pyarrow"))
            .groupby("gk").map_groups(group_topk, batch_format="pyarrow")
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None))


def bm25_topk_sql(terms: tuple[str, ...] = BM25_QUERY, k: int = BM25_K,
                  k1: float = BM25_K1, b: float = BM25_B) -> str:
    terms = tuple(terms)
    c1, c2 = repr(k1 + 1.0), repr(1.0 - b)
    dfsel = ", ".join(
        f"(SELECT count(*) FROM t WHERE list_contains(toks, '{t}')) AS df{i}"
        for i, t in enumerate(terms))
    parts = []
    for i in range(len(terms)):
        tf = (f"CAST(len(list_filter(toks, x -> x = '{terms[i]}')) "
              f"AS DOUBLE)")
        idf = f"ln(1.0 + (g.n - df.df{i} + 0.5) / (df.df{i} + 0.5))"
        parts.append(
            f"{idf} * ({tf} * {c1}) / ({tf} + {repr(k1)} * "
            f"({c2} + {repr(b)} * CAST(len(toks) AS DOUBLE) / g.avgdl))")
    score = " + ".join(parts)
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT count(*) AS n,
         CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl
  FROM t
),
df AS (SELECT {dfsel}),
s AS (SELECT doc_id, {score} AS score FROM t, g, df)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         AS rank,
       doc_id, score
FROM s WHERE score > 0 ORDER BY score DESC, doc_id LIMIT {int(k)}
"""
