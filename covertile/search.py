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
     aggregate.  (A reusable physical index would be the ivf_topk_store
     pattern — hive-partitioned postings — noted as the repeated-query
     path.)
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

import numpy as np
import pyarrow as pa
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
