"""Driver-facing text-analysis / dedup queries (documents table).

Same contract as api.py: each q_* takes sf_dir and returns a Dataset whose
rows match the paired sql_* oracle bitwise (ints exact, floats are exact
integer ratios).  minhash_lsh has no SQL oracle (LSH recall is
probabilistic); its correctness is pinned by tests/test_textops.py
(no-false-positives + recall vs the exact operator).
"""

from __future__ import annotations

import os

from . import textops as T


def _docs(sf_dir: str, columns=("doc_id", "text")):
    from .sources import read_table
    return read_table(sf_dir, "documents", columns)


def q_token_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(
        T.token_stats_batch, batch_format="pyarrow").materialize().sort("doc_id")


def sql_token_stats() -> str:
    return T.token_stats_sql()


def q_token_rarity(sf_dir: str):
    return T.token_rarity(_docs(sf_dir))


def sql_token_rarity() -> str:
    return T.token_rarity_sql()


def q_mixture_rebalance(sf_dir: str):
    return T.mixture_rebalance(_docs(sf_dir, ("doc_id", "source")))


def sql_mixture_rebalance() -> str:
    return T.mixture_rebalance_sql()


def q_bigram_lm_score(sf_dir: str):
    return T.bigram_lm_score(_docs(sf_dir))


def sql_bigram_lm_score() -> str:
    return T.bigram_lm_score_sql()


def q_ngram_diversity(sf_dir: str):
    return T.ngram_diversity(_docs(sf_dir, ("text", "source")))


def sql_ngram_diversity() -> str:
    return T.ngram_diversity_sql()


def q_tfidf_keywords(sf_dir: str):
    return T.tfidf_keywords(_docs(sf_dir))


def sql_tfidf_keywords() -> str:
    return T.tfidf_keywords_sql()


def q_repetition_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(
        T.repetition_stats_batch, batch_format="pyarrow").materialize().sort("doc_id")


def sql_repetition_stats() -> str:
    return T.repetition_stats_sql()


def q_lang_id(sf_dir: str):
    return _docs(sf_dir).map_batches(
        T.lang_id_batch, batch_format="pyarrow").materialize().sort("doc_id")


def sql_lang_id() -> str:
    return T.lang_id_sql()


def q_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(
        T.fingerprint_batch, batch_format="pyarrow").materialize().sort("doc_id")


def sql_fingerprint() -> str:
    return T.fingerprint_sql()


def q_dup_rate_by_source(sf_dir: str):
    """The documents fixture has no exact-identical texts, so the driver
    query PLANTS deterministic duplicates (doc_id % 7 == 0 docs collapse
    to 3 shared texts), mirrored exactly by the oracle CTE — the
    late_events jitter precedent: the plant makes the dup-detection path
    non-vacuous while staying bitwise-checkable."""
    import numpy as np
    import pyarrow as pa

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        text = np.asarray(batch["text"], dtype=object).copy()
        m = ids % 7 == 0
        text[m] = [f"DUP_{i % 3}" for i in ids[m]]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(text, pa.string()),
                         "source": batch["source"]})

    docs = _docs(sf_dir, ("doc_id", "text", "source")).map_batches(
        plant, batch_format="pyarrow")
    return T.dup_rate_by_source(docs)


def sql_dup_rate_by_source() -> str:
    planted = ("SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN "
               "'DUP_' || CAST(doc_id % 3 AS VARCHAR) ELSE text END "
               "AS text, source FROM documents")
    return T.dup_rate_by_source_sql().replace("FROM documents",
                                              f"FROM ({planted})")


def q_dedup_incremental(sf_dir: str):
    """Incremental exact dedup against a PHYSICAL fingerprint store —
    the 'new crawl shard vs existing corpus' primitive: the store holds
    docs with doc_id % 5 != 0 (built under /tmp per the ivf_topk_store
    discipline), the 'new shard' is doc_id % 5 == 0, and deterministic
    duplicate plants on BOTH sides (store: doc_id % 7 == 0 collapse to
    3 shared texts; new: doc_id % 10 == 0 take the same texts) make the
    dup path non-vacuous while every original fixture text stays
    unique across the split.  Oracle mirrors the split + plants as
    CTEs; the engine's store read is partition-pruned per bucket."""
    import os
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa

    def planted(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        text = np.asarray(batch["text"], dtype=object).copy()
        m = ids % 7 == 0
        text[m] = [f"DUP_{i % 3}" for i in ids[m]]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(text, pa.string())})

    def new_shard(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        keep = ids % 5 == 0
        ids_k = ids[keep]
        text = np.asarray(batch["text"], dtype=object)[keep].copy()
        m = ids_k % 10 == 0
        text[m] = [f"DUP_{i % 3}" for i in ids_k[m]]
        return pa.table({"doc_id": pa.array(ids_k, pa.int64()),
                         "text": pa.array(text, pa.string())})

    def store_side(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        keep = ids % 5 != 0
        return planted(pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "text": pa.array(
                np.asarray(batch["text"], dtype=object)[keep],
                pa.string()),
        }))

    docs = _docs(sf_dir, ("doc_id", "text"))
    store = os.path.join(
        tempfile.gettempdir(),
        f"fpstore-{os.getpid()}-{abs(hash(sf_dir)) % 99991}")
    shutil.rmtree(store, ignore_errors=True)
    T.fingerprint_build_store(
        docs.map_batches(store_side, batch_format="pyarrow"), store)
    return T.dedup_against_store(
        docs.map_batches(new_shard, batch_format="pyarrow"), store)


def sql_dedup_incremental() -> str:
    plant = "'DUP_' || CAST(doc_id % 3 AS VARCHAR)"
    return f"""
WITH store AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN {plant} ELSE text END AS text
  FROM documents WHERE doc_id % 5 != 0
),
st AS (
  SELECT md5(text) AS fp, min(doc_id) AS keep_id
  FROM store GROUP BY fp
),
new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 10 = 0 THEN {plant} ELSE text END) AS fp
  FROM documents WHERE doc_id % 5 = 0
)
SELECT new.doc_id,
       (st.fp IS NOT NULL) AS is_dup,
       st.keep_id
FROM new LEFT JOIN st ON new.fp = st.fp
ORDER BY new.doc_id
"""


_ND_PLANT = ("near duplicate planted document number {} "
             "with shared shingle mass for the lsh store")


def q_neardup_incremental(sf_dir: str):
    """Incremental NEAR-dup against the physical LSH store: same
    store/new split as dedup_incremental (doc_id % 5), with LONG
    planted texts (k-shingleable, 3 classes) so cross-split Jaccard-1.0
    pairs exist.  Engine = banded-MinHash candidates from the store's
    bands/ partitions + exact verify against its shingles/ partitions;
    oracle = exact cross-split Jaccard (the sql_minhash_lsh precedent:
    precision 1.0 by construction, recall 1.0 at this operating point
    on the fixtures)."""
    import os
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa

    def store_side(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        keep = ids % 5 != 0
        ids_k = ids[keep]
        text = np.asarray(batch["text"], dtype=object)[keep].copy()
        m = ids_k % 7 == 0
        text[m] = [_ND_PLANT.format(i % 3) for i in ids_k[m]]
        return pa.table({"doc_id": pa.array(ids_k, pa.int64()),
                         "text": pa.array(text, pa.string())})

    def new_shard(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        keep = ids % 5 == 0
        ids_k = ids[keep]
        text = np.asarray(batch["text"], dtype=object)[keep].copy()
        m = ids_k % 10 == 0
        text[m] = [_ND_PLANT.format(i % 3) for i in ids_k[m]]
        return pa.table({"doc_id": pa.array(ids_k, pa.int64()),
                         "text": pa.array(text, pa.string())})

    docs = _docs(sf_dir, ("doc_id", "text"))
    store = os.path.join(
        tempfile.gettempdir(),
        f"ndstore-{os.getpid()}-{abs(hash(sf_dir)) % 99991}")
    shutil.rmtree(store, ignore_errors=True)
    T.neardup_build_store(
        docs.map_batches(store_side, batch_format="pyarrow"), store)
    return T.neardup_against_store(
        docs.map_batches(new_shard, batch_format="pyarrow"), store)


def sql_neardup_incremental() -> str:
    from .textops import JACCARD_TAU, SHINGLE_K, shingle_sql_expr
    plant = ("'" + _ND_PLANT.replace("{}", "' || CAST(doc_id % 3 AS "
                                     "VARCHAR) || '") + "'")
    sh = shingle_sql_expr(SHINGLE_K)
    return f"""
WITH stored AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN {plant} ELSE text END AS text
  FROM documents WHERE doc_id % 5 != 0
),
newd AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN {plant} ELSE text END AS text
  FROM documents WHERE doc_id % 5 = 0
),
shs AS (SELECT doc_id, {sh} AS s FROM stored),
shn AS (SELECT doc_id, {sh} AS s FROM newd),
j AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
           AS jacc
  FROM shn a, shs b
)
SELECT a_id, b_id, jacc FROM j WHERE jacc >= {JACCARD_TAU}
ORDER BY a_id, b_id
"""


def q_exact_dedup(sf_dir: str):
    return T.exact_dedup(_docs(sf_dir)).materialize().sort("fingerprint")


def sql_exact_dedup() -> str:
    return T.exact_dedup_sql()


def q_dedup_keep_best(sf_dir: str):
    return T.dedup_keep_best(
        _docs(sf_dir, columns=("doc_id", "text", "n_chars"))
    ).materialize().sort("fingerprint")


def sql_dedup_keep_best() -> str:
    return T.dedup_keep_best_sql()


def q_cross_source_overlap(sf_dir: str):
    return T.cross_source_overlap(
        _docs(sf_dir, columns=("text", "source"))).materialize().sort("fingerprint")


def sql_cross_source_overlap() -> str:
    return T.cross_source_overlap_sql()


def q_ngram_jaccard(sf_dir: str):
    return T.ngram_jaccard_pairs(_docs(sf_dir)).materialize().sort(["a_id", "b_id"])


def sql_ngram_jaccard() -> str:
    return T.ngram_jaccard_sql()


def q_simhash_dups(sf_dir: str):
    return T.simhash_dup_pairs(_docs(sf_dir)).materialize().sort(["a_id", "b_id"])


def sql_simhash_dups() -> str:
    return T.simhash_dup_sql()


def q_minhash_lsh(sf_dir: str):
    return T.minhash_lsh_pairs(_docs(sf_dir)).materialize().sort(["a_id", "b_id"])


def sql_minhash_lsh() -> str:
    """The exact-Jaccard pair table IS a valid oracle for the LSH path:
    precision is 1.0 by construction (every candidate is re-verified with
    the exact vectorized Jaccard, so output ⊆ exact pairs always), and at
    the driver's 16-band/4-row operating point recall is 1.0 on the test
    corpora (all true J>=0.5 pairs collide in >=1 band; verified at
    sf0.001 and sf0.01, re-asserted in tests/test_textops.py) — so the
    driver's equality check is the subset check plus a recall floor."""
    return T.ngram_jaccard_sql()


def q_topk_terms(sf_dir: str):
    return T.topk_terms(_docs(sf_dir))


def sql_topk_terms() -> str:
    return T.topk_terms_sql()


def q_sample_bernoulli(sf_dir: str):
    return T.sample_bernoulli(_docs(sf_dir, columns=("doc_id",)))


def sql_sample_bernoulli() -> str:
    return T.sample_bernoulli_sql()


def q_sample_stratified(sf_dir: str):
    return T.sample_stratified(_docs(sf_dir, columns=("doc_id", "lang")))


def sql_sample_stratified() -> str:
    return T.sample_stratified_sql()


def q_subword_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(
        T.subword_stats_batch, batch_format="pyarrow").materialize().sort("doc_id")


def sql_subword_stats() -> str:
    return T.subword_stats_sql()


def q_normalize(sf_dir: str):
    return _docs(sf_dir).map_batches(
        T.normalize_batch, batch_format="pyarrow").materialize().sort("doc_id")


def sql_normalize() -> str:
    return T.normalize_sql()


def q_grouped_topk(sf_dir: str):
    return T.grouped_topk(_docs(sf_dir, columns=("doc_id", "lang", "n_chars")))


def sql_grouped_topk() -> str:
    return T.grouped_topk_sql()


def q_dup_components(sf_dir: str):
    return T.dup_components(T.ngram_jaccard_pairs(_docs(sf_dir)))


def sql_dup_components() -> str:
    return T.dup_components_sql()


def q_dataset_split(sf_dir: str):
    return T.dataset_split(_docs(sf_dir, columns=("doc_id",)))


def sql_dataset_split() -> str:
    return T.dataset_split_sql()


def q_group_quantiles(sf_dir: str):
    return T.group_quantiles(_docs(sf_dir, columns=("lang", "n_chars")))


def sql_group_quantiles() -> str:
    return T.group_quantiles_sql()


def q_corpus_filter(sf_dir: str):
    return T.corpus_filter(_docs(sf_dir))


def sql_corpus_filter() -> str:
    return T.corpus_filter_sql()


def q_sequence_pack(sf_dir: str):
    from . import curation
    return curation.sequence_pack(_docs(sf_dir))


def sql_sequence_pack() -> str:
    from . import curation
    return curation.sequence_pack_sql()


def q_doc_chunks(sf_dir: str):
    from . import curation
    return curation.doc_chunks(_docs(sf_dir))


def sql_doc_chunks() -> str:
    from . import curation
    return curation.doc_chunks_sql()


def q_split_contamination(sf_dir: str):
    from . import curation
    return curation.split_contamination(_docs(sf_dir))


def sql_split_contamination() -> str:
    from . import curation
    return curation.split_contamination_sql()


def q_pii_scrub(sf_dir: str):
    from . import curation
    return curation.pii_scrub(_docs(sf_dir))


def sql_pii_scrub() -> str:
    from . import curation
    return curation.pii_scrub_sql()


def q_bm25_topk(sf_dir: str):
    from . import search
    return search.bm25_topk(_docs(sf_dir))


def sql_bm25_topk() -> str:
    from . import search
    return search.bm25_topk_sql()


def q_bm25_topk_store(sf_dir: str):
    """The repeated-query BM25 path: hive-partitioned postings store
    built under /tmp, then a PARTITION-PRUNED two-pass query over only
    the query terms' buckets.  Byte-identical to bm25_topk, so its SQL
    oracle applies (equality also pytest-asserted in tests/test_search.py)."""
    import os
    import shutil
    import tempfile

    from . import search
    store = os.path.join(
        tempfile.gettempdir(),
        f"bm25store-{os.getpid()}-{abs(hash(sf_dir)) % 99991}")
    shutil.rmtree(store, ignore_errors=True)
    search.bm25_build_store(_docs(sf_dir), store)
    return search.bm25_topk_store(store)


def q_table_profile(sf_dir: str):
    from . import curation
    from .sources import read_table
    return curation.table_profile(
        read_table(sf_dir, "documents", list(curation.PROFILE_COLUMNS)))


def sql_table_profile() -> str:
    from . import curation
    return curation.table_profile_sql()


def q_dedup_corpus(sf_dir: str):
    return T.dedup_corpus(_docs(sf_dir))


def sql_dedup_corpus() -> str:
    return T.dedup_corpus_sql()



def q_dup_spans(sf_dir: str):
    from . import curation
    return curation.dup_spans(_docs(sf_dir))


def sql_dup_spans() -> str:
    from . import curation
    return curation.dup_spans_sql()



def q_doc_dup_ratio(sf_dir: str):
    from . import curation
    return curation.doc_dup_ratio(_docs(sf_dir))


def sql_doc_dup_ratio() -> str:
    from . import curation
    return curation.doc_dup_ratio_sql()



def q_hll_profile(sf_dir: str):
    from . import curation
    return curation.hll_profile(
        _docs(sf_dir, columns=curation.PROFILE_COLUMNS))


def sql_hll_profile() -> str:
    from . import curation
    return curation.hll_profile_sql()



def q_cms_topk_counts(sf_dir: str):
    from . import curation
    return curation.cms_topk_counts(_docs(sf_dir))


def sql_cms_topk_counts() -> str:
    from . import curation
    return curation.cms_topk_counts_sql()


QUERIES = {
    "token_stats": q_token_stats,
    "repetition_stats": q_repetition_stats,
    "token_rarity": q_token_rarity,
    "bigram_lm_score": q_bigram_lm_score,
    "ngram_diversity": q_ngram_diversity,
    "tfidf_keywords": q_tfidf_keywords,
    "mixture_rebalance": q_mixture_rebalance,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_fingerprint,
    "exact_dedup": q_exact_dedup,
    "dup_rate_by_source": q_dup_rate_by_source,
    "dedup_incremental": q_dedup_incremental,
    "neardup_incremental": q_neardup_incremental,
    "ngram_jaccard_dedup": q_ngram_jaccard,
    "simhash_dedup": q_simhash_dups,
    "minhash_lsh_dedup": q_minhash_lsh,
    "topk_terms": q_topk_terms,
    "sample_bernoulli": q_sample_bernoulli,
    "sample_stratified": q_sample_stratified,
    "corpus_filter": q_corpus_filter,
    "group_quantiles": q_group_quantiles,
    "subword_stats": q_subword_stats,
    "dataset_split": q_dataset_split,
    "dup_components": q_dup_components,
    "grouped_topk": q_grouped_topk,
    "normalize_text": q_normalize,
    "sequence_pack": q_sequence_pack,
    "doc_chunks": q_doc_chunks,
    "split_contamination": q_split_contamination,
    "pii_scrub": q_pii_scrub,
    "bm25_topk": q_bm25_topk,
    "bm25_topk_store": q_bm25_topk_store,
    "table_profile": q_table_profile,
    "dedup_corpus": q_dedup_corpus,
    "dedup_keep_best": q_dedup_keep_best,
    "cross_source_overlap": q_cross_source_overlap,
    "dup_spans": q_dup_spans,
    "doc_dup_ratio": q_doc_dup_ratio,
    "hll_profile": q_hll_profile,
    "cms_topk_counts": q_cms_topk_counts,
}

ORACLES = {
    "token_stats": sql_token_stats,
    "repetition_stats": sql_repetition_stats,
    "token_rarity": sql_token_rarity,
    "bigram_lm_score": sql_bigram_lm_score,
    "ngram_diversity": sql_ngram_diversity,
    "tfidf_keywords": sql_tfidf_keywords,
    "mixture_rebalance": sql_mixture_rebalance,
    "lang_id": sql_lang_id,
    "doc_fingerprint": sql_fingerprint,
    "exact_dedup": sql_exact_dedup,
    "dup_rate_by_source": sql_dup_rate_by_source,
    "dedup_incremental": sql_dedup_incremental,
    "neardup_incremental": sql_neardup_incremental,
    "ngram_jaccard_dedup": sql_ngram_jaccard,
    "simhash_dedup": sql_simhash_dups,
    "minhash_lsh_dedup": sql_minhash_lsh,
    "topk_terms": sql_topk_terms,
    "sample_bernoulli": sql_sample_bernoulli,
    "sample_stratified": sql_sample_stratified,
    "corpus_filter": sql_corpus_filter,
    "group_quantiles": sql_group_quantiles,
    "subword_stats": sql_subword_stats,
    "dataset_split": sql_dataset_split,
    "dup_components": sql_dup_components,
    "grouped_topk": sql_grouped_topk,
    "normalize_text": sql_normalize,
    "sequence_pack": sql_sequence_pack,
    "doc_chunks": sql_doc_chunks,
    "split_contamination": sql_split_contamination,
    "pii_scrub": sql_pii_scrub,
    "bm25_topk": sql_bm25_topk,
    "bm25_topk_store": sql_bm25_topk,
    "table_profile": sql_table_profile,
    "dedup_corpus": sql_dedup_corpus,
    "dedup_keep_best": sql_dedup_keep_best,
    "cross_source_overlap": sql_cross_source_overlap,
    "dup_spans": sql_dup_spans,
    "doc_dup_ratio": sql_doc_dup_ratio,
    "hll_profile": sql_hll_profile,
    "cms_topk_counts": sql_cms_topk_counts,
}
