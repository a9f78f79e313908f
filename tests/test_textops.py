"""Text-analysis / dedup operators: oracle equality + LSH recall bounds."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF}/documents.parquet')")
    return c


def fetch(ds):
    return ds.to_pandas().reset_index(drop=True)


def assert_matches(got, want, name):
    assert len(got) == len(want), (name, len(got), len(want))
    assert list(got.columns) == list(want.columns), name
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.array_equal(a.view(np.int64), b.view(np.int64)), (name, c)
        else:
            assert np.array_equal(a, b), (name, c)


@pytest.mark.parametrize("name", [
    "token_stats", "repetition_stats", "token_rarity", "bigram_lm_score",
    "ngram_diversity", "tfidf_keywords", "mixture_rebalance",
    "lang_id", "doc_fingerprint", "exact_dedup",
    "ngram_jaccard_dedup", "simhash_dedup", "minhash_lsh_dedup",
    "topk_terms", "sample_bernoulli", "sample_stratified", "corpus_filter",
    "group_quantiles", "subword_stats", "dataset_split", "dup_components",
    "grouped_topk", "normalize_text", "doc_chunks",
    "dup_rate_by_source", "dedup_incremental", "neardup_incremental",
])
def test_text_query_matches_oracle(ray_session, con, name):
    from covertile import api_text
    got = fetch(api_text.QUERIES[name](SF))
    want = con.execute(api_text.ORACLES[name]()).df()
    assert_matches(got, want, name)


def test_repetition_stats_edge_cases():
    """Batch kernel vs DuckDB on degenerate docs: empty text, single
    token (dup_bigram_ratio NULL), all-one-token, alternating bigram
    repeats, multibyte tokens."""
    import pandas as pd
    import pyarrow as pa
    from covertile import textops as T

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["", "one", "a a a a", "a b a b a", "x y z",
                 "naïve café naïve café naïve"],
    })
    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT * FROM docs")
    want = c.execute(T.repetition_stats_sql()).df()
    got = (T.repetition_stats_batch(pa.Table.from_pandas(docs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = want[got.columns].sort_values("doc_id").reset_index(drop=True)
    for col in got.columns:
        a, b = got[col].to_numpy(), want[col].to_numpy()
        if a.dtype.kind == "f":
            assert np.array_equal(a, b, equal_nan=True), col
            m = ~np.isnan(a)
            assert np.array_equal(a[m].view(np.int64),
                                  b[m].view(np.int64)), col
        else:
            assert np.array_equal(a, b), col
    # the two single-token docs have no bigrams -> NULL ratio
    assert got["dup_bigram_ratio"].isna().tolist() == [
        True, True, False, False, False, False]


def test_token_rarity_join_fallback_equals_broadcast(ray_session, con):
    """broadcast_max=0 forces the occurrence×vocab hash-join path; its
    bytes must equal the broadcast path's (and the oracle's)."""
    from covertile import textops as T
    from covertile.sources import read_table

    docs = read_table(SF, "documents", ("doc_id", "text"))
    bcast = fetch(T.token_rarity(docs))
    docs2 = read_table(SF, "documents", ("doc_id", "text"))
    joinp = fetch(T.token_rarity(docs2, broadcast_max=0))
    assert_matches(joinp, bcast, "token_rarity fallback")
    want = con.execute(T.token_rarity_sql()).df()
    assert_matches(bcast, want[bcast.columns], "token_rarity oracle")


def test_bigram_lm_score_fallback_and_edges(ray_session):
    """broadcast_max=0 forces the occurrence×vocab hash-join path; its
    bytes must equal the broadcast path's and DuckDB's, including the
    NULL rows for zero-bigram docs (single token / empty text)."""
    import pandas as pd
    import ray.data as rd
    from covertile import textops as T

    docs = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": ["", "one", "a b", "a b", "a b c a b", "solo",
                 "x y x y x", "b c b"],
    })
    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT * FROM docs")
    want = c.execute(T.bigram_lm_score_sql()).df()
    ds = rd.from_pandas(docs).repartition(3)
    bcast = fetch(T.bigram_lm_score(ds))
    joinp = fetch(T.bigram_lm_score(rd.from_pandas(docs).repartition(3),
                                    broadcast_max=0))
    assert_matches(joinp, bcast, "bigram_lm_score fallback")
    assert_matches(bcast, want[bcast.columns], "bigram_lm_score oracle")
    # zero-bigram docs ("", "one", "solo") carry NULL stats
    assert bcast["n_hapax"].isna().tolist() == [
        True, True, False, False, False, True, False, False]


def test_tfidf_keywords_fallback_equals_broadcast(ray_session, con):
    """broadcast_max=0 forces the tf-rows×df hash-join path; its bytes
    must equal the broadcast path's (and the oracle's)."""
    from covertile import textops as T
    from covertile.sources import read_table

    bcast = fetch(T.tfidf_keywords(read_table(SF, "documents",
                                              ("doc_id", "text"))))
    joinp = fetch(T.tfidf_keywords(read_table(SF, "documents",
                                              ("doc_id", "text")),
                                   broadcast_max=0))
    assert_matches(joinp, bcast, "tfidf_keywords fallback")
    want = con.execute(T.tfidf_keywords_sql()).df()
    assert_matches(bcast, want[bcast.columns], "tfidf_keywords oracle")


def test_bigram_family_empty_input(ray_session):
    """Empty corpora flow through both vocabulary-pass operators."""
    import pyarrow as pa
    import ray.data as rd
    from covertile import textops as T

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    assert T.tfidf_keywords(rd.from_arrow(empty)).count() == 0
    assert T.bigram_lm_score(rd.from_arrow(empty)).count() == 0


def test_mixture_rebalance_empty_input(ray_session):
    """An empty corpus returns an empty typed relation (the oracle's
    behavior), not a zero-size-reduction crash."""
    import pandas as pd
    import ray.data as rd
    from covertile import textops as T

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "source": pd.Series([], dtype="object")})
    ds = T.mixture_rebalance(rd.from_pandas(empty))
    assert ds.count() == 0
    assert ds.schema().names == ["doc_id", "source"]


def test_mixture_rebalance_hits_targets_on_skew(ray_session):
    """Planted 16:3:1 skew: survivors must match the oracle bitwise AND
    land within sampling noise of the exact integer targets
    take_s = w_s*T/W (T = min_s floor(n_s*W/w_s))."""
    import pandas as pd
    import ray.data as rd
    from covertile import textops as T

    n = {"big": 8000, "mid": 1500, "tiny": 500}
    src = np.repeat(list(n), list(n.values()))
    docs = pd.DataFrame({"doc_id": np.arange(sum(n.values()),
                                             dtype=np.int64),
                         "source": src})
    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT * FROM docs")
    want = c.execute(T.mixture_rebalance_sql()).df()
    got = T.mixture_rebalance(rd.from_pandas(docs)).to_pandas()
    assert got.equals(want[got.columns])
    w = {s: 1 + int(T.md5_u64(np.array([s], dtype=object))[0]
                    % np.uint64(T.MIX_WEIGHT_MOD)) for s in n}
    W = sum(w.values())
    tot = min(n[s] * W // w[s] for s in n)
    survivors = got.groupby("source").size()
    for s in n:
        target = w[s] * tot / W
        # binomial noise: 4 sigma of sqrt(target)
        assert abs(survivors.get(s, 0) - target) <= max(
            4 * target ** 0.5, 5), (s, survivors.get(s, 0), target)


def test_doc_chunks_boundaries_and_reconstruction():
    """Chunk-count boundaries (nt == chunk, chunk+1, stride, stride+1),
    no all-overlap tail chunks, and lossless reconstruction: chunk 0 +
    each later chunk minus its `overlap` leading tokens re-concatenates
    to the original document."""
    import pandas as pd
    import pyarrow as pa
    from covertile.curation import (CHUNK_OVERLAP, CHUNK_TOKENS, doc_chunks,
                                    doc_chunks_sql)

    ct, ov, st = CHUNK_TOKENS, CHUNK_OVERLAP, CHUNK_TOKENS - CHUNK_OVERLAP
    sizes = [0, 1, ov, st, st + 1, ct, ct + 1, 3 * st, 3 * st + 1, 500]
    docs = pd.DataFrame({
        "doc_id": np.arange(len(sizes), dtype=np.int64),
        "text": [" ".join(f"t{i}" for i in range(n)) if n else ""
                 for n in sizes],
    })
    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT * FROM docs")
    want = c.execute(doc_chunks_sql()).df()
    import ray.data as rd
    got = doc_chunks(rd.from_pandas(docs)).to_pandas()
    assert got.equals(want[got.columns]), "oracle divergence"
    for d, n in zip(docs.doc_id, sizes):
        g = got[got.doc_id == d].sort_values("chunk_id")
        nt = max(n, 1)  # split('') == ['']
        assert len(g) == max(1, -(-(nt - ov) // st))
        toks = g.iloc[0].chunk_text.split(" ")
        for _, row in g.iloc[1:].iterrows():
            assert row.chunk_text.split(" ")[:ov] == toks[-ov:], "bad halo"
            toks += row.chunk_text.split(" ")[ov:]
        assert " ".join(toks) == docs.text[d] or n == 0


def test_minhash_no_false_positives_and_recall(ray_session):
    """MinHash+LSH pairs must be a subset of the exact Jaccard pairs
    (precision 1.0 by construction — exact verify) with high recall on the
    planted near-duplicates."""
    from covertile import api_text
    exact = fetch(api_text.QUERIES["ngram_jaccard_dedup"](SF))
    approx = fetch(api_text.QUERIES["minhash_lsh_dedup"](SF))
    ek = set(zip(exact["a_id"], exact["b_id"]))
    ak = set(zip(approx["a_id"], approx["b_id"]))
    assert ak <= ek, "LSH produced a pair the exact operator rejects"
    if ek:
        recall = len(ak) / len(ek)
        # J >= 0.5 with 16 bands x 4 rows: P(candidate) = 1-(1-J^4)^16
        # >= 0.65 at J=0.5, ~1.0 at J>=0.7 (the planted dups); require 0.6
        assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_exact_dedup_finds_planted_duplicates(ray_session):
    """Append literal duplicate rows to a copy of the table; exact_dedup
    must group them and keep the smallest doc_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    import tempfile, os
    from covertile import textops as T

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    dup = pa.table({
        "doc_id": pa.array([100001, 100002], pa.int64()),
        "text": docs["text"].slice(0, 2).combine_chunks(),
    })
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "docs.parquet")
        pq.write_table(pa.concat_tables([docs, dup]), path)
        res = fetch(T.exact_dedup(rd.read_parquet(path))
                    .sort("fingerprint"))
    assert len(res) == docs.num_rows  # 2 dup groups collapse
    assert res["n_dups"].sum() == docs.num_rows + 2
    dups = res[res["n_dups"] > 1]
    assert len(dups) == 2
    # keeper is the original (smaller) id
    assert set(dups["keep_id"]) == {docs["doc_id"][0].as_py(),
                                    docs["doc_id"][1].as_py()}


def test_prefix_filter_theorem_holds():
    """Property check: for random sets, every pair with J >= tau shares a
    shingle inside both hash-ordered prefixes (the exactness argument of
    ngram_jaccard_pairs)."""
    from covertile.textops import _prefix_len
    rng = np.random.default_rng(7)
    tau = 0.5
    for _ in range(200):
        n_univ = 40
        a = np.unique(rng.choice(n_univ, rng.integers(5, 25)))
        b = np.unique(rng.choice(n_univ, rng.integers(5, 25)))
        inter = len(np.intersect1d(a, b))
        j = inter / (len(a) + len(b) - inter)
        if j < tau:
            continue
        # "hash order" = integer order here (any global total order works)
        pa_ = a[: _prefix_len(np.array([len(a)]), tau)[0]]
        pb_ = b[: _prefix_len(np.array([len(b)]), tau)[0]]
        assert len(np.intersect1d(pa_, pb_)) > 0, (a, b, j)


def test_simhash_blocks_exact_vs_bruteforce(ray_session):
    """simhash_dup_pairs must equal the brute-force O(n^2) hamming filter."""
    import pyarrow.parquet as pq
    from covertile import api_text, textops as T

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    t = T.simhash_batch(docs)
    sh = np.asarray(t["simhash"], np.uint64)
    ids = t["doc_id"].to_numpy()
    x = sh[:, None] ^ sh[None, :]
    ham = np.zeros_like(x, dtype=np.int64)
    v = x.copy()
    for _ in range(64):
        ham += (v & np.uint64(1)).astype(np.int64)
        v >>= np.uint64(1)
    ai, bi = np.triu_indices(len(ids), 1)
    keep = ham[ai, bi] <= T.SIMHASH_HAM
    want = sorted(zip(ids[ai[keep]], ids[bi[keep]]))
    got = fetch(api_text.QUERIES["simhash_dedup"](SF))
    assert sorted(zip(got["a_id"], got["b_id"])) == want

def test_jaccard_exact_under_truncated_df(ray_session):
    """The prefix filter must stay EXACT for any heavy-hitter table size:
    a tiny top_k degrades pruning, never correctness (absent shingles
    rank df=0, still a globally consistent order)."""
    import ray.data as rd

    from covertile import textops

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    full = fetch(textops.ngram_jaccard_pairs(docs).sort(["a_id", "b_id"]))

    docs2 = rd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id", "text"])
    ref = textops._sampled_df

    def tiny(ds, k, sample_mod, top_k=textops.DF_TOP_K):
        return ref(ds, k, sample_mod, top_k=4)

    textops._sampled_df = tiny
    try:
        trunc = fetch(
            textops.ngram_jaccard_pairs(docs2).sort(["a_id", "b_id"]))
    finally:
        textops._sampled_df = ref
    assert len(full) > 0
    assert full.equals(trunc)


def test_jaccard_verify_semijoin_fallback(ray_session, monkeypatch):
    """Past CAND_ID_COLLECT_MAX the candidate-doc semi-join switches from
    a driver np.unique + ray.put broadcast to a hash-shuffle semi-join;
    the execution path must never change the pairs."""
    import ray.data as rd

    from covertile import textops

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    full = fetch(textops.ngram_jaccard_pairs(docs).sort(["a_id", "b_id"]))

    monkeypatch.setattr(textops, "CAND_ID_COLLECT_MAX", 0)
    docs2 = rd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id", "text"])
    shuf = fetch(textops.ngram_jaccard_pairs(docs2).sort(["a_id", "b_id"]))
    assert len(full) > 0
    assert full.equals(shuf)


def test_quantile_disc_semantics_pinned(con):
    """group_quantiles assumes quantile_disc = sorted element at the
    1-indexed ceil(q*n); pin that against an explicit window-function
    formulation on the real table."""
    explicit = con.execute("""
WITH ranked AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents)
SELECT lang,
       max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN n_chars END) AS p25,
       max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN n_chars END) AS p50,
       max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN n_chars END) AS p75,
       max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN n_chars END) AS p90
FROM ranked GROUP BY lang ORDER BY lang
""").df()
    from covertile import textops as T
    disc = con.execute(T.group_quantiles_sql()).df()
    assert explicit.equals(disc)


def test_subword_regex_parity_edge_cases(ray_session):
    """pyarrow and DuckDB both use RE2; pin count parity on adversarial
    strings (unicode, punctuation runs, empty, digits-in-words)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc
    from covertile.textops import SUBWORD_PAT

    texts = ["", "   ", "a", "Hello, world!!", "x9y8z7", "3.14159",
             "u\u0308mlaut t\u00f6lt", "a-b-c--d", "\ttab\nnl", "ALLCAPS 123 ...",
             "mixed\u00e9accent", "!@#$%^&*()"]
    got = pc.count_substring_regex(pa.array(texts), SUBWORD_PAT).to_pylist()
    con = duckdb.connect()
    want = con.execute(
        f"SELECT len(regexp_extract_all(t, '{SUBWORD_PAT}')) "
        "FROM (SELECT unnest(?) t)", [texts]).df().iloc[:, 0].tolist()
    assert got == want, (got, want)


def test_dup_components_chain_and_star(ray_session):
    """Graph shapes: a 300-deep chain (diameter stress — pointer jumping
    must fixpoint in O(log d) rounds, far under max_rounds=50), a star,
    and singleton-free output."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.textops import dup_components

    chain = np.arange(1000, 1300, dtype=np.int64)
    pairs = pa.table({
        "a_id": pa.array(np.concatenate(
            [chain[:-1], np.array([10, 10, 10], np.int64)])),
        "b_id": pa.array(np.concatenate(
            [chain[1:], np.array([11, 12, 13], np.int64)])),
    })
    out = (dup_components(rd.from_arrow(pairs).repartition(3))
           .to_pandas())
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    want = {int(c): 1000 for c in chain}
    want.update({10: 10, 11: 10, 12: 10, 13: 10})
    assert got == want


def test_dup_components_matches_unionfind_random(ray_session):
    """Property: label propagation equals union-find on random pair
    graphs (cycles, multi-edges, shuffled ids)."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.textops import dup_components

    rng = np.random.default_rng(19)
    for trial in range(2):
        # dense graphs: diameter stays ~O(log n), so the O(diameter)
        # propagation rounds (seconds of fixed Ray cost each) stay few —
        # long-chain stress is covered by test_dup_components_chain_and_star
        n_nodes = int(rng.integers(10, 50))
        ids = rng.choice(10_000, n_nodes, replace=False).astype(np.int64)
        n_edges = 3 * n_nodes
        a = ids[rng.integers(0, n_nodes, n_edges)]
        b = ids[rng.integers(0, n_nodes, n_edges)]
        keep = a != b
        a, b = a[keep], b[keep]
        if len(a) == 0:
            continue
        pairs = pa.table({"a_id": np.minimum(a, b), "b_id": np.maximum(a, b)})
        got = (dup_components(rd.from_arrow(pairs).repartition(4))
               .to_pandas())
        # union-find oracle
        parent = {}
        def find(u):
            while parent.setdefault(u, u) != u:
                parent[u] = parent[parent[u]]
                u = parent[u]
            return u
        for u, v in zip(a.tolist(), b.tolist()):
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        want = {u: find(u) for u in set(a.tolist()) | set(b.tolist())}
        assert dict(zip(got["doc_id"], got["cluster_id"])) == want, trial


def test_normalize_parity_edge_cases():
    """Arrow (utf8proc lower + RE2) and DuckDB (lower + regexp_replace)
    must agree on whitespace/case edge cases."""
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc

    texts = ["Hello   WORLD", "  a\tb\nc  ", "", "ALL", "x  Y\t\tz",
             "already normal", "Trailing  ", "  Leading"]
    got = pc.utf8_trim_whitespace(pc.replace_substring_regex(
        pc.utf8_lower(pa.array(texts)), r"\s+", " ")).to_pylist()
    con = duckdb.connect()
    want = con.execute(
        r"""SELECT trim(regexp_replace(lower(t), '\s+', ' ', 'g'))
            FROM (SELECT unnest(?) t)""", [texts]).df().iloc[:, 0].tolist()
    assert got == want


def test_dedup_corpus_keeps_cluster_minimum(ray_session, con):
    """Composition contract: survivors = all docs minus non-minimum
    members of each near-dup cluster; matches the NOT IN oracle."""
    from covertile import api_text
    got = (api_text.QUERIES["dedup_corpus"](SF)
           .to_pandas().reset_index(drop=True))
    want = con.execute(api_text.ORACLES["dedup_corpus"]()).df()
    assert len(got) == len(want)
    assert np.array_equal(got["doc_id"].to_numpy(),
                          want["doc_id"].to_numpy())
    comp = (api_text.QUERIES["dup_components"](SF)
            .to_pandas())
    dropped = set(comp[comp.doc_id != comp.cluster_id]["doc_id"])
    assert dropped.isdisjoint(set(got["doc_id"]))
    assert set(comp[comp.doc_id == comp.cluster_id]["doc_id"]) <= set(
        got["doc_id"])


def test_repetition_stats_emits_real_arrow_null(ray_session):
    """ADVICE r04: dup_bigram_ratio on a <2-token doc must be an Arrow
    NULL (validity mask), matching the oracle's SQL NULL — not a valid
    float64 NaN that only pandas-level compares equate."""
    import pyarrow as pa
    from covertile.textops import repetition_stats_batch

    out = repetition_stats_batch(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["single", "two tokens two"], pa.string())}))
    col = out["dup_bigram_ratio"]
    assert col.null_count == 1
    assert col[0].as_py() is None          # 1-token doc: real NULL
    assert col[1].as_py() is not None


def test_mixture_rebalance_null_source(ray_session):
    """ADVICE r04: NULL source rows are dropped (the oracle's JOIN on
    source never matches NULL) instead of crashing md5_u64(None)."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.textops import mixture_rebalance

    tbl = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "source": pa.array([None if i % 4 == 0 else f"s{i % 3}"
                            for i in range(40)], pa.string())})
    out = mixture_rebalance(rd.from_arrow(tbl)).to_pandas()
    kept = set(out["doc_id"])
    assert all(d % 4 != 0 for d in kept)   # no null-source row survives
    assert out["source"].notna().all()


def test_dedup_keep_best_prefers_longest_then_min_id(ray_session):
    """Keep-best semantics against planted normalization variants: a
    longer (raw n_chars) copy with a HIGHER doc_id must become keep_id;
    an equal-length copy must lose the tie to the smaller doc_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from covertile import textops as T

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "n_chars"])
    t0 = docs["text"][0].as_py()
    t1 = docs["text"][1].as_py()
    id0 = docs["doc_id"][0].as_py()
    id1 = docs["doc_id"][1].as_py()
    # variant of doc 0: uppercased + doubled spaces -> same normalized
    # form, LARGER raw n_chars, higher doc_id => the variant must win
    v0 = t0.upper().replace(" ", "  ")
    # variant of doc 1: byte-identical copy -> n_chars tie, higher
    # doc_id => the ORIGINAL (smaller id) must win
    extra = pa.table({
        "doc_id": pa.array([900001, 900002], pa.int64()),
        "text": pa.array([v0, t1], pa.string()),
        "n_chars": pa.array([len(v0), len(t1)], pa.int64()),
    })
    res = fetch(T.dedup_keep_best(
        rd.from_arrow(pa.concat_tables([docs, extra])))
        .sort("fingerprint"))
    assert len(res) == docs.num_rows        # both variants join a group
    assert res["n_dups"].sum() == docs.num_rows + 2
    dups = res[res["n_dups"] > 1]
    assert len(dups) == 2
    by_keep = dict(zip(dups["keep_id"], dups["keep_n_chars"]))
    assert by_keep == {900001: len(v0),     # longer variant wins
                       id1: len(t1)}        # tie -> original id wins
    assert id0 not in by_keep


def test_cross_source_overlap_planted_boilerplate(ray_session):
    """Planted shared 8-token prefix across sources is reported with
    exact (n_sources, n_docs); single-source prefixes are absent; the
    result is invariant to input chunking (exchange-shape independence)."""
    import hashlib
    import pyarrow as pa
    import ray.data as rd
    from covertile import textops as T

    boiler = "the quick brown fox jumps over the lazy"   # 8 tokens
    solo = "one two three four five six seven eight"
    rows = [
        (boiler + " tail a", "srcA"), (boiler + " tail b", "srcA"),
        (boiler + " tail c", "srcB"), (boiler + " tail d", "srcC"),
        (solo + " x", "srcA"), (solo + " y", "srcA"),     # 1 source only
        ("short doc", "srcB"),                            # < 8 tokens
    ]
    tbl = pa.table({
        "text": pa.array([r[0] for r in rows], pa.string()),
        "source": pa.array([r[1] for r in rows], pa.string()),
    })
    want_fp = hashlib.md5(boiler.encode()).hexdigest()
    for blocks in (1, 4):
        out = fetch(T.cross_source_overlap(
            rd.from_arrow(tbl).repartition(blocks)).sort("fingerprint"))
        assert list(out["fingerprint"]) == [want_fp]
        assert list(out["n_sources"]) == [3]
        assert list(out["n_docs"]) == [4]


def test_dedup_keep_best_matches_oracle(con, ray_session):
    """Bitwise vs the DuckDB window oracle on the sf table."""
    import ray.data as rd
    from covertile import textops as T

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "n_chars"])
    got = fetch(T.dedup_keep_best(ds).sort("fingerprint"))
    want = con.execute(T.dedup_keep_best_sql()).fetchdf()
    assert_matches(got, want, "dedup_keep_best")


def test_dedup_incremental_nonvacuous_and_pruned(ray_session, tmp_path):
    """The fingerprint store answers incremental dedup with both
    outcomes present (planted dups hit, fresh texts miss), and a new
    shard whose fingerprints touch ONE bucket reads only that store
    partition (the read is per-bucket by construction — asserted by
    checking a query against an empty bucket directory still resolves
    to non-dup instead of erroring)."""
    import pyarrow as pa
    import ray.data as rd
    from covertile import textops as T

    store_docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha", "beta", "gamma"], pa.string()),
    })
    store = str(tmp_path / "fpstore")
    T.fingerprint_build_store(rd.from_arrow(store_docs), store)

    new_docs = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array(["beta", "delta", "alpha"], pa.string()),
    })
    out = (T.dedup_against_store(rd.from_arrow(new_docs), store)
           .to_pandas().set_index("doc_id"))
    assert bool(out.loc[10, "is_dup"]) and out.loc[10, "keep_id"] == 2
    assert not bool(out.loc[11, "is_dup"])
    assert bool(out.loc[12, "is_dup"]) and out.loc[12, "keep_id"] == 1


def test_neardup_store_hand_case(ray_session, tmp_path):
    """LSH store round trip on a hand corpus: an exact duplicate and a
    near-duplicate of store docs must surface with the right partners;
    an unrelated doc must not.  Output pairs are exact-verified, so
    jacc values match the brute Jaccard."""
    import pyarrow as pa
    import ray.data as rd
    from covertile import textops as T

    base = ("the quick brown fox jumps over the lazy dog and then "
            "keeps on running through the quiet field")
    near = base + " x"
    other = ("completely different content with no shared shingles "
             "anywhere in this sentence at all right here")
    store_docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([base, other], pa.string()),
    })
    store = str(tmp_path / "ndstore")
    T.neardup_build_store(rd.from_arrow(store_docs), store)

    new_docs = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array([base, near, "nothing alike whatsoever"],
                         pa.string()),
    })
    out = (T.neardup_against_store(rd.from_arrow(new_docs), store)
           .to_pandas())
    got = {(a, b) for a, b in zip(out["a_id"], out["b_id"])}
    assert (10, 1) in got          # exact duplicate
    assert (11, 1) in got          # near duplicate
    assert all(b != 2 for _, b in got)  # unrelated store doc untouched
    assert (out.set_index(["a_id", "b_id"]).loc[(10, 1), "jacc"] == 1.0)
