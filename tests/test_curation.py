"""Curation operators (sequence packing, split contamination, PII scrub)
and the per-user rolling window vs DuckDB oracles."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _assert_frames_equal(got, want):
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        assert str(a.dtype) == str(b.dtype), (c, a.dtype, b.dtype)
        if a.dtype.kind == "f":
            assert np.array_equal(a.view(np.int64), b.view(np.int64)), c
        else:
            assert np.array_equal(a, b), c


@pytest.mark.parametrize("name", ["sequence_pack", "split_contamination",
                                  "pii_scrub"])
def test_curation_query_matches_oracle(ray_session, con, name):
    from covertile import api_text
    got = api_text.QUERIES[name](SF).to_pandas().reset_index(drop=True)
    want = con.execute(api_text.ORACLES[name]()).df()
    _assert_frames_equal(got, want)


def test_rolling_window_matches_oracle(ray_session, con):
    from covertile import api_events
    got = (api_events.QUERIES["rolling_window"](SF)
           .to_pandas().reset_index(drop=True))
    want = con.execute(api_events.ORACLES["rolling_window"]()).df()
    _assert_frames_equal(got, want)


def test_sequence_pack_is_a_prefix_scan(ray_session):
    """start_tok is the exclusive cumsum of n_tokens in doc_id order and
    sequences chain without gaps (the concat-and-chop contract)."""
    from covertile import api_text
    df = api_text.QUERIES["sequence_pack"](SF).to_pandas()
    n = df["n_tokens"].to_numpy()
    start = df["start_tok"].to_numpy()
    assert np.array_equal(start, np.concatenate(([0], np.cumsum(n)[:-1])))
    assert (df["first_seq"] <= df["last_seq"]).all()
    assert int(df["first_seq"].iloc[0]) == 0


def test_pii_scrub_redacts_synthetic_pii(ray_session):
    """Engine vs DuckDB on a corpus that actually CONTAINS emails and
    phone numbers (the sf tables have none, which makes the driver
    query a passthrough check only)."""
    import ray.data as rd
    from covertile.curation import pii_scrub, pii_scrub_sql

    tbl = pa.table({
        "doc_id": pa.array(np.arange(6), pa.int64()),
        "text": pa.array([
            "reach me at alice.smith+spam@example.co.uk today",
            "two mails a@b.io and c_d%e@f-g.org in one doc",
            "call 555-123-4567 or +1 800.555.0199 now",
            "email bob@corp.com then phone 212 555 7788",
            "nothing sensitive here at all",
            "a@b.io a@b.io a@b.io",
        ]),
    })
    got = pii_scrub(rd.from_arrow(tbl)).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.register("pii_docs", tbl)
    want = con.execute(pii_scrub_sql(table="pii_docs")).df()
    _assert_frames_equal(got, want)
    assert got["n_emails"].sum() >= 5
    assert got["n_phones"].sum() >= 2
    assert "[EMAIL]" in got["clean_text"][0]
    assert "@" not in " ".join(got["clean_text"])


def test_split_contamination_finds_planted_leak(ray_session):
    """A text duplicated across doc_ids that hash into different splits
    must surface every one of its shingles as multi-split."""
    import ray.data as rd
    from covertile import textops as T
    from covertile.curation import split_contamination

    # find two doc ids in different splits under the standard rule
    ids = np.arange(200, dtype=np.int64)
    bk = T._sample_bucket(ids)
    names = sorted(T.SPLIT_PCT)
    edges = np.cumsum([T.SPLIT_PCT[n] for n in names])
    sel = np.searchsorted(edges, bk, side="right")
    a = int(ids[sel == names.index("train") if False else sel == 1][0])
    b = int(ids[sel == 0][0])  # first 'test' doc
    assert sel[a] != sel[b]
    leak = "the exact same leaked passage of text"
    tbl = pa.table({
        "doc_id": pa.array([a, b], pa.int64()),
        "text": pa.array([leak, leak]),
    })
    out = split_contamination(rd.from_arrow(tbl)).to_pandas()
    n_shingles = len(leak) - T.SHINGLE_K + 1
    # every distinct shingle of the duplicated text is contaminated
    assert len(out) == len(set(
        leak[i:i + T.SHINGLE_K] for i in range(n_shingles)))
    assert (out[[c for c in out.columns if c != "sh"]].to_numpy()
            .astype(bool).sum(axis=1) >= 2).all()


def test_split_contamination_non_ascii_matches_oracle(ray_session):
    """Shingle windows are CHARACTER-based (UTF-8 codepoint boundaries),
    bitwise-equal to DuckDB's md5(substr(text, i, k)) on multibyte text —
    the round-3 byte-window implementation crashed (UnicodeEncodeError)
    and diverged from the char-based oracle here."""
    import ray.data as rd
    from covertile.curation import split_contamination, split_contamination_sql

    from covertile import textops as T

    leak = "héllo wörld — caffé 日本語テキスト naïve"
    # pick doc ids that land in three different splits
    cand = np.arange(200, dtype=np.int64)
    names = sorted(T.SPLIT_PCT)
    edges = np.cumsum([T.SPLIT_PCT[n] for n in names])
    sel = np.searchsorted(edges, T._sample_bucket(cand), side="right")
    ids = np.array([cand[sel == s][0] for s in range(len(names))]
                   + [cand[sel == 0][1], cand[sel == 1][1]], dtype=np.int64)
    texts = [leak, leak + " tail", "prefix " + leak, leak, "unrelated text"]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    got = split_contamination(rd.from_arrow(tbl)).to_pandas()
    c = duckdb.connect()
    c.register("documents", tbl)
    want = c.sql(split_contamination_sql()).df()
    _assert_frames_equal(got, want)
    assert len(got) > 0


def test_rolling_window_boundary_semantics(ray_session):
    """Ties on ts break by event_id; windows shorter than N at the
    start of a user's history; exact cents arithmetic."""
    import ray.data as rd
    from covertile.eventops import rolling_window, rolling_window_sql

    ts = np.array([0, 1, 1, 2, 5, 0, 3], dtype="datetime64[us]")
    tbl = pa.table({
        "event_id": pa.array([10, 11, 12, 13, 14, 20, 21], pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 2], pa.int64()),
        "value": pa.array([1.01, 2.02, 3.03, 4.04, 5.05, 7.0, 9.0]),
    })
    got = (rolling_window(rd.from_arrow(tbl), n=3)
           .to_pandas().reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", tbl)
    want = con.execute(rolling_window_sql(n=3)).df()
    _assert_frames_equal(got, want)
    assert got["n_window"].tolist() == [1, 2, 3, 3, 3, 1, 2]


def test_bm25_matches_oracle(ray_session, con):
    from covertile import api_text
    got = (api_text.QUERIES["bm25_topk"](SF)
           .to_pandas().reset_index(drop=True))
    want = con.execute(api_text.ORACLES["bm25_topk"]()).df()
    _assert_frames_equal(got, want)
    assert len(got) > 0 and got["rank"].tolist() == list(
        range(1, len(got) + 1))


def test_bm25_ln_parity_contract():
    """The bitwise oracle relies on math.log == DuckDB ln (both libm);
    pin it on the idf-shaped inputs so a platform change fails loudly
    here instead of as a mystery hash mismatch."""
    import math
    import struct
    c = duckdb.connect()
    for n, df in [(500, 17), (500, 1), (10**9, 12345), (3, 1)]:
        x = 1.0 + (n - df + 0.5) / (df + 0.5)
        d = c.execute("SELECT ln(?)", [x]).fetchone()[0]
        assert struct.pack("d", d) == struct.pack("d", math.log(x)), x


def test_bm25_ranking_semantics(ray_session):
    """A doc stuffed with a rare query term outranks docs with common
    terms; zero-match docs never appear."""
    import ray.data as rd
    from covertile.search import bm25_topk

    tbl = pa.table({
        "doc_id": pa.array(np.arange(5), pa.int64()),
        "text": pa.array([
            "needle needle needle hay",
            "hay hay hay hay hay hay",
            "needle hay hay hay",
            "hay barn field",
            "barn field tractor",
        ]),
    })
    out = bm25_topk(rd.from_arrow(tbl), terms=("needle",), k=3).to_pandas()
    assert out["doc_id"].tolist() == [0, 2]  # only matching docs, best first
    assert (out["score"] > 0).all()


def test_bm25_store_equals_in_memory(ray_session, tmp_path, con):
    """The physical postings store is byte-identical to the two-pass
    in-memory scorer (the ivf_topk_store ≡ ivf_topk equality pattern),
    and hence inherits its SQL oracle."""
    from covertile import api_text
    from covertile.search import bm25_build_store, bm25_topk, bm25_topk_store
    from covertile.sources import read_table

    docs = read_table(SF, "documents", ("doc_id", "text"))
    store = str(tmp_path / "bm25")
    bm25_build_store(docs, store)
    got = bm25_topk_store(store).to_pandas().reset_index(drop=True)
    want = bm25_topk(docs).to_pandas().reset_index(drop=True)
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # and matches the SQL oracle directly
    orc = con.execute(api_text.ORACLES["bm25_topk_store"]()).df()
    _assert_frames_equal(got, orc)


def test_bm25_store_duplicate_query_terms(ray_session, tmp_path):
    """A term appearing in several query slots must contribute once per
    slot in the store path too (index_in alone maps every occurrence to
    the first slot and drops the duplicates' scores)."""
    from covertile.search import bm25_build_store, bm25_topk, bm25_topk_store
    from covertile.sources import read_table

    docs = read_table(SF, "documents", ("doc_id", "text"))
    store = str(tmp_path / "bm25dup")
    bm25_build_store(docs, store)
    for terms in (("fast", "fast", "window"), ("hash", "fast", "hash")):
        got = bm25_topk_store(store, terms=terms).to_pandas() \
            .reset_index(drop=True)
        want = bm25_topk(read_table(SF, "documents", ("doc_id", "text")),
                         terms=terms).to_pandas().reset_index(drop=True)
        _assert_frames_equal(got, want)
        assert len(got) > 0


def test_bm25_store_partial_build_is_clobbered(ray_session, tmp_path):
    """A build interrupted between the postings write and stats.json
    (simulated by deleting stats.json) must NOT leave stale partition
    files for the rebuild to merge with: rebuilding into the same dir
    yields the same bytes as a clean store."""
    import os
    from covertile.search import bm25_build_store, bm25_topk_store
    from covertile.sources import read_table

    store = str(tmp_path / "bm25crash")
    bm25_build_store(read_table(SF, "documents", ("doc_id", "text")), store)
    clean = bm25_topk_store(store).to_pandas().reset_index(drop=True)
    os.remove(os.path.join(store, "stats.json"))  # simulate the crash
    bm25_build_store(read_table(SF, "documents", ("doc_id", "text")), store)
    rebuilt = bm25_topk_store(store).to_pandas().reset_index(drop=True)
    _assert_frames_equal(rebuilt, clean)
    assert len(rebuilt) > 0


def test_bm25_store_bucket_invariance(ray_session, tmp_path):
    """Bucket count affects layout/parallelism only, never results."""
    from covertile.search import bm25_build_store, bm25_topk_store
    from covertile.sources import read_table

    docs = read_table(SF, "documents", ("doc_id", "text"))
    outs = []
    for nb in (4, 32):
        store = str(tmp_path / f"bm25-{nb}")
        bm25_build_store(docs, store, nbuckets=nb)
        outs.append(bm25_topk_store(store).to_pandas()
                    .reset_index(drop=True))
    _assert_frames_equal(outs[0], outs[1])


def test_bm25_store_prunes_partitions(ray_session, tmp_path):
    """A query's file list covers ONLY its terms' hash buckets; results
    on a controlled corpus match semantics (zero-match docs never rank)."""
    import os

    import ray.data as rd
    from covertile.search import bm25_build_store, bm25_topk, bm25_topk_store

    tbl = pa.table({
        "doc_id": pa.array(np.arange(5), pa.int64()),
        "text": pa.array([
            "needle needle needle hay",
            "hay hay hay hay hay hay",
            "needle hay hay hay",
            "hay barn field",
            "barn field tractor",
        ]),
    })
    store = str(tmp_path / "bm25")
    bm25_build_store(rd.from_arrow(tbl), store, nbuckets=8)
    buckets = [d for d in os.listdir(store) if d.startswith("bucket=")]
    assert len(buckets) > 1  # vocabulary actually spread over partitions
    got = bm25_topk_store(store, terms=("needle",), k=3).to_pandas()
    want = bm25_topk(rd.from_arrow(tbl), terms=("needle",),
                     k=3).to_pandas()
    _assert_frames_equal(got.reset_index(drop=True),
                         want.reset_index(drop=True))
    assert got["doc_id"].tolist() == [0, 2]


def test_table_profile_matches_oracle(ray_session, con):
    from covertile import api_text
    got = (api_text.QUERIES["table_profile"](SF)
           .to_pandas().reset_index(drop=True))
    want = con.execute(api_text.ORACLES["table_profile"]()).df()
    _assert_frames_equal(got, want)


def test_table_profile_counts_nulls_and_distinct(ray_session):
    """Nulls are counted per column and excluded from distinct; float
    values key by bit pattern; duplicates collapse."""
    import ray.data as rd
    from covertile.curation import table_profile

    tbl = pa.table({
        "a": pa.array([1, 1, 2, None, None], pa.int64()),
        "b": pa.array([1.5, 1.5, None, 2.5, 0.0], pa.float64()),
        "c": pa.array(["x", "x", "y", None, "z"]),
    })
    out = (table_profile(rd.from_arrow(tbl).repartition(3),
                         columns=("a", "b", "c"))
           .to_pandas().set_index("column"))
    assert out.loc["a"].tolist() == [5, 2, 2]
    assert out.loc["b"].tolist() == [5, 1, 3]
    assert out.loc["c"].tolist() == [5, 1, 3]


def test_rolling_window_random_streams(ray_session):
    """Randomized: duplicate timestamps, singleton users, values with 2
    decimals — engine equals the SQL window oracle on every trial."""
    import ray.data as rd
    from covertile.eventops import rolling_window, rolling_window_sql

    rng = np.random.default_rng(23)
    for trial in range(3):
        n = int(rng.integers(50, 400))
        ts = rng.integers(0, 50, n).astype("datetime64[us]")
        tbl = pa.table({
            "event_id": pa.array(rng.permutation(n).astype(np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, 12, n).astype(np.int64)),
            "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
        })
        nwin = int(rng.integers(1, 6))
        got = (rolling_window(rd.from_arrow(tbl).repartition(4), n=nwin)
               .to_pandas().reset_index(drop=True))
        con = duckdb.connect()
        con.register("events", tbl)
        want = con.execute(rolling_window_sql(n=nwin)).df()
        _assert_frames_equal(got, want)


def test_sequence_pack_sparse_ids_and_chunk_boundaries(ray_session):
    """doc_ids that are sparse and straddle prefix-scan chunk boundaries
    still produce the exact global cumsum (vs a numpy oracle)."""
    import ray.data as rd
    from covertile.curation import sequence_pack

    rng = np.random.default_rng(31)
    ids = np.sort(rng.choice(100_000, 300, replace=False)).astype(np.int64)
    lens = rng.integers(0, 40, 300)
    texts = [" ".join(["w"] * int(m)) if m else "" for m in lens]
    tbl = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    out = (sequence_pack(rd.from_arrow(tbl).repartition(5),
                         seq_len=64, chunk=1000)
           .to_pandas().reset_index(drop=True))
    # whitespace-split token counts: '' -> 1 token (the SQL string_split
    # convention, matched by the engine tokenizer)
    ntok = np.array([max(1, m) if m else 1 for m in lens], np.int64)
    ntok = out["n_tokens"].to_numpy()  # engine/SQL convention is ground truth
    start = np.concatenate(([0], np.cumsum(ntok)[:-1]))
    assert np.array_equal(out["doc_id"].to_numpy(), ids)
    assert np.array_equal(out["start_tok"].to_numpy(), start)
    assert np.array_equal(out["first_seq"].to_numpy(), start // 64)


def test_dup_spans_matches_oracle(ray_session, con):
    from covertile import api_text
    got = api_text.QUERIES["dup_spans"](SF).to_pandas().reset_index(
        drop=True)
    want = con.execute(api_text.ORACLES["dup_spans"]()).df()
    _assert_frames_equal(got, want)
    assert (got["ndocs"] > 1).all()


def test_dup_spans_join_fallback_identical(ray_session):
    """The hash-join candidate path (broadcast_max=0) must produce the
    same bytes as the broadcast path — the token_rarity dual-path
    contract applied to dup_spans."""
    from covertile import curation
    from covertile.sources import read_table
    a = curation.dup_spans(
        read_table(SF, "documents", ("doc_id", "text"))).to_pandas()
    b = curation.dup_spans(
        read_table(SF, "documents", ("doc_id", "text")),
        broadcast_max=0).to_pandas()
    _assert_frames_equal(a, b)


def test_dup_spans_planted_duplicate(ray_session):
    """A window planted verbatim in two docs must be reported at both
    sites with ndocs=2; a unique doc must contribute no rows."""
    import ray.data as rd
    from covertile import curation
    shared = "x" * 64
    docs2 = rd.from_items([
        {"doc_id": 1, "text": shared + "A" * 10},
        {"doc_id": 2, "text": shared + "B" * 10},
        {"doc_id": 3, "text": "".join(chr(97 + i % 26) for i in
                                      range(200))},
    ])
    out2 = curation.dup_spans(docs2).to_pandas()
    hit = out2[out2["pos"] == 0]
    assert set(hit["doc_id"]) == {1, 2}
    assert (hit["ndocs"] == 2).all()
    assert 3 not in set(out2["doc_id"])


def test_doc_dup_ratio_matches_oracle(ray_session, con):
    from covertile import api_text
    got = api_text.QUERIES["doc_dup_ratio"](SF).to_pandas().reset_index(
        drop=True)
    want = con.execute(api_text.ORACLES["doc_dup_ratio"]()).df()
    _assert_frames_equal(got, want)
    assert (got["n_dup"] <= got["n_windows"]).all()


def test_doc_dup_ratio_join_fallback_identical(ray_session):
    from covertile import curation
    from covertile.sources import read_table
    a = curation.doc_dup_ratio(
        read_table(SF, "documents", ("doc_id", "text"))).to_pandas()
    b = curation.doc_dup_ratio(
        read_table(SF, "documents", ("doc_id", "text")),
        broadcast_max=0).to_pandas()
    _assert_frames_equal(a, b)


def test_doc_dup_ratio_planted(ray_session):
    """Two identical 64-char docs must have dup_ratio 1.0; a unique doc
    0.0; docs shorter than the window are absent."""
    import ray.data as rd
    from covertile import curation
    shared = "y" * 64
    docs = rd.from_items([
        {"doc_id": 1, "text": shared},
        {"doc_id": 2, "text": shared},
        {"doc_id": 3, "text": "".join(chr(97 + i % 26) for i in
                                      range(100))},
        {"doc_id": 4, "text": "short"},
    ])
    out = curation.doc_dup_ratio(docs).to_pandas().set_index("doc_id")
    assert out.loc[1, "dup_ratio"] == 1.0
    assert out.loc[2, "dup_ratio"] == 1.0
    assert out.loc[3, "dup_ratio"] == 0.0
    assert 4 not in out.index


def test_hll_profile_matches_oracle(ray_session, con):
    from covertile import api_text
    got = api_text.QUERIES["hll_profile"](SF).to_pandas().reset_index(
        drop=True)
    want = con.execute(api_text.ORACLES["hll_profile"]()).df()
    _assert_frames_equal(got, want)


def test_hll_profile_estimates_and_merge_order(ray_session, con):
    """The estimate must sit within HLL's error envelope of the exact
    distinct count (sigma = 1.04/sqrt(4096) ~ 1.6%; assert 10%), and the
    register merge must be block-order-independent (1 block vs many)."""
    from covertile import api_text, curation
    from covertile.sources import read_table
    got = api_text.QUERIES["hll_profile"](SF).to_pandas().set_index(
        "column")
    exact = api_text.QUERIES["table_profile"](SF).to_pandas().set_index(
        "column")
    for c in got.index:
        nd = int(exact.loc[c, "n_distinct"])
        est = float(got.loc[c, "hll_est"])
        assert abs(est - nd) <= max(0.10 * nd, 3.0), (c, est, nd)
    one = curation.hll_profile(
        read_table(SF, "documents",
                   curation.PROFILE_COLUMNS).repartition(1)).to_pandas()
    many = curation.hll_profile(
        read_table(SF, "documents",
                   curation.PROFILE_COLUMNS).repartition(37)).to_pandas()
    _assert_frames_equal(one, many)


def test_cms_topk_counts_matches_oracle(ray_session, con):
    from covertile import api_text
    got = api_text.QUERIES["cms_topk_counts"](SF).to_pandas(
        ).reset_index(drop=True)
    want = con.execute(api_text.ORACLES["cms_topk_counts"]()).df()
    _assert_frames_equal(got, want)
    # one-sided error: the CMS estimate never undercounts
    assert (got["cms_est"] >= got["n_exact"]).all()
    assert len(got) > 0


def test_cms_merge_is_block_order_independent(ray_session):
    from covertile import curation
    from covertile.sources import read_table
    a = curation.cms_topk_counts(
        read_table(SF, "documents", ("doc_id", "text"))
        .repartition(1)).to_pandas()
    b = curation.cms_topk_counts(
        read_table(SF, "documents", ("doc_id", "text"))
        .repartition(31)).to_pandas()
    _assert_frames_equal(a, b)
