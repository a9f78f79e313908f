"""Text-analysis + deduplication operators over the documents table.

Large-scale training-data-pipeline operators (brief: dedup, text analysis),
each a Dataset -> Dataset pipeline with a DuckDB-mirrorable contract:

* token/quality stats, language-ID heuristic, md5 fingerprint — pure
  per-batch maps (zero-copy Arrow in/out, pyarrow.compute kernels).
* exact dedup — md5 grouping with per-batch partial aggregation before the
  (tiny) groupby shuffle.
* n-gram Jaccard near-dup pairs — EXACT (no false negatives) via
  prefix-filtering [Chaudhuri et al., ICDE'06 / Xiao et al. PPJoin]: order
  each doc's shingle set by a global total order — (sampled document
  frequency ASC, shingle value), so prefix shingles are the rarest and
  inverted-index buckets stay small; any pair with J >= tau must share a
  shingle within each side's first |S| - ceil(tau*|S|) + 1 shingles, so
  only prefix shingles are exploded into the inverted-index shuffle.
  Candidates are verified with exact set intersection (vectorized, no
  per-pair Python loop).  Shingle ids are the k bytes packed big-endian
  into a uint64 (injective for k <= 8, see shingle_batch); the SQL oracle
  hashes the same shingles with md5 — any injective id scheme yields the
  identical (a_id, b_id, jacc) rows.
* MinHash+LSH near-dup pairs — banded signatures (64 perms, 16 bands x 4
  rows), candidates verified with the same exact-Jaccard verifier;
  approximate recall (no SQL oracle; recall asserted in tests).
* SimHash near-dup pairs — 64-bit token-multiset simhash; pairs within
  hamming distance h=3 found EXACTLY via the 4-block pigeonhole (a pair
  differing in <= 3 bits must agree on one of 4 disjoint 16-bit blocks).
* corpus top-k terms — per-block vocab partials, one vocab-sized groupby.
* deterministic sampling — hash-bucket Bernoulli + per-language stratified
  rates; pure per-batch filters, reproducible under task re-execution.
* composite curation filter — quality gate + lang gate + exact-dedup
  keep-first fused into one pass with a single tiny shuffle.

Token hashes are the first 8 bytes of md5 (big-endian) so DuckDB can mirror
them: CAST(concat('0x', substr(md5(t), 1, 16)) AS UBIGINT).  All float
outputs are exact integer ratios (int/int in float64), bitwise equal
between numpy and DuckDB.

Scale notes: every shuffle key is declared; inverted-index bucket skew is
bounded by df-ascending prefixes (sampled-df order, broadcast via
ray.put — see _sampled_df).  Nothing materializes the corpus on the
driver; only small derived tables (candidate pairs, sampled df, candidate
shingle sets) are collected or broadcast.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .joins import mat

STOPWORDS = ("the", "a", "of", "to", "in", "is", "and")
SHINGLE_K = 8
JACCARD_TAU = 0.5
SIMHASH_HAM = 3     # exact with 4 blocks (pigeonhole: 3 < 4)
SIMHASH_BLOCKS = 4
MINHASH_PERMS = 64
MINHASH_BANDS = 16  # rows per band = 4
_PAIR_SHIFT = np.int64(1) << np.int64(32)  # doc ids < 2^31


# --------------------------------------------------------------- primitives

_MD5_CACHE: dict[str, int] = {}
_MD5_CACHE_MAX = 1 << 21  # per-worker cap (~2M terms, few hundred MB);
# when full, new terms are hashed WITHOUT caching instead of clearing:
# a wholesale clear() would evict the hot shared vocabulary exactly when
# the corpus vocab sits above the cap and re-pay the fill every batch


def md5_u64(strings) -> np.ndarray:
    """uint64 = first 8 big-endian bytes of md5.  Accepts a pyarrow
    string array (preferred — zero conversion) or a numpy object array.
    Dedup runs as Arrow dictionary_encode (C++ hash, no object-array
    sort); md5 itself runs only on the in-batch vocabulary, and a
    per-worker-process cache skips re-hashing vocab shared across
    batches.  md5 is kept (vs a numpy hash) so oracle SQL can mirror the
    column exactly (md5_u64_sql)."""
    if not isinstance(strings, (pa.Array, pa.ChunkedArray)):
        strings = pa.array(np.asarray(strings, dtype=object), pa.string())
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    d = strings.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    cache = _MD5_CACHE
    insert = len(cache) < _MD5_CACHE_MAX
    h = np.empty(len(uniq), np.uint64)
    for i, s in enumerate(uniq):
        v = cache.get(s)
        if v is None:
            v = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
            if insert:
                cache[s] = v
        h[i] = v
    return h[d.indices.to_numpy()] if len(uniq) else np.zeros(0, np.uint64)


def md5_u64_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 16)) AS UBIGINT)"


def _text_col(batch: pa.Table, col: str = "text") -> pa.Array:
    c = batch[col]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _token_lists(text: pa.Array) -> pa.ListArray:
    """Single-space split (documents are single-spaced; mirrored by DuckDB
    string_split(text, ' '))."""
    return pc.split_pattern(text, " ")


def _segment_offsets(lens: np.ndarray) -> np.ndarray:
    off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    return off


def _segment_sum(values: np.ndarray, off: np.ndarray) -> np.ndarray:
    cs = np.concatenate(([0], np.cumsum(values)))
    return cs[off[1:]] - cs[off[:-1]]


# ----------------------------------------------------- token/quality stats

def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_uniq_tokens, n_stopwords, stopword_ratio,
    avg_token_len) — fully vectorized."""
    toks = _token_lists(_text_col(batch))
    lens = np.asarray(pc.list_value_length(toks), np.int64)
    off = _segment_offsets(lens)
    flat = toks.flatten()
    tlen = np.asarray(pc.utf8_length(flat), np.int64)
    stop = np.asarray(pc.is_in(flat, value_set=pa.array(STOPWORDS)))
    n_stop = _segment_sum(stop.astype(np.int64), off)
    sum_len = _segment_sum(tlen, off)
    # unique tokens per doc: sort (doc, hash) pairs, count boundaries
    th = md5_u64(flat)
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    order = np.lexsort((th, doc_of))
    d_s, h_s = doc_of[order], th[order]
    new = np.concatenate(([True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])))
    n_uniq = np.bincount(d_s[new], minlength=len(lens))
    nt = lens.astype(np.float64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": lens,
        "n_uniq_tokens": n_uniq.astype(np.int64),
        "n_stopwords": n_stop,
        "stopword_ratio": n_stop.astype(np.float64) / nt,
        "avg_token_len": sum_len.astype(np.float64) / nt,
    })


def token_stats_sql() -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
       len(list_filter(string_split(text, ' '), t -> t IN ({stop}))) AS n_stopwords,
       CAST(len(list_filter(string_split(text, ' '), t -> t IN ({stop}))) AS DOUBLE)
         / len(string_split(text, ' ')) AS stopword_ratio,
       CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
         / len(string_split(text, ' ')) AS avg_token_len
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------------- repetition stats

def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style per-doc repetition signals: (doc_id, n_tokens,
    top_token_n, top_token_ratio, dup_bigram_ratio).  top_token_n is the
    multiplicity of the most frequent token; dup_bigram_ratio is
    1 - distinct_bigrams/(n_tokens-1), NULL-as-NaN when the doc has fewer
    than 2 tokens.  Boilerplate / degenerate-repetition filters threshold
    on these two ratios.

    Fully vectorized: token identity via md5_u64 (same 64-bit-collision
    proxy token_stats' n_uniq_tokens ships with, driver-green), run
    lengths off ONE lexsort per signal; bigram identity is the
    (hash_i, hash_i+1) pair, a bijection with the string bigram because
    single-space split tokens cannot contain spaces.  Float ratios are
    single IEEE divisions in the same operand order as the SQL mirror,
    hence bitwise."""
    toks = _token_lists(_text_col(batch))
    lens = np.asarray(pc.list_value_length(toks), np.int64)
    ndoc = len(lens)
    th = md5_u64(toks.flatten())
    doc_of = np.repeat(np.arange(ndoc, dtype=np.int64), lens)
    top_n = np.zeros(ndoc, np.int64)
    if len(doc_of):
        order = np.lexsort((th, doc_of))
        d_s, h_s = doc_of[order], th[order]
        new = np.concatenate(
            ([True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])))
        starts = np.flatnonzero(new)
        run_len = np.diff(np.append(starts, len(d_s)))
        np.maximum.at(top_n, d_s[starts], run_len)
    # distinct bigrams: consecutive positions that stay inside one doc
    bi = np.flatnonzero(doc_of[:-1] == doc_of[1:]) if ndoc else \
        np.zeros(0, np.int64)
    uniq_bg = np.zeros(ndoc, np.int64)
    if len(bi):
        bd, a, b = doc_of[bi], th[bi], th[bi + 1]
        order = np.lexsort((b, a, bd))
        bd_s, a_s, b_s = bd[order], a[order], b[order]
        new = np.concatenate(
            ([True], (bd_s[1:] != bd_s[:-1]) | (a_s[1:] != a_s[:-1])
             | (b_s[1:] != b_s[:-1])))
        uniq_bg = np.bincount(bd_s[new], minlength=ndoc).astype(np.int64)
    n_bg = lens - 1  # lens >= 1 always: split('') == ['']
    safe = np.where(n_bg > 0, n_bg, 1)
    dup_bg = np.where(n_bg > 0,
                      1.0 - uniq_bg.astype(np.float64) / safe, np.nan)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": lens,
        "top_token_n": top_n,
        "top_token_ratio": top_n.astype(np.float64) / lens,
        # real Arrow NULL (validity mask), not a valid NaN: the oracle's
        # CASE ... ELSE NULL is SQL NULL, and a null-aware compare must
        # see the same; pandas conversion still yields NaN so float
        # compares with equal_nan are unchanged
        "dup_bigram_ratio": pa.array(dup_bg, pa.float64(),
                                     mask=(n_bg <= 0)),
    })


def repetition_stats_sql() -> str:
    return """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
tt AS (SELECT doc_id, MAX(c) AS top_n FROM (
         SELECT doc_id, COUNT(*) AS c
         FROM (SELECT doc_id, unnest(l) AS tok FROM base)
         GROUP BY doc_id, tok) GROUP BY doc_id),
bg AS (SELECT doc_id, len(l) AS nt,
              len(list_distinct(list_transform(
                  range(1, len(l)), i -> l[i] || ' ' || l[i + 1]))) AS ubg
       FROM base)
SELECT bg.doc_id,
       CAST(nt AS BIGINT) AS n_tokens,
       CAST(tt.top_n AS BIGINT) AS top_token_n,
       CAST(tt.top_n AS DOUBLE) / CAST(nt AS DOUBLE) AS top_token_ratio,
       CASE WHEN nt >= 2
            THEN 1.0 - CAST(ubg AS DOUBLE) / CAST(nt - 1 AS DOUBLE)
            ELSE NULL END AS dup_bigram_ratio
FROM bg JOIN tt USING (doc_id) ORDER BY doc_id
"""


# ------------------------------------------------------------- language id

_LANG_MARKERS = [  # first match wins (mirrored CASE order)
    ("de", (" der ", " und ", " das ")),
    ("es", (" el ", " los ", " una ")),
    ("fr", (" le ", " les ", " une ")),
]


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Marker-word language heuristic (doc_id, lang_pred).  The synthetic
    corpus shares one vocabulary across its lang labels, so this is an
    operator-semantics contract (mirrored CASE expression), not a
    classifier benchmark."""
    text = _text_col(batch)
    padded = pc.binary_join_element_wise(" ", text, " ", "")
    n = len(text)
    pred = np.full(n, "en", dtype=object)
    decided = np.zeros(n, bool)
    for lang, markers in _LANG_MARKERS:
        hit = np.zeros(n, bool)
        for mk in markers:
            hit |= np.asarray(pc.match_substring(padded, mk))
        pred[~decided & hit] = lang
        decided |= hit
    return pa.table({"doc_id": batch["doc_id"],
                     "lang_pred": pa.array(pred, pa.string())})


def lang_id_sql() -> str:
    def cond(markers):
        return " OR ".join(
            f"contains(concat(' ', text, ' '), '{m}')" for m in markers)
    cases = "\n       ".join(
        f"WHEN {cond(mks)} THEN '{lang}'" for lang, mks in _LANG_MARKERS)
    return f"""
SELECT doc_id,
       CASE {cases}
       ELSE 'en' END AS lang_pred
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------------------- fingerprint

def fingerprint_batch(batch: pa.Table) -> pa.Table:
    text = _text_col(batch)
    fp = [hashlib.md5(s.encode()).hexdigest() for s in
          text.to_pylist()]
    return pa.table({"doc_id": batch["doc_id"],
                     "fingerprint": pa.array(fp, pa.string())})


def fingerprint_sql() -> str:
    return "SELECT doc_id, md5(text) AS fingerprint FROM documents ORDER BY doc_id"


# ------------------------------------------------------------- exact dedup

def exact_dedup(docs_ds):
    """Exact duplicate groups by md5(text): (fingerprint, keep_id, n_dups).
    Per-batch partial (min doc_id, count) before the groupby shuffle, so
    the exchange carries one row per distinct fingerprint per block."""
    def partial(batch: pa.Table) -> pa.Table:
        text = _text_col(batch)
        fp = np.array([hashlib.md5(s.encode()).hexdigest()
                       for s in text.to_pylist()], dtype=object)
        ids = batch["doc_id"].to_numpy()
        uniq, inv = np.unique(fp, return_inverse=True)
        mn = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, ids)
        cnt = np.bincount(inv)
        return pa.table({"fingerprint": pa.array(uniq, pa.string()),
                         "keep_id": mn, "n_dups": cnt.astype(np.int64)})

    from ray.data.aggregate import Min, Sum

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"fingerprint": batch["fingerprint"],
                         "keep_id": batch["min(keep_id)"],
                         "n_dups": batch["sum(n_dups)"]})

    # native Arrow aggregate: no per-group Python UDF (one distinct
    # fingerprint per doc in the common case — map_groups would pay ~1ms
    # of Python per group)
    return (mat(docs_ds.map_batches(partial, batch_format="pyarrow"))
            .groupby("fingerprint").aggregate(Min("keep_id"), Sum("n_dups"))
            .map_batches(rename, batch_format="pyarrow"))


def exact_dedup_sql() -> str:
    return """
SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id,
       count(*) AS n_dups
FROM documents GROUP BY fingerprint ORDER BY fingerprint
"""


# ------------------------------------------------- keep-best exact dedup

#: doc_id packing base for the keep-best composite key.  keep-best wants
#: (max n_chars, then min doc_id) per duplicate group — a lexicographic
#: argmax that Ray's native aggregates can't express directly, but
#: composite = n_chars * _KB_BASE - doc_id orders exactly that way, so a
#: plain Max() does it with no per-group Python.  Exact while
#: 0 <= doc_id < 2^40 (~1.1e12 docs — above a 100 TB corpus at ~100 B/doc)
#: and 0 <= n_chars < 2^22 (4 MiB of text); both are asserted per batch.
_KB_BASE = 1 << 40
_KB_NC_MAX = 1 << 22


def dedup_keep_best(docs_ds):
    """Duplicate groups keyed on NORMALIZED text (lowercase, whitespace
    collapsed, trimmed — normalize_batch's canonical form, so noisy
    near-identical copies land in one group) keeping the BEST copy, not
    the first: (fingerprint, keep_id, keep_n_chars, n_dups) where
    keep_id is the group's doc with the largest RAW n_chars (quality
    proxy — the least-mangled copy), ties to the smallest doc_id.  Same
    scale shape as exact_dedup — per-batch partial before the groupby,
    so the exchange carries one row per distinct fingerprint per block —
    with the lexicographic argmax packed into a single int64 so the
    shuffle stays a native Max/Sum aggregate."""
    def partial(batch: pa.Table) -> pa.Table:
        norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            pc.utf8_lower(_text_col(batch)), r"\s+", " "))
        fp = np.array([hashlib.md5(s.encode()).hexdigest()
                       for s in norm.to_pylist()], dtype=object)
        ids = batch["doc_id"].to_numpy()
        nc = batch["n_chars"].to_numpy().astype(np.int64)
        if len(ids):
            if ids.min() < 0 or ids.max() >= _KB_BASE:
                raise ValueError("dedup_keep_best: doc_id outside "
                                 f"[0, 2^40) packable range")
            if nc.min() < 0 or nc.max() >= _KB_NC_MAX:
                raise ValueError("dedup_keep_best: n_chars outside "
                                 f"[0, 2^22) packable range")
        comp = nc * _KB_BASE - ids.astype(np.int64)
        uniq, inv = np.unique(fp, return_inverse=True)
        best = np.full(len(uniq), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(best, inv, comp)
        cnt = np.bincount(inv)
        return pa.table({"fingerprint": pa.array(uniq, pa.string()),
                         "best": best, "n_dups": cnt.astype(np.int64)})

    from ray.data.aggregate import Max, Sum

    def finish(batch: pa.Table) -> pa.Table:
        comp = batch["max(best)"].to_numpy()
        # ceil-division decode, exact for doc_id = 0 and n_chars = 0 too
        nc = -((-comp) // _KB_BASE)
        keep = nc * _KB_BASE - comp
        return pa.table({"fingerprint": batch["fingerprint"],
                         "keep_id": keep, "keep_n_chars": nc,
                         "n_dups": batch["sum(n_dups)"]})

    return (mat(docs_ds.map_batches(partial, batch_format="pyarrow"))
            .groupby("fingerprint").aggregate(Max("best"), Sum("n_dups"))
            .map_batches(finish, batch_format="pyarrow"))


def dedup_keep_best_sql() -> str:
    return r"""
SELECT fingerprint, keep_id, keep_n_chars, n_dups FROM (
  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
             AS fingerprint,
         doc_id AS keep_id, n_chars AS keep_n_chars,
         row_number() OVER (
             PARTITION BY md5(trim(regexp_replace(lower(text), '\s+',
                                                  ' ', 'g')))
             ORDER BY n_chars DESC, doc_id) AS rn,
         count(*) OVER (
             PARTITION BY md5(trim(regexp_replace(lower(text), '\s+',
                                                  ' ', 'g')))) AS n_dups
  FROM documents) WHERE rn = 1 ORDER BY fingerprint
"""


# --------------------------------------------- cross-source overlap audit

#: opening-token window for the cross-source boilerplate fingerprint
OVERLAP_PREFIX_K = 8


def cross_source_overlap(docs_ds, k: int = OVERLAP_PREFIX_K):
    """Shared-boilerplate audit ACROSS sources: fingerprint each doc by
    its opening k tokens (md5 of the first-k-token join — the shared
    header/template signal crawl snapshots carry) and report every
    fingerprint present in MORE THAN ONE distinct source as
    (fingerprint, n_sources, n_docs) — how much of source A's boilerplate
    is literally inside source B before you weight a mixture.

    Distributed grouped count-distinct with NO per-group Python: stage 1
    dedupes (fingerprint, source) per block and sums doc counts under a
    native groupby on the pair; stage 2 counts the now-unique pair rows
    per fingerprint with a second native groupby.  Both exchanges carry
    at most one row per distinct (fingerprint, source) pair per block —
    bounded by the duplicate structure, never the corpus size."""
    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"fingerprint": pa.array([], pa.string()),
                             "source": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        toks = _token_lists(_text_col(batch))
        prefix = pc.binary_join(pc.list_slice(toks, 0, k), " ")
        fp = np.array([hashlib.md5(s.encode()).hexdigest()
                       for s in prefix.to_pylist()], dtype=object)
        src = np.asarray(_text_col(batch, "source"), dtype=object)
        ufp, ifp = np.unique(fp, return_inverse=True)
        usrc, isrc = np.unique(src, return_inverse=True)
        pair = ifp.astype(np.int64) * len(usrc) + isrc
        upair, inv = np.unique(pair, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({
            "fingerprint": pa.array(ufp[upair // len(usrc)], pa.string()),
            "source": pa.array(usrc[upair % len(usrc)], pa.string()),
            "n": cnt})

    from ray.data.aggregate import Sum

    def pair_done(batch: pa.Table) -> pa.Table:
        return pa.table({"fingerprint": batch["fingerprint"],
                         "one": pa.array(np.ones(len(batch), np.int64)),
                         "n": batch["sum(n)"]})

    def finish(batch: pa.Table) -> pa.Table:
        ns = batch["sum(one)"].to_numpy()
        nd = batch["sum(n)"].to_numpy()
        keep = ns > 1
        return pa.table({
            "fingerprint": pc.filter(batch["fingerprint"],
                                     pa.array(keep)),
            "n_sources": pa.array(ns[keep]),
            "n_docs": pa.array(nd[keep])})

    pairs = mat(docs_ds.map_batches(partial, batch_format="pyarrow")) \
        .groupby(["fingerprint", "source"]).aggregate(Sum("n")) \
        .map_batches(pair_done, batch_format="pyarrow")
    return (mat(pairs)
            .groupby("fingerprint").aggregate(Sum("one"), Sum("n"))
            .map_batches(finish, batch_format="pyarrow"))


def cross_source_overlap_sql(k: int = OVERLAP_PREFIX_K) -> str:
    return f"""
SELECT md5(array_to_string(list_slice(string_split(text, ' '), 1, {k}),
           ' ')) AS fingerprint,
       count(DISTINCT source) AS n_sources,
       count(*) AS n_docs
FROM documents GROUP BY fingerprint
HAVING count(DISTINCT source) > 1 ORDER BY fingerprint
"""


# -------------------------------------------------------- shingles (hashed)

def _shingle_flat(batch: pa.Table, k: int):
    """Vectorized shingle core: (doc_ids, per-doc distinct-shingle
    counts, flat per-doc-sorted uint64 hashes) — segment layout, no
    Python list of per-doc arrays (np.split + re-concatenate measured
    ~80% of the shingle pass at 200k docs)."""
    text = _text_col(batch)
    ids = batch["doc_id"].to_numpy()
    if len(ids) == 0:
        return ids, np.zeros(0, np.int64), np.zeros(0, np.uint64)
    ta = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    if not pa.types.is_large_string(ta.type):
        ta = ta.cast(pa.large_string())
    off = np.frombuffer(ta.buffers()[1], np.int64)[
        ta.offset: ta.offset + len(ta) + 1]
    data = np.frombuffer(ta.buffers()[2], np.uint8)
    blen = np.diff(off)
    n_sh = np.maximum(0, blen - k + 1)
    tot = int(n_sh.sum())
    if tot == 0:
        return ids, np.zeros(len(ids), np.int64), np.zeros(0, np.uint64)
    rows = np.repeat(np.arange(len(ids)), n_sh)
    excl = np.concatenate(([0], np.cumsum(n_sh)[:-1]))
    starts = (np.repeat(off[:-1], n_sh)
              + (np.arange(tot) - np.repeat(excl, n_sh)))
    h = np.zeros(tot, np.uint64)
    mult = np.uint64(256) if k <= 8 else np.uint64(0x100000001B3)
    for j in range(k):
        h = h * mult + data[starts + j]
    order = np.lexsort((h, rows))
    rs, hs = rows[order], h[order]
    keep = np.empty(tot, bool)
    keep[0] = True
    keep[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
    rs, hs = rs[keep], hs[keep]
    counts = np.bincount(rs, minlength=len(ids)).astype(np.int64)
    return ids, counts, hs


def shingle_batch(batch: pa.Table, k: int = SHINGLE_K):
    """Per doc: sorted uint64 ids of the DISTINCT k-byte shingles.

    Fully vectorized over the batch's flat UTF-8 buffer: the shingle id is
    the k bytes packed big-endian into a uint64 — INJECTIVE for k <= 8
    (the default), so Jaccard set sizes/intersections (and hence the jacc
    values checked bitwise against the md5-based SQL oracle) are identical
    for ASCII text, where byte k-grams == the oracle's char k-grams.  For
    k > 8 the pack degrades to an FNV-style rolling hash (collisions
    astronomically unlikely but possible).  Returns (doc_ids,
    list-of-arrays); hot paths use _shingle_flat's segment layout
    directly."""
    ids, counts, hs = _shingle_flat(batch, k)
    if len(ids) == 0:
        return ids, []
    return ids, np.split(hs, np.cumsum(counts)[:-1])


def shingle_sql_expr(k: int = SHINGLE_K) -> str:
    """DuckDB list of the same uint64 shingle hashes (distinct)."""
    sub = f"substr(text, CAST(i AS INT), {k})"
    return (f"list_distinct(list_transform(range(1, length(text)-{k}+2), "
            f"i -> {md5_u64_sql(sub)}))")


def _shingle_table(batch: pa.Table, k: int) -> pa.Table:
    ids, lens, flat = _shingle_flat(batch, k)
    off = _segment_offsets(lens)
    arr = pa.LargeListArray.from_arrays(off, pa.array(flat, pa.uint64()))
    return pa.table({"doc_id": ids, "n_sh": lens, "shingles": arr})


def _prefix_len(n: np.ndarray, tau: float) -> np.ndarray:
    """Prefix-filter length |S| - ceil(tau*|S|) + 1 (>= 1 for n >= 1)."""
    return np.maximum(1, n - np.ceil(tau * n).astype(np.int64) + 1)


# --------------------------------------------- candidate pairs -> verified

VERIFY_BROADCAST_MAX = 64_000_000  # hashes (512MB); past this, hash join
CAND_ID_COLLECT_MAX = 16_000_000  # ids (128MB driver); past this, the
# candidate-doc semi-join runs as a hash shuffle instead of a driver
# np.unique + ray.put broadcast (_verify_jaccard)


def _jacc_core(la: np.ndarray, lb: np.ndarray,
               flat_a: np.ndarray, flat_b: np.ndarray) -> np.ndarray:
    """Per-pair exact Jaccard from concatenated per-row set segments.
    Hashes within a row-set are unique, so a (row, hash) key appearing on
    both sides marks one intersection element; one lexsort over the whole
    batch — no per-pair Python loop."""
    row = np.concatenate([np.repeat(np.arange(len(la)), la),
                          np.repeat(np.arange(len(lb)), lb)])
    h = np.concatenate([flat_a, flat_b])
    order = np.lexsort((h, row))
    row_s, h_s = row[order], h[order]
    dup = (row_s[1:] == row_s[:-1]) & (h_s[1:] == h_s[:-1])
    inter = np.bincount(row_s[1:][dup], minlength=len(la))
    union = la + lb - inter
    with np.errstate(invalid="ignore"):
        return inter.astype(np.float64) / union.astype(np.float64)

#
# Buckets (inverted-index shingle / LSH band / simhash block keys) are tiny
# and numerous — one map_groups UDF call per bucket costs ~1ms of Python and
# dominated wall time (measured 220s/20k docs).  Instead we group by a COARSE
# 256-way hash of the bucket key (equal keys stay together) and emit every
# intra-run pair for ALL runs in the coarse group with one vectorized pass.

_COARSE_MIX = np.uint64(0x9E3779B97F4A7C15)


def _coarse_bucket(v: np.ndarray, nbits: int = 8) -> np.ndarray:
    return ((v.astype(np.uint64) * _COARSE_MIX)
            >> np.uint64(64 - nbits)).astype(np.int64)


def _run_pairs(keys: np.ndarray, ids: np.ndarray):
    """Sort rows by (key, id), drop duplicate (key, id) rows, and return
    (id_s, sel, a_idx, b_idx): the kept rows' ids, their indices into the
    input arrays, and all index pairs a_idx < b_idx lying within a run of
    equal key.  No per-run Python; ids within a run are ascending, so
    id_s[a_idx] < id_s[b_idx] always."""
    empty = np.zeros(0, np.int64)
    n = len(keys)
    if n < 2:
        return ids, np.arange(n, dtype=np.int64), empty, empty
    order = np.lexsort((ids, keys))
    k_s, id_s = keys[order], ids[order]
    first = np.empty(n, bool)
    first[0] = True
    first[1:] = k_s[1:] != k_s[:-1]
    keep = first.copy()
    keep[1:] |= id_s[1:] != id_s[:-1]
    k_s, id_s, first, order = k_s[keep], id_s[keep], first[keep], order[keep]
    n = len(k_s)
    run_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
    pos = np.arange(n) - run_start
    total = int(pos.sum())
    if total == 0:
        return id_s, order, empty, empty
    b_idx = np.repeat(np.arange(n), pos)
    excl = np.concatenate(([0], np.cumsum(pos)[:-1]))
    a_idx = (np.repeat(run_start, pos)
             + (np.arange(total) - np.repeat(excl, pos)))
    return id_s, order, a_idx, b_idx


def _candidate_pairs(rows_ds, tau: float | None = None):
    """rows (sh:int64 bucket key, doc_id[, pos, n_sh]) -> DISTINCT
    candidate pairs (pair:int64).  Two coarse groupbys (256 groups each):
    one to emit intra-bucket pairs, one to dedup pairs discovered in
    different buckets.

    With tau and (pos, n_sh) present, the PPJoin POSITIONAL filter [Xiao
    et al.] drops an occurrence-pair before it ever reaches the verify
    stage: a shared shingle at prefix positions (i, j) of sets sized
    (na, nb) bounds the overlap by 1 + min(na−i−1, nb−j−1), and J ≥ τ
    needs overlap ≥ τ/(1+τ)·(na+nb).  A pair survives iff ANY shared
    occurrence passes — a superset of classic PPJoin, so still exact;
    the ceil boundary is relaxed by 1e-9 so float roundoff can only keep
    extra candidates, never drop a true pair.  Measured on the 5k-doc
    adversarial corpus: 910k → 748k candidates (1.2× — its low-entropy
    shingles blunt positional bounds; the filter prunes far harder on
    natural text, and MinHash+LSH remains the documented scale path
    there)."""
    positional = tau is not None

    def bucket(batch: pa.Table) -> pa.Table:
        sh = batch["sh"].to_numpy()
        out = {"sh": sh, "doc_id": batch["doc_id"],
               "bk": _coarse_bucket(sh)}
        if positional:
            out["pos"] = batch["pos"]
            out["n_sh"] = batch["n_sh"]
        return pa.table(out)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        id_s, sel, ai, bi = _run_pairs(g["sh"].to_numpy(),
                                       g["doc_id"].to_numpy())
        if len(ai) and positional:
            pos_s = g["pos"].to_numpy()[sel]
            n_s = g["n_sh"].to_numpy()[sel]
            na, nb = n_s[ai], n_s[bi]
            ub = 1 + np.minimum(na - pos_s[ai] - 1, nb - pos_s[bi] - 1)
            alpha = np.ceil(tau / (1.0 + tau) * (na + nb) - 1e-9)
            keep = ub >= alpha
            ai, bi = ai[keep], bi[keep]
        pair = (np.unique(id_s[ai] * _PAIR_SHIFT + id_s[bi])
                if len(ai) else np.zeros(0, np.int64))
        return pa.table({"pair": pa.array(pair, pa.int64())})

    # mat(): the lazy shingle/signature scan would re-execute per
    # exchange (28.6s fused vs 5.4s materialized for MinHash at 200k
    # docs); the bucketed table is id-sized (bands x docs), never
    # corpus-sized.
    cand = mat(rows_ds.map_batches(bucket, batch_format="pyarrow")) \
        .groupby("bk").map_groups(bucket_pairs, batch_format="pyarrow")

    def pbucket(batch: pa.Table) -> pa.Table:
        p = batch["pair"].to_numpy()
        return pa.table({"pair": p, "bk": _coarse_bucket(p)})

    def uniq(g: pa.Table) -> pa.Table:
        return pa.table({"pair": pa.array(np.unique(g["pair"].to_numpy()),
                                          pa.int64())})

    # Same rule for the (pair-sized) dedup exchange.
    return (mat(cand.map_batches(pbucket, batch_format="pyarrow"))
            .groupby("bk").map_groups(uniq, batch_format="pyarrow"))


def _verify_jaccard(pairs_ds, docs_ds, tau: float, k: int):
    """pairs (pair) x docs -> exact Jaccard rows (a_id, b_id, jacc) with
    J >= tau.  Intersection sizes are computed for a whole batch at once by
    sorting the concatenated (pair_row, hash) keys — no per-pair Python
    loop.

    Semi-join pruning: the candidate pair list is small by construction
    (LSH buckets / prefix filter already ran).  Its distinct doc ids are
    the semi-join key against docs; shingle sets for the verify are then
    RE-DERIVED from that filtered docs scan — only candidate docs are
    shingled.  This keeps the whole pipeline at ONE full-corpus shingle
    pass (fused into the candidate-generation scan); Ray Data cannot
    share a lazy subplan across consumers, so handing the full sets
    dataset to the join would re-shingle the corpus once per side.

    The semi-join itself has two executions, switched on the pair count
    (known for free — pairs are already materialized):
    * driver collect (default, 2*n_pairs <= CAND_ID_COLLECT_MAX ids):
      distinct ids are np.unique'd on the driver and ray.put once; the
      docs scan filters with np.isin.  Zero extra shuffles.
    * hash-shuffle semi-join (past the cap): distinct ids are computed
      with a coarse-bucket groupby and the docs side is inner-joined
      against them (joins.hash_join_int_key, ids unique ⇒ a semi-join).
      Under pathological duplication (everything is a candidate) the
      driver never holds the id set — only tasks do, bucket-sized.

    Two verify executions:
    * broadcast (default): candidate sets up to VERIFY_BROADCAST_MAX
      total hashes are collected into one (ids, offsets, flat) bundle and
      ray.put once — plasma shares it zero-copy per node — and pairs are
      verified in map_batches with NO join.  The join path attaches a
      full set COPY to every pair row, so a doc in p pairs ships p copies
      (measured 345s for 815k pairs / 5k docs vs seconds broadcast).
    * bucketed hash join (fallback past the cap): shuffles candidate
      sets instead of replicating them per pair."""
    import ray as _ray

    from .joins import hash_join_int_key

    def split_pair(batch: pa.Table) -> pa.Table:
        p = batch["pair"].to_numpy()
        return pa.table({"a_id": p // _PAIR_SHIFT, "b_id": p % _PAIR_SHIFT})

    pairs = pairs_ds.map_batches(
        split_pair, batch_format="pyarrow").materialize()

    if 2 * pairs.count() <= CAND_ID_COLLECT_MAX:
        cand_ids = np.unique(np.concatenate(
            [np.concatenate([b["a_id"].to_numpy(), b["b_id"].to_numpy()])
             for b in pairs.iter_batches(batch_size=None,
                                         batch_format="pyarrow")]
            or [np.zeros(0, np.int64)]))
        ids_ref = _ray.put(cand_ids)

        def cand_sets_fn(batch: pa.Table) -> pa.Table:
            m = np.isin(batch["doc_id"].to_numpy(), _ray.get(ids_ref))
            return _shingle_table(batch.filter(pa.array(m)), k)

        cand_sets = docs_ds.map_batches(
            cand_sets_fn, batch_format="pyarrow").materialize()
    else:
        def explode_ids(batch: pa.Table) -> pa.Table:
            ids = np.unique(np.concatenate(
                [batch["a_id"].to_numpy(), batch["b_id"].to_numpy()]))
            return pa.table({"doc_id": ids, "bk": _coarse_bucket(ids)})

        def uniq_ids(g: pa.Table) -> pa.Table:
            return pa.table({"doc_id": pa.array(
                np.unique(g["doc_id"].to_numpy()), pa.int64())})

        ids_ds = (pairs.map_batches(explode_ids, batch_format="pyarrow")
                  .groupby("bk").map_groups(uniq_ids,
                                            batch_format="pyarrow"))
        cand_docs = hash_join_int_key(
            docs_ds, ids_ds, "doc_id",
            right_schema=pa.schema([("doc_id", pa.int64())]))
        cand_sets = cand_docs.map_batches(
            lambda b: _shingle_table(b, k),
            batch_format="pyarrow").materialize()

    n_hashes = cand_sets.sum("n_sh") or 0
    if n_hashes <= VERIFY_BROADCAST_MAX:
        ids_l, lens_l, flat_l = [], [], []
        for b in cand_sets.iter_batches(batch_size=None,
                                        batch_format="pyarrow"):
            s = b["shingles"]
            s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
            ids_l.append(b["doc_id"].to_numpy())
            lens_l.append(b["n_sh"].to_numpy())
            flat_l.append(np.asarray(s.flatten(), np.uint64))
        ids_all = (np.concatenate(ids_l) if ids_l
                   else np.zeros(0, np.int64))
        lens_all = (np.concatenate(lens_l) if lens_l
                    else np.zeros(0, np.int64))
        # reorder docs ascending so lookups are one searchsorted
        doc_order = np.argsort(ids_all)
        seg_off = _segment_offsets(lens_all)
        flat_all = (np.concatenate(flat_l) if flat_l
                    else np.zeros(0, np.uint64))
        take = np.concatenate(
            [np.arange(seg_off[i], seg_off[i + 1]) for i in doc_order]
            or [np.zeros(0, np.int64)]).astype(np.int64)
        ids_all, lens_all = ids_all[doc_order], lens_all[doc_order]
        flat_all = flat_all[take]
        off_all = _segment_offsets(lens_all)
        sets_ref = _ray.put((ids_all, lens_all, off_all, flat_all))

        def verify_broadcast(batch: pa.Table) -> pa.Table:
            empty = pa.table({"a_id": pa.array([], pa.int64()),
                              "b_id": pa.array([], pa.int64()),
                              "jacc": pa.array([], pa.float64())})
            if len(batch) == 0:
                return empty
            sid, slen, soff, sflat = _ray.get(sets_ref)
            a = batch["a_id"].to_numpy()
            b = batch["b_id"].to_numpy()
            ia = np.searchsorted(sid, a)
            ib = np.searchsorted(sid, b)
            la, lb = slen[ia], slen[ib]

            def gather(idx, ln):
                tot = int(ln.sum())
                excl = np.concatenate(([0], np.cumsum(ln)[:-1]))
                pos = (np.repeat(soff[idx], ln)
                       + (np.arange(tot) - np.repeat(excl, ln)))
                return sflat[pos]

            jacc = _jacc_core(la, lb, gather(ia, la), gather(ib, lb))
            keep = jacc >= tau
            return pa.table({"a_id": a[keep], "b_id": b[keep],
                             "jacc": jacc[keep]})

        return pairs.map_batches(verify_broadcast, batch_format="pyarrow",
                                 batch_size=4096)

    def rename(to_key, n_name, s_name):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({to_key: batch["doc_id"],
                             n_name: batch["n_sh"],
                             s_name: batch["shingles"]})
        return f

    a_sets = cand_sets.map_batches(rename("a_id", "n_a", "s_a"),
                                   batch_format="pyarrow")
    b_sets = cand_sets.map_batches(rename("b_id", "n_b", "s_b"),
                                   batch_format="pyarrow")
    # pairs is materialized and a_sets/b_sets map a materialized dataset,
    # so their .schema() is cheap — but the OUTER join's left side is the
    # inner join itself, whose .schema() would execute the inner shuffle
    # a second time; compose its schema statically instead.
    import types as _pytypes
    psch, asch = pairs.schema(), a_sets.schema()
    at = dict(zip(asch.names, asch.types))
    j1_schema = _pytypes.SimpleNamespace(
        names=list(psch.names) + [c for c in asch.names if c != "a_id"],
        types=list(psch.types) + [at[c] for c in asch.names if c != "a_id"])
    joined = hash_join_int_key(
        hash_join_int_key(pairs, a_sets, "a_id"), b_sets, "b_id",
        left_schema=j1_schema)

    def verify(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "jacc": pa.array([], pa.float64())})
        sa = batch["s_a"].combine_chunks() if isinstance(batch["s_a"], pa.ChunkedArray) else batch["s_a"]
        sb = batch["s_b"].combine_chunks() if isinstance(batch["s_b"], pa.ChunkedArray) else batch["s_b"]
        la = np.asarray(pc.list_value_length(sa), np.int64)
        lb = np.asarray(pc.list_value_length(sb), np.int64)
        jacc = _jacc_core(la, lb, np.asarray(sa.flatten(), np.uint64),
                          np.asarray(sb.flatten(), np.uint64))
        keep = jacc >= tau
        return pa.table({
            "a_id": batch["a_id"].to_numpy()[keep],
            "b_id": batch["b_id"].to_numpy()[keep],
            "jacc": jacc[keep],
        })

    return joined.map_batches(verify, batch_format="pyarrow")


# ------------------------------------------------- n-gram Jaccard (exact)

DF_SAMPLE_MOD = 16  # ~1/16 of docs sampled for the df prefix order
DF_TOP_K = 1 << 20  # heavy-hitter table cap: <=16 MB broadcast, any corpus


def _sampled_df(docs_ds, k: int, sample_mod: int, top_k: int = DF_TOP_K):
    """(sorted shingle values, df counts) — the top_k most frequent
    shingles of a deterministic ~1/sample_mod doc sample, computed fully
    distributed with a BOUNDED driver footprint.

    Used only to ORDER shingles for the prefix filter, which stays exact
    under ANY globally consistent total order: df is a pure function of
    the shingle value, so truncating to heavy hitters (absent => df=0,
    i.e. ranked rarest-first) keeps the order consistent for any top_k —
    only frequent shingles matter for prefix pruning anyway.  Plan:
    per-block distinct-shingle partials -> ONE native groupby(sh).sum
    (no per-group Python) -> distributed (count desc, sh asc) sort ->
    limit(top_k) -> driver take of at most top_k rows.  Replaces the
    round-1 driver-side combine whose memory grew with corpus-distinct
    shingles."""
    def part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        m = (ids * np.int64(2654435761)) % np.int64(sample_mod) == 0
        t = _shingle_table(batch.filter(pa.array(m)), k)
        s = t["shingles"]
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        flat = np.asarray(s.flatten(), np.uint64)
        u, c = np.unique(flat, return_counts=True)
        return pa.table({"sh": u.view(np.int64), "c": c.astype(np.int64)})

    top = (mat(docs_ds.map_batches(part, batch_format="pyarrow"))
           .groupby("sh").sum("c")
           .materialize()  # mat() rule: sort re-executes a lazy exchange
           .sort(["sum(c)", "sh"], descending=[True, False])
           .limit(top_k))
    bs = list(top.iter_batches(batch_size=None, batch_format="pyarrow"))
    bs = [b for b in bs if len(b)]
    if not bs:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    t = pa.concat_tables(bs)
    u = t["sh"].to_numpy().view(np.uint64)
    c = t["sum(c)"].to_numpy().astype(np.int64)
    order = np.argsort(u)
    return u[order], c[order]


def ngram_jaccard_pairs(docs_ds, tau: float = JACCARD_TAU,
                        k: int = SHINGLE_K,
                        df_sample_mod: int = DF_SAMPLE_MOD):
    """EXACT near-duplicate pairs with shingle-Jaccard >= tau.

    Prefix filtering: shingles are ordered by (sampled document frequency
    ASC, value) — a global total order — and only each doc's first
    |S| - ceil(tau*|S|) + 1 shingles enter the inverted index, which
    provably preserves all pairs with J >= tau under any consistent
    order.  df-ascending (PPJoin practice) matters for scale: with a
    value order, shingles shared corpus-wide (e.g. interiors of common
    whole tokens) land in prefixes and each contributes O(df^2)
    candidate pairs (>10min at 50k synthetic docs); df order keeps only
    the rarest shingles in prefixes (~10x fewer candidates there).  ONE
    groupby(shingle) shuffle builds candidates; the verifier computes
    exact J on candidate docs only.  Output: (a_id, b_id, jacc).

    Scale honesty: candidate volume is Theta(sum_sh df(sh)^2) over prefix
    shingles — on corpora whose k-byte windows are low-entropy (every
    rare shingle still shared by ~5 docs) that is super-linear in n, and
    the EXACT operator degrades (measured 815k candidates / 52 true
    pairs at 5k synthetic docs, ~50s).  minhash_lsh_pairs is the scale
    path; its banded signatures bound candidates by true similarity.
    """
    import ray as _ray

    df_ref = _ray.put(_sampled_df(docs_ds, k, df_sample_mod))
    sets_ds = docs_ds.map_batches(
        lambda b: _shingle_table(b, k), batch_format="pyarrow")

    def prefix_rows(batch: pa.Table) -> pa.Table:
        s = batch["shingles"]
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        lens = np.asarray(pc.list_value_length(s), np.int64)
        plen = _prefix_len(lens, tau)
        flat = np.asarray(s.flatten(), np.uint64)
        off = _segment_offsets(lens)
        rows = np.repeat(np.arange(len(lens)), lens)
        shu, dfc = _ray.get(df_ref)
        if len(shu):
            i = np.searchsorted(shu, flat)
            i[i == len(shu)] = 0
            dfv = np.where(shu[i] == flat, dfc[i], 0)
        else:
            dfv = np.zeros(len(flat), np.int64)
        order = np.lexsort((flat, dfv, rows))  # per doc: (df asc, value)
        flat_s = flat[order]
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1], lens)
        keep = pos < np.repeat(plen, lens)
        return pa.table({
            "sh": flat_s[keep].astype(np.int64),  # groupby key (int64 view)
            "doc_id": np.repeat(batch["doc_id"].to_numpy(), lens)[keep],
            "pos": pos[keep],                    # position in the global
            "n_sh": np.repeat(lens, lens)[keep],  # (df, value) set order
        })

    prefix = sets_ds.map_batches(prefix_rows, batch_format="pyarrow")
    return _verify_jaccard(_candidate_pairs(prefix, tau=tau), docs_ds,
                           tau, k)


def ngram_jaccard_sql(tau: float = JACCARD_TAU, k: int = SHINGLE_K) -> str:
    sh = shingle_sql_expr(k)
    return f"""
WITH sh AS (SELECT doc_id, {sh} AS s FROM documents),
j AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jacc
  FROM sh a, sh b WHERE a.doc_id < b.doc_id
)
SELECT a_id, b_id, jacc FROM j WHERE jacc >= {tau}
ORDER BY a_id, b_id
"""


# ----------------------------------------------------------- MinHash + LSH

def _minhash_params(num_perms: int):
    rng = np.random.default_rng(0xC0DEC0DE)
    a = rng.integers(1, 2**63, num_perms, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, num_perms, dtype=np.uint64)
    return a, b


def minhash_lsh_pairs(docs_ds, tau: float = JACCARD_TAU,
                      k: int = SHINGLE_K,
                      num_perms: int = MINHASH_PERMS,
                      bands: int = MINHASH_BANDS):
    """Approximate near-dup pairs: MinHash signatures (universal-hash
    perms), banded LSH buckets, then the same exact-Jaccard verifier, so
    the output has NO false positives; recall is probabilistic (asserted in
    tests against ngram_jaccard_pairs).  Output: (a_id, b_id, jacc)."""
    assert num_perms % bands == 0
    rows = num_perms // bands
    pa_, pb_ = _minhash_params(num_perms)

    sets_ds = docs_ds.map_batches(
        lambda b: _shingle_table(b, k), batch_format="pyarrow")

    def band_rows(batch: pa.Table) -> pa.Table:
        return _band_rows(batch, num_perms, bands, pa_, pb_)

    banded = sets_ds.map_batches(band_rows, batch_format="pyarrow")
    return _verify_jaccard(_candidate_pairs(banded), docs_ds, tau, k)


def _band_rows(batch: pa.Table, num_perms: int, bands: int,
               pa_: np.ndarray, pb_: np.ndarray) -> pa.Table:
    """(doc_id, shingles) batch -> banded LSH rows (sh, doc_id): MinHash
    signature per doc (universal-hash perms over the shingle set), one
    mixed band key per band.  Key formula shared by the in-memory LSH
    (minhash_lsh_pairs) and the physical store (neardup_build_store) —
    equal shingle sets produce equal band keys on both paths."""
    rows = num_perms // bands
    s = batch["shingles"]
    s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
    lens = np.asarray(pc.list_value_length(s), np.int64)
    flat = np.asarray(s.flatten(), np.uint64)
    off = _segment_offsets(lens)
    ids = batch["doc_id"].to_numpy()
    n = len(ids)
    nonempty = lens > 0
    sig = np.full((n, num_perms), np.iinfo(np.uint64).max, np.uint64)
    for p in range(num_perms):
        hp = flat * pa_[p] + pb_[p]  # uint64 wraparound
        if len(hp):
            mins = np.minimum.reduceat(hp, off[:-1][nonempty])
            sig[nonempty, p] = mins
    out_k, out_d = [], []
    for bnd in range(bands):
        block = sig[:, bnd * rows:(bnd + 1) * rows]
        kk = block[:, 0]
        for j in range(1, rows):
            kk = kk * np.uint64(0x9E3779B97F4A7C15) + block[:, j]
        out_k.append((kk // np.uint64(bands)).astype(np.int64) * bands + bnd)
        out_d.append(ids)
    return pa.table({"sh": np.concatenate(out_k),
                     "doc_id": np.concatenate(out_d)})


# ----------------------------------------------------------------- SimHash

def simhash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash uint64): majority vote per bit over the doc's token
    hash multiset; strict majority sets the bit (ties -> 0).

    Tokens are deduped with Arrow dictionary_encode (C++), md5 is computed
    once per distinct token, and per-doc bit counts use np.add.reduceat
    per bit column — no token x 64 prefix-sum matrix."""
    toks = _token_lists(_text_col(batch))
    lens = np.asarray(pc.list_value_length(toks), np.int64)
    off = _segment_offsets(lens)
    flat = toks.flatten()
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    d = flat.dictionary_encode()
    hd = np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
         for s in d.dictionary.to_pylist()),
        dtype=np.uint64, count=len(d.dictionary))
    th = hd[np.asarray(d.indices, np.int64)] if len(hd) else \
        np.zeros(0, np.uint64)
    nonempty = lens > 0
    starts = off[:-1][nonempty]
    ones = np.zeros((len(lens), 64), np.int64)
    for j in range(64):
        col = ((th >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        if len(starts):
            ones[nonempty, j] = np.add.reduceat(col, starts)
    bit = (2 * ones > lens[:, None]).astype(np.uint64)
    sh = (bit << np.arange(64, dtype=np.uint64)[None, :]).sum(
        1, dtype=np.uint64)
    return pa.table({"doc_id": batch["doc_id"],
                     "simhash": pa.array(sh, pa.uint64())})


def simhash_sql_expr() -> str:
    th = f"list_transform(string_split(text, ' '), t -> {md5_u64_sql('t')})"
    terms = []
    for j in range(64):
        ones = (f"list_sum(list_transform(th, "
                f"h -> CAST((h >> {j}) & 1 AS BIGINT)))")
        terms.append(
            f"(CASE WHEN 2*{ones} > len(th) THEN CAST({1 << j} AS UBIGINT) "
            f"ELSE CAST(0 AS UBIGINT) END)")
    total = " + ".join(terms)
    return f"(SELECT {total} FROM (SELECT {th} AS th) _t)"


def simhash_dup_pairs(docs_ds, max_ham: int = SIMHASH_HAM,
                      blocks: int = SIMHASH_BLOCKS):
    """EXACT pairs with simhash hamming distance <= max_ham (requires
    max_ham < blocks; pigeonhole over `blocks` disjoint 16-bit blocks).
    ONE groupby(block key) shuffle; hamming verified inside the bucket
    (signatures ride along — no join).  Output: (a_id, b_id, hamming)."""
    assert max_ham < blocks and 64 % blocks == 0
    width = 64 // blocks
    mask = np.uint64((1 << width) - 1)

    def block_rows(batch: pa.Table) -> pa.Table:
        t = simhash_batch(batch)
        sh = np.asarray(t["simhash"], np.uint64)
        ids = t["doc_id"].to_numpy()
        ks, ds, ss = [], [], []
        for b in range(blocks):
            val = (sh >> np.uint64(b * width)) & mask
            ks.append(val.astype(np.int64) * blocks + b)
            ds.append(ids)
            ss.append(sh)
        return pa.table({"bkey": np.concatenate(ks),
                         "doc_id": np.concatenate(ds),
                         "simhash": pa.array(np.concatenate(ss), pa.uint64())})

    def add_coarse(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bk", pa.array(_coarse_bucket(batch["bkey"].to_numpy())))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # one coarse group holds MANY bkey runs; pairs come only from
        # within a run (equal 16-bit block ⇒ candidate by pigeonhole)
        id_s, sel, ai, bi = _run_pairs(group["bkey"].to_numpy(),
                                       group["doc_id"].to_numpy())
        empty = pa.table({"pair": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        if not len(ai):
            return empty
        sh_s = np.asarray(group["simhash"], np.uint64)[sel]
        x = sh_s[ai] ^ sh_s[bi]
        ham = np.zeros(len(x), np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_ham
        pair, ui = np.unique(id_s[ai[keep]] * _PAIR_SHIFT + id_s[bi[keep]],
                             return_index=True)
        return pa.table({"pair": pa.array(pair, pa.int64()),
                         "hamming": pa.array(ham[keep][ui], pa.int64())})

    def pbucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bk2", pa.array(_coarse_bucket(batch["pair"].to_numpy())))

    def emit(group: pa.Table) -> pa.Table:
        p, ui = np.unique(group["pair"].to_numpy(), return_index=True)
        return pa.table({
            "a_id": pa.array(p // _PAIR_SHIFT, pa.int64()),
            "b_id": pa.array(p % _PAIR_SHIFT, pa.int64()),
            "hamming": pa.array(group["hamming"].to_numpy()[ui], pa.int64()),
        })

    cand = (mat(docs_ds.map_batches(block_rows, batch_format="pyarrow")
                .map_batches(add_coarse, batch_format="pyarrow"))
            .groupby("bk").map_groups(bucket_pairs, batch_format="pyarrow")
            .map_batches(pbucket, batch_format="pyarrow"))
    return (mat(cand)
            .groupby("bk2").map_groups(emit, batch_format="pyarrow"))


def simhash_dup_sql(max_ham: int = SIMHASH_HAM) -> str:
    return f"""
WITH sh AS (SELECT doc_id, {simhash_sql_expr()} AS s FROM documents)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
FROM sh a, sh b
WHERE a.doc_id < b.doc_id AND bit_count(xor(a.s, b.s)) <= {max_ham}
ORDER BY a_id, b_id
"""


# ------------------------------------------------------ corpus top-k terms

TOPK_TERMS_K = 50


def topk_terms(docs_ds, k: int = TOPK_TERMS_K):
    """Corpus-level most-frequent tokens: (token, n), top k by
    (n DESC, token ASC) — the vocabulary analysis every curation run
    starts from.

    Scale shape: per-block pc.value_counts partials, so the ONE exchange
    carries one row per distinct token per block (vocab-sized, not
    occurrence-sized), keyed by a size-derived token-hash bucket (sizing.fanout) — a string
    groupby key plus a vocab-wide distributed sort measured 10× slower
    than this int-keyed shuffle with per-bucket vectorized combine.  Every
    occurrence of a token hashes to one bucket, so bucket-local top-k is
    exact; the final sort+limit sees ≤buckets·k rows.  Exact under ties: both
    sides rank by the identical (n DESC, token ASC) total order."""
    from .sizing import bucket_shift
    _shift = bucket_shift()

    def part(batch: pa.Table) -> pa.Table:
        flat = _token_lists(_text_col(batch)).flatten()
        vc = pc.value_counts(flat)  # hash-based C++ count, no np.unique
        tok = vc.field("values")
        bk = (md5_u64(tok) >> _shift).astype(np.int64)
        return pa.table({"token": tok,
                         "c": vc.field("counts").cast(pa.int64()),
                         "bk": bk})

    def combine(group: pa.Table) -> pa.Table:
        # one hash bucket: every occurrence of a token lands here, so the
        # bucket-local top-k is a superset of the token's global standing
        u, inv = np.unique(np.asarray(_text_col(group, "token"),
                                      dtype=object), return_inverse=True)
        n = np.bincount(inv, weights=group["c"].to_numpy(),
                        minlength=len(u)).astype(np.int64)
        order = np.lexsort((u, -n))[:k]
        return pa.table({"token": pa.array(u[order], pa.string()),
                         "n": n[order]})

    return (mat(docs_ds.map_batches(part, batch_format="pyarrow"))
            .groupby("bk").map_groups(combine, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort(["n", "token"], descending=[True, False])
            .limit(k))


def topk_terms_sql(k: int = TOPK_TERMS_K) -> str:
    return f"""
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT {k}
"""


# ------------------------------------------------------- token rarity

#: Fallback vocab-row cap for the sorted-array broadcast when the
#: object-store size is unavailable (~64 MB of (hash, n) pairs).
TOKEN_RARITY_BROADCAST_MAX = 4_000_000

#: Broadcast while the vocab arrays stay under this fraction of the
#: CLUSTER object store (the knn_spill_threshold_rows discipline): the
#: ray.put lives once per node in plasma, so the budget scales with the
#: store rather than a host-tuned constant.
VOCAB_BROADCAST_STORE_FRACTION = 1 / 32
_VOCAB_ROW_BYTES = 16  # sorted (uint64 hash, int64 count) pair


def vocab_broadcast_max_rows() -> int:
    """Vocab-row count up to which the re-attach phase broadcasts the
    sorted (hash, count) arrays instead of hash-joining — derived from
    the cluster object store, falling back to the fixed cap when Ray is
    not initialised.  Both paths are byte-equal (pinned in
    tests/test_textops.py), so this knob only moves the
    broadcast-vs-shuffle crossover."""
    try:
        import ray
        if ray.is_initialized():
            store = ray.cluster_resources().get("object_store_memory")
            if store:
                return int(store * VOCAB_BROADCAST_STORE_FRACTION
                           // _VOCAB_ROW_BYTES)
    except Exception:
        pass
    return TOKEN_RARITY_BROADCAST_MAX


def token_rarity(docs_ds, broadcast_max: int | None = None):
    """Global-vocabulary rarity statistics per document: each token's
    CORPUS frequency joined back onto the docs that use it ->
    (doc_id, n_tokens, sum_tf, min_tf, max_tf, mean_tf) sorted.  Low
    mean/min corpus frequency flags rare/garbled text, high flags
    boilerplate — the CCNet-style LM-quality proxy with integer-exact
    math (mean_tf is the single terminal division, hence bitwise).

    Scale shape, two phases:
    1. vocabulary aggregate — per-block pc.value_counts partials keyed
       by token-hash bucket (the topk_terms shuffle, un-truncated), ONE
       vocab-sized exchange, materialized (vocab rows ≪ corpus rows).
    2. re-attach — vocab row count decides:
       * ≤ broadcast_max: ray.put a sorted (hash, n) pair of arrays once
         per job; per-block lookup is one searchsorted + int64 segment
         sums — zero additional shuffles.
       * above the cap (100-TB open-vocab corpora): per-block
         (doc, token)-deduped occurrence rows hash-join the vocab table
         (joins.hash_join_int_key, th unique on the right), then one
         doc-bucket exchange combines the associative partials
         (sum/min/max/count) — the driver never holds the vocabulary.
    Both paths produce identical bytes (pinned by the fallback test).
    Token identity is md5_u64 (the token_stats collision precedent)."""
    import ray as _ray

    from .sizing import bucket_shift
    _shift = bucket_shift()

    def vocab_part(batch: pa.Table) -> pa.Table:
        flat = _token_lists(_text_col(batch)).flatten()
        vc = pc.value_counts(flat)
        th = md5_u64(vc.field("values"))
        return pa.table({"th": th.view(np.int64),
                         "c": vc.field("counts").cast(pa.int64()),
                         "bk": (th >> _shift).astype(np.int64)})

    def vocab_combine(g: pa.Table) -> pa.Table:
        th = g["th"].to_numpy()
        u, inv = np.unique(th, return_inverse=True)
        n = np.bincount(inv, weights=g["c"].to_numpy(),
                        minlength=len(u)).astype(np.int64)
        return pa.table({"th": u, "n": n})

    vocab = (mat(docs_ds.map_batches(vocab_part, batch_format="pyarrow"))
             .groupby("bk").map_groups(vocab_combine,
                                       batch_format="pyarrow")
             .materialize())

    def _doc_table(ids, lens, sum_tf, min_tf, max_tf) -> pa.Table:
        return pa.table({
            "doc_id": ids,
            "n_tokens": lens,
            "sum_tf": sum_tf,
            "min_tf": min_tf,
            "max_tf": max_tf,
            "mean_tf": sum_tf.astype(np.float64) / lens,
        })

    if broadcast_max is None:
        broadcast_max = vocab_broadcast_max_rows()
    if vocab.count() <= broadcast_max:
        ths, ns = [np.zeros(0, np.int64)], [np.zeros(0, np.int64)]
        for b in vocab.iter_batches(batch_size=None,
                                    batch_format="pyarrow"):
            ths.append(b["th"].to_numpy())
            ns.append(b["n"].to_numpy())
        th_all, n_all = np.concatenate(ths), np.concatenate(ns)
        order = np.argsort(th_all)
        ref = _ray.put((th_all[order], n_all[order]))

        def score(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                z = np.zeros(0, np.int64)
                return _doc_table(z, z, z, z, z)
            thv, nv = _ray.get(ref)
            toks = _token_lists(_text_col(batch))
            lens = np.asarray(pc.list_value_length(toks), np.int64)
            off = _segment_offsets(lens)
            tf = nv[np.searchsorted(
                thv, md5_u64(toks.flatten()).view(np.int64))]
            # per-doc sums via add.at, not the cumsum trick: a batch-wide
            # int64 cumsum of corpus frequencies can wrap past 2^63 even
            # when every per-doc sum is in range
            s = np.zeros(len(lens), np.int64)
            np.add.at(s, np.repeat(np.arange(len(lens)), lens), tf)
            return _doc_table(batch["doc_id"].to_numpy(), lens, s,
                              np.minimum.reduceat(tf, off[:-1]),
                              np.maximum.reduceat(tf, off[:-1]))

        return (docs_ds.map_batches(score, batch_format="pyarrow")
                .materialize()  # mat() rule
                .sort("doc_id"))

    from .joins import hash_join_int_key

    def occ_part(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            z = np.zeros(0, np.int64)
            return pa.table({"th": z, "doc_id": z, "occ": z})
        toks = _token_lists(_text_col(batch))
        lens = np.asarray(pc.list_value_length(toks), np.int64)
        th = md5_u64(toks.flatten()).view(np.int64)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        order = np.lexsort((th, doc_of))
        d_s, h_s = doc_of[order], th[order]
        new = np.concatenate(
            ([True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])))
        starts = np.flatnonzero(new)
        occ = np.diff(np.append(starts, len(d_s)))
        return pa.table({
            "th": h_s[starts],
            "doc_id": batch["doc_id"].to_numpy()[d_s[starts]],
            "occ": occ,
        })

    joined = hash_join_int_key(
        docs_ds.map_batches(occ_part, batch_format="pyarrow"),
        vocab, key="th",
        left_schema=pa.schema([("th", pa.int64()), ("doc_id", pa.int64()),
                               ("occ", pa.int64())]),
        right_schema=pa.schema([("th", pa.int64()), ("n", pa.int64())]))

    def _int_segsum(inv: np.ndarray, vals: np.ndarray,
                    n: int) -> np.ndarray:
        # np.bincount(weights=...) accumulates in float64, which rounds
        # once per-doc Σ occ·corpus_frequency crosses 2^53 — exactly the
        # open-vocabulary scale this join path exists for.  np.add.at on
        # an int64 accumulator is exact.
        out = np.zeros(n, np.int64)
        np.add.at(out, inv, vals)
        return out

    def doc_part(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        occ = batch["occ"].to_numpy()
        n = batch["n"].to_numpy()
        u, inv = np.unique(d, return_inverse=True)
        nt = _int_segsum(inv, occ, len(u))
        s = _int_segsum(inv, occ * n, len(u))
        mn = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.minimum.at(mn, inv, n)
        np.maximum.at(mx, inv, n)
        return pa.table({"doc_id": u, "nt": nt, "s": s, "mn": mn, "mx": mx,
                         "bk": _coarse_bucket(u)})

    def doc_combine(g: pa.Table) -> pa.Table:
        d = g["doc_id"].to_numpy()
        u, inv = np.unique(d, return_inverse=True)
        nt = _int_segsum(inv, g["nt"].to_numpy(), len(u))
        s = _int_segsum(inv, g["s"].to_numpy(), len(u))
        mn = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.minimum.at(mn, inv, g["mn"].to_numpy())
        np.maximum.at(mx, inv, g["mx"].to_numpy())
        return _doc_table(u, nt, s, mn, mx)

    return (mat(joined.map_batches(doc_part, batch_format="pyarrow"))
            .groupby("bk").map_groups(doc_combine, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort("doc_id"))


def token_rarity_sql() -> str:
    return """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
             FROM documents),
cnt AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t)
SELECT tok.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(cnt.n) AS BIGINT) AS sum_tf,
       CAST(MIN(cnt.n) AS BIGINT) AS min_tf,
       CAST(MAX(cnt.n) AS BIGINT) AS max_tf,
       CAST(SUM(cnt.n) AS DOUBLE) / COUNT(*) AS mean_tf
FROM tok JOIN cnt ON tok.t = cnt.t
GROUP BY tok.doc_id ORDER BY tok.doc_id
"""


# -------------------------------------------------- bigram LM score

def _mix64_pair(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Order-sensitive 64-bit combine of two token hashes — the bigram
    key, without ever building or md5-hashing the bigram string."""
    from .eventops import _mix64
    return _mix64(h1 ^ _mix64(h2))


def _bigram_hash_arrays(batch: pa.Table):
    """Per-batch bigram occurrence arrays in HASH space: (doc_ids,
    token_lens, tok_h, seg_offsets, pre_h, bg_h).  tok_h = md5_u64 over
    the flat tokens (one cached hash per in-batch unique token); at
    every bigram position pre_h is the prefix token's hash and bg_h the
    order-sensitive mix of the two token hashes.  Bigram STRINGS are
    never built: the keys are engine-internal (the SQL oracles join on
    strings), and benchmarking showed md5 over the bigram vocabulary —
    far larger than the unigram one, so the per-worker cache can't
    help — dominating these stages.  Unigram keys (raw md5_u64) and
    bigram keys (mixed) collide only in the same 2^-64 birthday class
    as md5_u64 itself, so one vocabulary table holds both."""
    toks = _token_lists(_text_col(batch))
    lens = np.asarray(pc.list_value_length(toks), np.int64)
    off = _segment_offsets(lens)
    keep = np.ones(int(off[-1]), bool)
    keep[off[1:] - 1] = False          # each doc's final token: no successor
    idx = np.flatnonzero(keep)
    h = md5_u64(toks.flatten())
    pre_h = h[idx]
    bg_h = _mix64_pair(pre_h, h[idx + 1])
    ids = (batch["doc_id"].to_numpy()
           if "doc_id" in batch.column_names else None)
    return ids, lens, h, off, pre_h, bg_h


def bigram_lm_score(docs_ds,
                    broadcast_max: int | None = None):
    """Corpus-bigram-LM quality score per document (the perplexity-filter
    shape of a pretraining pipeline, in integer-exact form):

      doc_id, n_bigrams,
      n_hapax     — this doc's bigram occurrences whose CORPUS count is 1
                    (unique-to-this-doc word transitions: high = novel or
                    garbled text, low = boilerplate),
      sum_bg      — Σ corpus count of each bigram occurrence,
      sum_prefix  — Σ corpus count of each bigram's prefix unigram,
      cond_score  — sum_bg / sum_prefix: the prefix-count-weighted mean
                    of the conditional probabilities c(w1 w2)/c(w1) the
                    corpus bigram model assigns this doc (one terminal
                    float division — bitwise-mirrorable, unlike a sum of
                    per-bigram log-probs whose float order and libm ulps
                    SQL cannot pin),
      mean_bg     — sum_bg / n_bigrams.

    Single-token docs have n_bigrams = 0 and NULL for every other stat
    (real Arrow nulls, the repetition_stats precedent).

    Scale shape (token_rarity's two phases, one corpus pass each):
    1. ONE vocabulary aggregate for unigrams AND bigrams together
       (disjoint key spaces, see _bigram_hash_arrays): per-block
       value_counts partials, one vocab-sized hash-bucket exchange.
    2. re-attach: vocab ≤ broadcast_max -> ray.put one sorted
       (md5_u64, count) array pair, per-block searchsorted (zero extra
       shuffles); above the cap -> per-block (doc, key)-deduped
       occurrence rows hash-join the vocab table, then one doc-bucket
       exchange combines exact int64 partials.  Both paths byte-equal
       (pinned by tests/test_textops.py)."""
    import ray as _ray

    from .joins import hash_join_int_key
    from .sizing import bucket_shift
    _shift = bucket_shift()

    def vocab_part(batch: pa.Table) -> pa.Table:
        _, _, h, _, _, bg_h = _bigram_hash_arrays(batch)
        keys = np.concatenate([h, bg_h])
        u, cnt = np.unique(keys, return_counts=True)
        return pa.table({"th": u.view(np.int64),
                         "c": cnt.astype(np.int64),
                         "bk": (u >> _shift).astype(np.int64)})

    def vocab_combine(g: pa.Table) -> pa.Table:
        th = g["th"].to_numpy()
        u, inv = np.unique(th, return_inverse=True)
        n = np.bincount(inv, weights=g["c"].to_numpy(),
                        minlength=len(u)).astype(np.int64)
        return pa.table({"th": u, "n": n})

    vocab = (mat(docs_ds.map_batches(vocab_part, batch_format="pyarrow"))
             .groupby("bk").map_groups(vocab_combine,
                                       batch_format="pyarrow")
             .materialize())

    def _final_table(d, nbg, hap, sbg, spre) -> pa.Table:
        null = nbg == 0
        with np.errstate(divide="ignore", invalid="ignore"):
            cond = sbg.astype(np.float64) / spre.astype(np.float64)
            mean = sbg.astype(np.float64) / nbg.astype(np.float64)
        return pa.table({
            "doc_id": pa.array(d, pa.int64()),
            "n_bigrams": pa.array(nbg, pa.int64()),
            "n_hapax": pa.array(hap, pa.int64(), mask=null),
            "sum_bg": pa.array(sbg, pa.int64(), mask=null),
            "sum_prefix": pa.array(spre, pa.int64(), mask=null),
            "cond_score": pa.array(cond, pa.float64(), mask=null),
            "mean_bg": pa.array(mean, pa.float64(), mask=null),
        })

    if broadcast_max is None:
        broadcast_max = vocab_broadcast_max_rows()
    if vocab.count() <= broadcast_max:
        ths, ns = [np.zeros(0, np.int64)], [np.zeros(0, np.int64)]
        for b in vocab.iter_batches(batch_size=None,
                                    batch_format="pyarrow"):
            ths.append(b["th"].to_numpy())
            ns.append(b["n"].to_numpy())
        th_all, n_all = np.concatenate(ths), np.concatenate(ns)
        order = np.argsort(th_all)
        ref = _ray.put((th_all[order], n_all[order]))

        def score(batch: pa.Table) -> pa.Table:
            ids, lens, _, _, pre_h, bg_h = _bigram_hash_arrays(batch)
            if len(ids) == 0:
                z = np.zeros(0, np.int64)
                return _final_table(z, z, z, z, z)
            thv, nv = _ray.get(ref)
            n_bg = nv[np.searchsorted(thv, bg_h.view(np.int64))]
            n_ug = nv[np.searchsorted(thv, pre_h.view(np.int64))]
            nbg_l = lens - 1
            doc_of = np.repeat(np.arange(len(ids)), nbg_l)
            # int64 add.at accumulators: exact at any corpus frequency
            # (the token_rarity overflow note applies here too)
            sbg = np.zeros(len(ids), np.int64)
            spre = np.zeros(len(ids), np.int64)
            hap = np.zeros(len(ids), np.int64)
            np.add.at(sbg, doc_of, n_bg)
            np.add.at(spre, doc_of, n_ug)
            np.add.at(hap, doc_of, (n_bg == 1).astype(np.int64))
            return _final_table(ids, nbg_l, hap, sbg, spre)

        return (docs_ds.map_batches(score, batch_format="pyarrow")
                .materialize()  # mat() rule
                .sort("doc_id"))

    # ---- open-vocabulary fallback: occurrence rows join the vocab table
    KIND_BG, KIND_PREFIX, KIND_SENTINEL = 0, 1, 2

    def _dedup_occ(th: np.ndarray, doc_of: np.ndarray):
        if len(th) == 0:
            z = np.zeros(0, np.int64)
            return z, z, z
        order = np.lexsort((th, doc_of))
        d_s, h_s = doc_of[order], th[order]
        new = np.concatenate(
            ([True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])))
        starts = np.flatnonzero(new)
        occ = np.diff(np.append(starts, len(d_s)))
        return h_s[starts], d_s[starts], occ

    def occ_part(batch: pa.Table) -> pa.Table:
        ids, lens, tok_h, off, pre_h, bg_h = _bigram_hash_arrays(batch)
        nbg_l = lens - 1
        doc_of = np.repeat(np.arange(len(ids)), nbg_l)
        parts = []
        for kind, arr in ((KIND_BG, bg_h), (KIND_PREFIX, pre_h)):
            h, d, occ = _dedup_occ(arr.view(np.int64), doc_of)
            parts.append((h, ids[d], occ,
                          np.full(len(h), kind, np.int64)))
        # zero-bigram docs: a sentinel row keyed by the doc's only token
        # (guaranteed present in the vocab) with occ = 0, so the doc
        # survives the inner join and gets its NULL row
        z = np.flatnonzero(nbg_l == 0)
        if len(z):
            parts.append((tok_h[off[z]].view(np.int64), ids[z],
                          np.zeros(len(z), np.int64),
                          np.full(len(z), KIND_SENTINEL, np.int64)))
        return pa.table({
            "th": np.concatenate([p[0] for p in parts]),
            "doc_id": np.concatenate([p[1] for p in parts]),
            "occ": np.concatenate([p[2] for p in parts]),
            "kind": np.concatenate([p[3] for p in parts]),
        })

    joined = hash_join_int_key(
        docs_ds.map_batches(occ_part, batch_format="pyarrow"),
        vocab, key="th",
        left_schema=pa.schema([("th", pa.int64()), ("doc_id", pa.int64()),
                               ("occ", pa.int64()),
                               ("kind", pa.int64())]),
        right_schema=pa.schema([("th", pa.int64()), ("n", pa.int64())]))

    def _isum(inv, vals, n):
        out = np.zeros(n, np.int64)
        np.add.at(out, inv, vals)
        return out

    def doc_part(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        occ = batch["occ"].to_numpy()
        n = batch["n"].to_numpy()
        kind = batch["kind"].to_numpy()
        u, inv = np.unique(d, return_inverse=True)
        is_bg = (kind == KIND_BG).astype(np.int64)
        is_pre = (kind == KIND_PREFIX).astype(np.int64)
        return pa.table({
            "doc_id": u,
            "nbg": _isum(inv, occ * is_bg, len(u)),
            "hap": _isum(inv, occ * is_bg * (n == 1), len(u)),
            "sbg": _isum(inv, occ * n * is_bg, len(u)),
            "spre": _isum(inv, occ * n * is_pre, len(u)),
            "bk": _coarse_bucket(u),
        })

    def doc_combine(g: pa.Table) -> pa.Table:
        d = g["doc_id"].to_numpy()
        u, inv = np.unique(d, return_inverse=True)
        return _final_table(
            u,
            _isum(inv, g["nbg"].to_numpy(), len(u)),
            _isum(inv, g["hap"].to_numpy(), len(u)),
            _isum(inv, g["sbg"].to_numpy(), len(u)),
            _isum(inv, g["spre"].to_numpy(), len(u)))

    return (mat(joined.map_batches(doc_part, batch_format="pyarrow"))
            .groupby("bk").map_groups(doc_combine, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort("doc_id"))


def bigram_lm_score_sql() -> str:
    return """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
ug AS (SELECT tok, COUNT(*) AS n
       FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok),
pos AS (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t),
bgo AS (SELECT doc_id, toks[i] AS w1,
               toks[i] || ' ' || toks[i + 1] AS bg
        FROM pos),
bgc AS (SELECT bg, COUNT(*) AS n FROM bgo GROUP BY bg),
per AS (
  SELECT o.doc_id,
         COUNT(*) AS n_bigrams,
         CAST(SUM(CASE WHEN bgc.n = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax,
         CAST(SUM(bgc.n) AS BIGINT) AS sum_bg,
         CAST(SUM(ug.n) AS BIGINT) AS sum_prefix
  FROM bgo o JOIN bgc ON o.bg = bgc.bg JOIN ug ON o.w1 = ug.tok
  GROUP BY o.doc_id)
SELECT t.doc_id,
       COALESCE(per.n_bigrams, 0) AS n_bigrams,
       per.n_hapax, per.sum_bg, per.sum_prefix,
       CAST(per.sum_bg AS DOUBLE) / CAST(per.sum_prefix AS DOUBLE)
         AS cond_score,
       CAST(per.sum_bg AS DOUBLE) / CAST(per.n_bigrams AS DOUBLE)
         AS mean_bg
FROM t LEFT JOIN per ON t.doc_id = per.doc_id
ORDER BY t.doc_id
"""


# ---------------------------------------------- n-gram diversity (TTR)

def _pair_first(src: np.ndarray, th: np.ndarray) -> np.ndarray:
    """Indices of the first occurrence of each distinct (source, hash)
    pair (any representative works — callers only count or re-emit)."""
    if len(th) == 0:
        return np.zeros(0, np.int64)
    _, code = np.unique(src, return_inverse=True)
    order = np.lexsort((th, code))
    c_s, h_s = code[order], th[order]
    new = np.concatenate(
        ([True], (c_s[1:] != c_s[:-1]) | (h_s[1:] != h_s[:-1])))
    return order[np.flatnonzero(new)]


def ngram_diversity(docs_ds):
    """Per-source bigram type-token ratio -> (source, n_bigrams,
    n_distinct, diversity), sorted by source.  Low diversity = template
    or boilerplate-heavy source, the standard corpus-mix health signal.

    Exact distinct at scale: per-block (source, bigram-hash) pairs are
    deduped BEFORE the exchange, the ONE shuffle is keyed by hash bucket
    (so a bucket sees every copy of a given bigram and its per-source
    dedup is globally exact), and per-bucket partial counts — plus the
    per-source occurrence totals, which ride the same exchange as
    metadata-sized rows — tree-combine in a terminal sources-sized task.
    diversity = n_distinct / n_bigrams is the single terminal division
    (bitwise vs the oracle)."""
    from .sizing import bucket_shift
    _shift = bucket_shift()

    def part(batch: pa.Table) -> pa.Table:
        _, lens, _, _, _, bg_h = _bigram_hash_arrays(batch)
        src = np.asarray(batch["source"], dtype=object)
        nbg_l = lens - 1
        src_of = np.repeat(src, nbg_l)
        th = bg_h
        # per-block dedup of (source, bigram) pairs: integer source
        # codes + lexsort, no string-key concatenation
        first = _pair_first(src_of, th.view(np.int64))
        thi = th.view(np.int64)
        # per-source occurrence totals (metadata-sized, kind=1)
        us, inv = np.unique(src, return_inverse=True)
        tot = np.zeros(len(us), np.int64)
        np.add.at(tot, inv, nbg_l)
        keep = tot > 0
        return pa.table({
            "bk": np.concatenate([(th[first] >> _shift).astype(np.int64),
                                  np.full(int(keep.sum()), -1, np.int64)]),
            "source": pa.array(np.concatenate([src_of[first], us[keep]]),
                               pa.string()),
            "th": np.concatenate([thi[first],
                                  np.zeros(int(keep.sum()), np.int64)]),
            "cnt": np.concatenate([np.zeros(len(first), np.int64),
                                   tot[keep]]),
        })

    def bucket(g: pa.Table) -> pa.Table:
        src = np.asarray(g["source"], dtype=object)
        if len(g) and g["bk"][0].as_py() == -1:
            u, inv = np.unique(src, return_inverse=True)
            tot = np.zeros(len(u), np.int64)
            np.add.at(tot, inv, g["cnt"].to_numpy())
            return pa.table({"source": pa.array(u, pa.string()),
                             "tot": tot,
                             "dist": np.zeros(len(u), np.int64)})
        th = g["th"].to_numpy()
        first = _pair_first(src, th)
        u, inv = np.unique(src[first], return_inverse=True)
        return pa.table({"source": pa.array(u, pa.string()),
                         "tot": np.zeros(len(u), np.int64),
                         "dist": np.bincount(
                             inv, minlength=len(u)).astype(np.int64)})

    def finalize(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["source"], dtype=object)
        u, inv = np.unique(src, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        dist = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, batch["tot"].to_numpy())
        np.add.at(dist, inv, batch["dist"].to_numpy())
        keep = tot > 0   # a source of only zero-bigram docs: absent in SQL
        u, tot, dist = u[keep], tot[keep], dist[keep]
        return pa.table({
            "source": pa.array(u, pa.string()),
            "n_bigrams": tot,
            "n_distinct": dist,
            "diversity": dist.astype(np.float64) / tot.astype(np.float64),
        })

    return (mat(docs_ds.map_batches(part, batch_format="pyarrow"))
            .groupby("bk").map_groups(bucket, batch_format="pyarrow")
            .repartition(1)
            .map_batches(finalize, batch_format="pyarrow",
                         batch_size=None))


def ngram_diversity_sql() -> str:
    return """
WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
pos AS (SELECT source, toks,
               unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t),
bg AS (SELECT source, toks[i] || ' ' || toks[i + 1] AS bg FROM pos)
SELECT source,
       COUNT(*) AS n_bigrams,
       COUNT(DISTINCT bg) AS n_distinct,
       CAST(COUNT(DISTINCT bg) AS DOUBLE) / COUNT(*) AS diversity
FROM bg GROUP BY source ORDER BY source
"""


# ---------------------------------------------- tf-idf keyword extraction

TFIDF_K = 3


def tfidf_keywords(docs_ds, k: int = TFIDF_K,
                   broadcast_max: int | None = None):
    """Top-k salient terms per document -> (doc_id, rank, token, tf, df,
    score), sorted.  score = tf / df: term frequency over document
    frequency — monotone in tf·idf for any fixed tf (and the standard
    salience ranking when idf is the only discriminator) but computed as
    ONE exactly-rounded integer division, so the float and the ranking
    it induces are bitwise-identical in numpy and SQL; a log-based idf
    would hang the rank order on libm ulps no oracle can pin.  Ties
    break by token byte order (UTF-8 code-point order — what DuckDB's
    binary collation compares).

    Shape: a doc's tokens live in its own row, so per-doc tf is complete
    inside every block; only the df vocabulary is global.  Phase 1
    aggregates df (per-block per-doc-deduped value_counts partials, one
    vocab-sized exchange).  Phase 2 re-attaches: vocab ≤ broadcast_max
    -> one ray.put sorted array + per-block searchsorted and the top-k
    emits directly (zero extra shuffles); above the cap -> per-block
    (doc, token, tf) rows hash-join the df table, then one doc-bucket
    exchange reassembles docs for the top-k (token strings ride the
    join: the tie-break needs them).  Both paths byte-equal (pinned by
    tests/test_textops.py)."""
    import ray as _ray

    from .joins import hash_join_int_key
    from .sizing import bucket_shift
    _shift = bucket_shift()

    def _doc_tf(batch: pa.Table):
        """Per-(doc, token) tf rows, complete within the block."""
        if len(batch) == 0:
            z = np.zeros(0, np.int64)
            return (z, z, z, z, z,
                    pa.array([], pa.string()))
        toks = _token_lists(_text_col(batch))
        lens = np.asarray(pc.list_value_length(toks), np.int64)
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        flat = toks.flatten()
        th = md5_u64(flat).view(np.int64)
        order = np.lexsort((th, doc_of))
        d_s, h_s = doc_of[order], th[order]
        new = np.concatenate(
            ([True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])))
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, len(d_s))).astype(np.int64)
        first = order[starts]
        return (batch["doc_id"].to_numpy(), d_s[starts], first, tf,
                h_s[starts], flat)

    def df_part(batch: pa.Table) -> pa.Table:
        _, _, _, _, th, _ = _doc_tf(batch)
        u, cnt = np.unique(th, return_counts=True)
        return pa.table({"th": u, "c": cnt.astype(np.int64),
                         "bk": (u.view(np.uint64) >> _shift)
                         .astype(np.int64)})

    def df_combine(g: pa.Table) -> pa.Table:
        th = g["th"].to_numpy()
        u, inv = np.unique(th, return_inverse=True)
        n = np.bincount(inv, weights=g["c"].to_numpy(),
                        minlength=len(u)).astype(np.int64)
        return pa.table({"th": u, "n": n})

    vocab = (mat(docs_ds.map_batches(df_part, batch_format="pyarrow"))
             .groupby("bk").map_groups(df_combine, batch_format="pyarrow")
             .materialize())

    def _topk_rows(ids, doc_idx, tok, tf, df):
        """Per-doc top-k under (score DESC, token ASC); doc_idx groups
        rows (sorted), tok is a numpy unicode array."""
        with np.errstate(divide="ignore"):
            score = tf.astype(np.float64) / df.astype(np.float64)
        order = np.lexsort((tok, -score, doc_idx))
        d_o = doc_idx[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(d_o[1:] != d_o[:-1]) + 1))
        pos = np.arange(len(d_o)) - np.repeat(
            starts, np.diff(np.append(starts, len(d_o))))
        keep = order[pos < k]
        rank = (pos[pos < k] + 1).astype(np.int64)
        return pa.table({
            "doc_id": ids[doc_idx[keep]],
            "rank": rank,
            "token": pa.array(tok[keep], pa.string()),
            "tf": tf[keep],
            "df": df[keep],
            "score": score[keep],
        })

    if broadcast_max is None:
        broadcast_max = vocab_broadcast_max_rows()
    if vocab.count() <= broadcast_max:
        ths, ns = [np.zeros(0, np.int64)], [np.zeros(0, np.int64)]
        for b in vocab.iter_batches(batch_size=None,
                                    batch_format="pyarrow"):
            ths.append(b["th"].to_numpy())
            ns.append(b["n"].to_numpy())
        th_all, n_all = np.concatenate(ths), np.concatenate(ns)
        o = np.argsort(th_all)
        ref = _ray.put((th_all[o], n_all[o]))

        def extract(batch: pa.Table) -> pa.Table:
            ids, d_idx, first, tf, th, flat = _doc_tf(batch)
            if len(ids) == 0 or len(d_idx) == 0:
                z = np.zeros(0, np.int64)
                return _topk_rows(np.zeros(0, np.int64), z,
                                  np.zeros(0, "U1"), z, z)
            thv, nv = _ray.get(ref)
            df = nv[np.searchsorted(thv, th)]
            tok = np.asarray(flat.take(pa.array(first, pa.int64())),
                             dtype=object).astype(str)
            return _topk_rows(ids, d_idx, tok, tf, df)

        return (docs_ds.map_batches(extract, batch_format="pyarrow")
                .materialize()  # mat() rule
                .sort(["doc_id", "rank"]))

    # ---- open-vocabulary fallback: tf rows join the df table
    def tf_rows(batch: pa.Table) -> pa.Table:
        ids, d_idx, first, tf, th, flat = _doc_tf(batch)
        return pa.table({
            "th": th,
            "doc_id": ids[d_idx],
            "tf": tf,
            "token": flat.take(pa.array(first, pa.int64())),
        })

    joined = hash_join_int_key(
        docs_ds.map_batches(tf_rows, batch_format="pyarrow"),
        vocab, key="th",
        left_schema=pa.schema([("th", pa.int64()), ("doc_id", pa.int64()),
                               ("tf", pa.int64()),
                               ("token", pa.string())]),
        right_schema=pa.schema([("th", pa.int64()), ("n", pa.int64())]))

    def regroup(batch: pa.Table) -> pa.Table:
        return batch.append_column("bk", pa.array(
            _coarse_bucket(batch["doc_id"].to_numpy()), pa.int64()))

    def doc_topk(g: pa.Table) -> pa.Table:
        d = g["doc_id"].to_numpy()
        u, inv = np.unique(d, return_inverse=True)
        tok = np.asarray(g["token"], dtype=object).astype(str)
        return _topk_rows(u, inv, tok, g["tf"].to_numpy(),
                          g["n"].to_numpy())

    return (mat(joined.map_batches(regroup, batch_format="pyarrow"))
            .groupby("bk").map_groups(doc_topk, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort(["doc_id", "rank"]))


def tfidf_keywords_sql(k: int = TFIDF_K) -> str:
    return f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
             FROM documents),
tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
s AS (
  SELECT doc_id, t AS token, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) / df.df AS score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC,
                                     t) AS rk
  FROM tf JOIN df USING (t)
)
SELECT doc_id, CAST(rk AS BIGINT) AS rank, token,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
FROM s WHERE rk <= {int(k)} ORDER BY doc_id, rank
"""


# ------------------------------------------------- deterministic sampling

SAMPLE_MULT = 2654435761   # Knuth multiplicative hash; doc ids < 2^31 keep
SAMPLE_MOD = 1 << 32       # the product inside int64/BIGINT range
SAMPLE_PCT = 10
STRATA_PCT = {"en": 20, "de": 5, "fr": 5, "es": 5}  # default per-lang rates


def _sample_bucket(ids: np.ndarray) -> np.ndarray:
    """Deterministic 0..99 bucket per doc_id, identical in numpy and SQL
    BIGINT arithmetic (no float, no library hash)."""
    ids = np.asarray(ids, np.int64)
    return ((ids * np.int64(SAMPLE_MULT)) % np.int64(SAMPLE_MOD)) % np.int64(100)


def _sample_bucket_sql() -> str:
    return f"((doc_id * {SAMPLE_MULT}) % {SAMPLE_MOD}) % 100"


def sample_bernoulli(docs_ds, pct: int = SAMPLE_PCT):
    """Deterministic ~pct% Bernoulli sample of the corpus: (doc_id, bucket)
    for every doc whose hash bucket < pct.

    Scale shape: a pure per-batch filter — no shuffle, no state, no
    randomness (reproducible across retries/resumes, which row-level RNG
    sampling is not under Ray's task re-execution)."""
    def part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        bk = _sample_bucket(ids)
        m = bk < pct
        return pa.table({"doc_id": ids[m], "bucket": bk[m]})

    return (docs_ds.map_batches(part, batch_format="pyarrow")
            .materialize()  # mat() rule
            .sort("doc_id"))


def sample_bernoulli_sql(pct: int = SAMPLE_PCT) -> str:
    b = _sample_bucket_sql()
    return f"""
SELECT doc_id, {b} AS bucket FROM documents
WHERE {b} < {pct} ORDER BY doc_id
"""


MIX_WEIGHT_MOD = 4  # integer source weights 1..4 from the source-name hash


def mixture_rebalance(docs_ds):
    """Domain-mixture rebalancing: deterministically downsample
    over-represented sources so the surviving corpus approaches target
    per-source weights -> (doc_id, source) sorted.  Weights are derived
    from the source NAME (w_s = 1 + md5_u64(source) % 4) so the operator
    is defined for any corpus with no side-channel config and the SQL
    oracle can mirror them exactly.

    Exact arithmetic contract: with W = Σ w_s, the feasible total is
    T = min_s floor(n_s·W / w_s) (pure int64), each source's acceptance
    threshold is floor(1e6 · (w_s·T) / (W·n_s)) — ONE float64
    multiply-then-divide-then-floor in the identical order on both sides,
    hence bitwise — and a doc survives iff its md5 bucket in 1e6 space
    (md5_u64(doc_id-as-string) % 1e6, fully mixed; see the inline note on
    why the Knuth-mod trick is NOT uniform at this modulus) clears its
    source's threshold.  No source exceeds threshold 1e6 by construction
    (w_s·T ≤ n_s·W), so the binding source keeps everything.

    Scale shape: pass 1 is a sources-sized aggregate (per-block
    value_counts partials, one tiny groupby, take_all of ≤|sources|
    rows — the bm25 corpus-stats precedent); the thresholds ride into
    pass 2's pure filter map as a closure dict, looked up per-batch via
    dictionary_encode (|uniques| ≤ |sources| python steps per batch).
    No corpus-sized shuffle besides the canonical output sort."""
    def part(batch: pa.Table) -> pa.Table:
        # NULL sources are dropped (oracle semantics: the JOIN on source
        # never matches a NULL); without this, value_counts propagates
        # the null into a group row and md5_u64(None) raises
        vc = pc.value_counts(pc.drop_null(_text_col(batch, "source")))
        return pa.table({"source": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    rows = (mat(docs_ds.map_batches(part, batch_format="pyarrow"))
            .groupby("source").sum("c").take_all())  # ≤ |sources| rows
    if not rows:  # empty corpus: the oracle returns an empty relation
        import ray.data as _rd
        return _rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string())}))
    src = np.array([r["source"] for r in rows], dtype=object)
    ns = np.array([r["sum(c)"] for r in rows], dtype=np.int64)
    w = (md5_u64(src) % np.uint64(MIX_WEIGHT_MOD)).astype(np.int64) + 1
    W = int(w.sum())
    T = int(np.min(ns * W // w))
    thr = np.floor((1_000_000.0 * (w * T).astype(np.float64))
                   / (W * ns).astype(np.float64)).astype(np.int64)
    thr_map = {s: int(t) for s, t in zip(src, thr)}

    def filt(batch: pa.Table) -> pa.Table:
        col = _text_col(batch, "source")
        if col.null_count:  # NULL source rows never match the JOIN
            valid = pc.is_valid(col)
            batch = batch.filter(valid)
            col = col.filter(valid)
        ids = batch["doc_id"].to_numpy()
        d = col.dictionary_encode()
        tu = np.array([thr_map[s] for s in
                       np.asarray(d.dictionary, dtype=object)], np.int64)
        t = tu[d.indices.to_numpy()] if len(ids) else np.zeros(0, np.int64)
        # md5 bucket, not the Knuth-mod trick: consecutive ids under
        # (id·2654435761 mod 2^32) mod 1e6 form a strided progression
        # whose sub-1e6 residues are far from uniform (measured 2.1%
        # acceptance at a 62500/1e6 threshold); md5 mixes fully and the
        # oracle mirrors it exactly
        b6 = (md5_u64(ids.astype("U").astype(object))
              % np.uint64(1_000_000)).astype(np.int64)
        keep = pa.array(b6 < t)
        return pa.table({"doc_id": ids[np.asarray(keep)],
                         "source": col.filter(keep)})

    return (docs_ds.map_batches(filt, batch_format="pyarrow")
            .materialize()  # mat() rule
            .sort("doc_id"))


def mixture_rebalance_sql() -> str:
    wexpr = f"1 + CAST({md5_u64_sql('source')} % {MIX_WEIGHT_MOD} AS BIGINT)"
    return f"""
WITH n AS (SELECT source, COUNT(*) AS ns, {wexpr} AS w
           FROM documents GROUP BY source),
tw AS (SELECT CAST(SUM(w) AS BIGINT) AS wsum FROM n),
t AS (SELECT MIN((ns * tw.wsum) // n.w) AS tot FROM n, tw),
thr AS (SELECT source,
               CAST(floor((1000000.0 * (n.w * t.tot)) / (tw.wsum * ns))
                    AS BIGINT) AS thr
        FROM n, tw, t)
SELECT d.doc_id, d.source
FROM documents d JOIN thr USING (source)
WHERE CAST({md5_u64_sql("CAST(d.doc_id AS VARCHAR)")} % 1000000 AS BIGINT)
      < thr.thr
ORDER BY d.doc_id
"""


def sample_stratified(docs_ds, strata_pct: dict | None = None):
    """Per-language sampling rates (lang -> pct, unlisted langs dropped):
    the standard rebalancing move for a multilingual training mix.
    Same deterministic bucket as sample_bernoulli; the per-row rate is a
    vectorized lookup on the lang column (no shuffle)."""
    strata = dict(STRATA_PCT if strata_pct is None else strata_pct)
    langs = sorted(strata)

    def part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        lang = batch["lang"]
        lang = lang.combine_chunks() if isinstance(lang, pa.ChunkedArray) else lang
        rate = np.zeros(len(ids), np.int64)
        for lg in langs:
            rate[np.asarray(pc.equal(lang, lg))] = strata[lg]
        m = _sample_bucket(ids) < rate
        return pa.table({"doc_id": ids[m],
                         "lang": lang.filter(pa.array(m))})

    return (docs_ds.map_batches(part, batch_format="pyarrow")
            .materialize()  # mat() rule
            .sort("doc_id"))


def sample_stratified_sql(strata_pct: dict | None = None) -> str:
    strata = dict(STRATA_PCT if strata_pct is None else strata_pct)
    cases = " ".join(f"WHEN lang = '{lg}' THEN {strata[lg]}"
                     for lg in sorted(strata))
    return f"""
SELECT doc_id, lang FROM documents
WHERE {_sample_bucket_sql()} < (CASE {cases} ELSE 0 END)
ORDER BY doc_id
"""


# ------------------------------------------------ composite curation filter

FILTER_MIN_TOKENS = 40  # drops ~1/3 of the synthetic corpus (nt p25=32)
FILTER_STOP_NUM = 1     # keep docs with n_stopwords/n_tokens <= 1/10,
FILTER_STOP_DEN = 10    # compared integer-side (no float boundary)


def corpus_filter(docs_ds, min_tokens: int = FILTER_MIN_TOKENS,
                  stop_num: int = FILTER_STOP_NUM,
                  stop_den: int = FILTER_STOP_DEN):
    """Flagship curation pipeline: quality gate (token count + stopword
    ratio, compared as integers) -> language gate (lang_id heuristic ==
    'en') -> exact-dedup keep-first.  Output: surviving doc_ids.

    Scale shape: ONE fused per-batch pass computes tokens, stopword count,
    lang prediction and md5 fingerprint and drops failing rows before any
    exchange; the only shuffle is the dedup groupby(fingerprint), carrying
    one (fingerprint, min_id) row per distinct surviving fingerprint per
    block."""
    def gate(batch: pa.Table) -> pa.Table:
        text = _text_col(batch)
        ids = batch["doc_id"].to_numpy()
        toks = _token_lists(text)
        lens = np.asarray(pc.list_value_length(toks), np.int64)
        off = _segment_offsets(lens)
        stop = np.asarray(pc.is_in(toks.flatten(),
                                   value_set=pa.array(STOPWORDS)))
        n_stop = _segment_sum(stop.astype(np.int64), off)
        lang = lang_id_batch(batch)["lang_pred"]
        keep = ((lens >= min_tokens)
                & (n_stop * stop_den <= lens * stop_num)
                & np.asarray(pc.equal(lang, "en")))
        kept = text.filter(pa.array(keep))
        fp = np.array([hashlib.md5(s.encode()).hexdigest()
                       for s in kept.to_pylist()], dtype=object)
        kid = ids[keep]
        if len(fp):  # per-batch partial: min id per fingerprint
            u, inv = np.unique(fp, return_inverse=True)
            mid = np.full(len(u), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(mid, inv, kid)
        else:
            u, mid = fp, kid
        return pa.table({"fp": pa.array(u, pa.string()),
                         "doc_id": mid.astype(np.int64)})

    def emit(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["min(doc_id)"]})

    return (mat(docs_ds.map_batches(gate, batch_format="pyarrow"))
            .groupby("fp").min("doc_id")
            .map_batches(emit, batch_format="pyarrow")
            .materialize()  # mat() rule
            .sort("doc_id"))


def corpus_filter_sql(min_tokens: int = FILTER_MIN_TOKENS,
                      stop_num: int = FILTER_STOP_NUM,
                      stop_den: int = FILTER_STOP_DEN) -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    lang_case = lang_id_sql().split("CASE", 1)[1].split("END", 1)[0]
    return f"""
WITH s AS (
  SELECT doc_id, md5(text) AS fp,
         len(string_split(text, ' ')) AS nt,
         len(list_filter(string_split(text, ' '), t -> t IN ({stop}))) AS ns,
         CASE{lang_case}END AS lang_pred
  FROM documents)
SELECT min(doc_id) AS doc_id FROM s
WHERE nt >= {min_tokens} AND ns * {stop_den} <= nt * {stop_num}
      AND lang_pred = 'en'
GROUP BY fp ORDER BY doc_id
"""


# ---------------------------------------------------- group-wise quantiles

GROUP_QS = (25, 50, 75, 90)  # percent, emitted as p25/p50/p75/p90 columns


def group_quantiles(docs_ds, group_col: str = "lang",
                    value_col: str = "n_chars"):
    """EXACT per-group quantiles of an integer column without a global
    sort: per-block (group, value, count) histogram partials, one
    histogram-sized groupby, and index arithmetic on cumulative counts.
    DuckDB quantile_disc semantics (probed + pinned in pytest): the
    1-indexed sorted element at ceil(q·n).

    Scale shape: the exchange carries one row per distinct (group, value)
    pair per block — bounded by the value domain, not the row count (the
    classic histogram-sketch quantile, exact because the domain is
    integer).  Output: one row per group (group, p25, p50, p75, p90)."""
    def part(batch: pa.Table) -> pa.Table:
        g = np.asarray(_text_col(batch, group_col), dtype=object)
        v = batch[value_col].to_numpy()
        order = np.lexsort((v, g))
        g_s, v_s = g[order], v[order]
        new = np.empty(len(g_s), bool)
        if len(g_s):
            new[0] = True
            new[1:] = (g_s[1:] != g_s[:-1]) | (v_s[1:] != v_s[:-1])
        runs = np.flatnonzero(new)
        c = np.append(runs[1:], len(g_s)) - runs
        return pa.table({group_col: pa.array(g_s[runs], pa.string()),
                         "v": v_s[runs], "c": c.astype(np.int64)})

    def quant(group: pa.Table) -> pa.Table:
        name = group[group_col][0].as_py()
        v = group["v"].to_numpy()
        c = group["c"].to_numpy()
        order = np.argsort(v)
        v, c = v[order], c[order]
        # merge duplicate values across blocks
        uv, start = np.unique(v, return_index=True)
        cum = np.cumsum(np.add.reduceat(c, start))
        n = int(cum[-1])
        cols = {group_col: pa.array([name], pa.string())}
        for pq in GROUP_QS:
            k = int(np.ceil(pq / 100.0 * n))
            cols[f"p{pq}"] = pa.array(
                [int(uv[np.searchsorted(cum, max(k, 1), side="left")])],
                pa.int64())
        return pa.table(cols)

    return (mat(docs_ds.map_batches(part, batch_format="pyarrow"))
            .groupby(group_col).map_groups(quant, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort(group_col))


def group_quantiles_sql(group_col: str = "lang",
                        value_col: str = "n_chars") -> str:
    cols = ",\n       ".join(
        f"CAST(quantile_disc({value_col}, {pq / 100.0}) AS BIGINT) AS p{pq}"
        for pq in GROUP_QS)
    return f"""
SELECT {group_col},
       {cols}
FROM documents GROUP BY {group_col} ORDER BY {group_col}
"""


# ------------------------------------------------- BPE-ish subword counts

SUBWORD_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # alpha runs | digit runs
_ALPHA_PAT, _NUM_PAT, _OTHER_PAT = (                # | single punct
    r"[A-Za-z]+", r"[0-9]+", r"[^A-Za-z0-9\s]")


def subword_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_subtokens, n_alpha, n_num, n_other) — the BPE-ish
    pre-tokenizer count (alpha runs, digit runs, single punctuation): the
    token-budget estimate a training pipeline runs before real BPE.  Pure
    per-batch map over pyarrow's RE2 kernel; DuckDB mirrors with
    regexp_extract_all (also RE2 — counts agree exactly, pinned in
    pytest on punctuation/unicode edge cases)."""
    text = _text_col(batch)

    def cnt(pat):
        return np.asarray(pc.count_substring_regex(text, pat), np.int64)

    return pa.table({
        "doc_id": batch["doc_id"],
        "n_subtokens": cnt(SUBWORD_PAT),
        "n_alpha": cnt(_ALPHA_PAT),
        "n_num": cnt(_NUM_PAT),
        "n_other": cnt(_OTHER_PAT),
    })


def subword_stats_sql() -> str:
    def n(pat):
        # DuckDB single-quoted literals do NOT process backslashes: the
        # pattern goes in verbatim (\s stays \s)
        return f"len(regexp_extract_all(text, '{pat}'))"
    return f"""
SELECT doc_id,
       {n(SUBWORD_PAT)} AS n_subtokens,
       {n(_ALPHA_PAT)} AS n_alpha,
       {n(_NUM_PAT)} AS n_num,
       {n(_OTHER_PAT)} AS n_other
FROM documents ORDER BY doc_id
"""


# ----------------------------------------------------- train/val/test split

SPLIT_PCT = {"train": 80, "val": 10, "test": 10}  # bucket thresholds


def dataset_split(docs_ds, split_pct: dict | None = None):
    """Deterministic train/val/test assignment: (doc_id, split) from the
    same hash bucket as sample_bernoulli — stable across runs, retries
    and resumes (row-level RNG is none of those), and disjoint-complete
    by construction.  Pure per-batch map, no shuffle."""
    pct = dict(SPLIT_PCT if split_pct is None else split_pct)
    names = sorted(pct)  # deterministic CASE order
    edges = np.cumsum([pct[n] for n in names])
    assert edges[-1] == 100

    def part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        bk = _sample_bucket(ids)
        sel = np.searchsorted(edges, bk, side="right")
        return pa.table({
            "doc_id": ids,
            "split": pa.array(np.array(names, dtype=object)[sel],
                              pa.string()),
        })

    return (docs_ds.map_batches(part, batch_format="pyarrow")
            .materialize()  # mat() rule
            .sort("doc_id"))


def dataset_split_sql(split_pct: dict | None = None) -> str:
    pct = dict(SPLIT_PCT if split_pct is None else split_pct)
    names = sorted(pct)
    edges = np.cumsum([pct[n] for n in names])
    b = _sample_bucket_sql()
    cases = " ".join(f"WHEN {b} < {int(e)} THEN '{n}'"
                     for n, e in zip(names, edges))
    return f"""
SELECT doc_id, CASE {cases} END AS split
FROM documents ORDER BY doc_id
"""


# ------------------------------------------- near-dup connected components

_CC_PHI = np.uint64(0x9E3779B97F4A7C15)


def _cc_bucket_of(ids: np.ndarray, nbuckets: int) -> np.ndarray:
    """Node -> home bucket (shared by edge routing and label ownership)."""
    return ((ids.astype(np.uint64) * _CC_PHI) >> np.uint64(32)
            ).astype(np.int64) % np.int64(nbuckets)


def dup_components(pairs_ds, max_rounds: int = 50,
                   nbuckets: int | None = None,
                   round_stats: list | None = None):
    """Connected components over near-duplicate PAIR edges — the step
    that turns any pair-producing dedup (exact/Jaccard/MinHash/SimHash/
    cosine) into canonical-document clusters: (doc_id, cluster_id =
    min doc_id in the component), sorted by doc_id.

    Edge-resident min-label propagation (the documented cluster upgrade
    over the round-2 design, which re-shipped the edge list through a
    hash join EVERY round).  The symmetric edge list is co-partitioned by
    hash(u) ONCE into `nbuckets` bucket actors — pushed straight from the
    pair-reading tasks, so each edge row crosses the wire exactly once
    and no groupby shuffle runs at all.  Each actor owns its bucket's
    edges (with the per-target group structure precomputed: edge order
    never changes, so the per-round reduceat needs no re-sort) AND the
    labels of the nodes homed there.  A round exchanges only node-sized
    tables between actors:

      1. prop:  per bucket, min label per distinct neighbor v (offers,
         pre-minimized before they move) + pointer-jump requests
         (lbl(u) -> who asks), each grouped by the target's home bucket;
      2. reply: the label owner resolves lbl(lbl(u)) — the shortcutting
         that makes rounds O(log diameter), asserted by the 300-chain
         pytest;
      3. apply: per bucket, new lbl(u) = min(lbl, inbound offers/replies)
         via np.minimum.at; returns the bucket's label sum.

    The driver touches only ObjectRefs plus B integers per round and
    stops when the total label sum — strictly decreasing until fixpoint —
    stops falling; max_rounds guards pathology as an assertion, not
    silent truncation.  Retry safety: a re-executed push task delivers
    duplicate edges, which min-propagation is insensitive to.  The bucket
    actors are num_cpus=0 state holders (per-round bursts are short and
    the CPU pool stays free for the pipelines that feed this operator);
    on a dedicated cluster give them real CPU reservations and raise
    `nbuckets` to the node count.  The final gather is node-sized (pair
    endpoints only — tiny relative to the corpus); at extreme label-table
    sizes have each actor write its bucket to parquet instead."""
    import pyarrow as pa
    import ray

    if nbuckets is None:
        # one label-holding actor per ~4 CPUs: enough buckets that no
        # actor's label table outgrows a node at scale, few enough that
        # the per-round B^2 inter-actor exchange stays cheap
        from .sizing import cluster_cpus
        nbuckets = max(4, cluster_cpus() // 4)
    B = int(nbuckets)

    @ray.remote(num_cpus=0)
    class _CCBucket:
        def __init__(self, nbuckets: int):
            self.B = nbuckets
            self._eu, self._ev = [], []

        def add_edges(self, u: np.ndarray, v: np.ndarray) -> None:
            if self._eu is None:
                # lineage-re-executed push arriving after finalize():
                # the edge tables are already built and a duplicate
                # edge batch cannot change the components — drop it
                return
            self._eu.append(u)
            self._ev.append(v)

        def finalize(self) -> int:
            eu = (np.concatenate(self._eu) if self._eu
                  else np.empty(0, np.int64))
            ev = (np.concatenate(self._ev) if self._ev
                  else np.empty(0, np.int64))
            self._eu = self._ev = None
            hv = _cc_bucket_of(ev, self.B)
            order = np.lexsort((ev, hv))
            eu, ev, hv = eu[order], ev[order], hv[order]
            self.tslice = np.searchsorted(hv, np.arange(self.B + 1))
            # per target bucket: distinct neighbors + reduceat starts
            # (fixed for the whole run — edges never move again)
            self.tgt = []
            for c in range(self.B):
                s, e = self.tslice[c], self.tslice[c + 1]
                vv = ev[s:e]
                first = np.empty(len(vv), bool)
                if len(vv):
                    first[0] = True
                    first[1:] = vv[1:] != vv[:-1]
                self.tgt.append((vv[first], np.flatnonzero(first)))
            self.u = np.unique(eu)
            self.lbl = self.u.copy()
            self.pos_eu = np.searchsorted(self.u, eu)
            return len(self.u)

        def prop(self):
            """-> B offer slots (v, min lbl) + B jump-request slots
            (l, asking u), each destined for one bucket."""
            le = self.lbl[self.pos_eu]
            out = []
            for c in range(self.B):
                s, e = self.tslice[c], self.tslice[c + 1]
                vu, starts = self.tgt[c]
                out.append((vu, np.minimum.reduceat(le[s:e], starts)
                            if len(vu) else np.empty(0, np.int64)))
            hl = _cc_bucket_of(self.lbl, self.B)
            order = np.argsort(hl, kind="stable")
            l_s, u_s = self.lbl[order], self.u[order]
            js = np.searchsorted(hl[order], np.arange(self.B + 1))
            out.extend((l_s[js[c]:js[c + 1]], u_s[js[c]:js[c + 1]])
                       for c in range(self.B))
            return out

        def reply(self, *jreqs):
            """Resolve lbl(l) for inbound jump requests; -> B reply slots
            (asking u, lbl(l)) grouped by the asker's home bucket."""
            if not jreqs:
                z = np.empty(0, np.int64)
                return [(z, z)] * self.B
            l = np.concatenate([j[0] for j in jreqs])
            asker = np.concatenate([j[1] for j in jreqs])
            # every label value is itself a node, homed here by hash(l)
            val = self.lbl[np.searchsorted(self.u, l)]
            ha = _cc_bucket_of(asker, self.B)
            order = np.argsort(ha, kind="stable")
            a_s, v_s = asker[order], val[order]
            rs = np.searchsorted(ha[order], np.arange(self.B + 1))
            return [(a_s[rs[c]:rs[c + 1]], v_s[rs[c]:rs[c + 1]])
                    for c in range(self.B)]

        def apply(self, *inbound):
            tgts = [m[0] for m in inbound if len(m[0])]
            vals = [m[1] for m in inbound if len(m[0])]
            moved = int(sum(len(t) for t in tgts))
            if tgts:
                np.minimum.at(self.lbl,
                              np.searchsorted(self.u, np.concatenate(tgts)),
                              np.concatenate(vals))
            return int(self.lbl.sum()), moved

        def labels_table(self):
            return pa.table({"doc_id": self.u, "cluster_id": self.lbl})

    actors = [_CCBucket.remote(B) for _ in range(B)]

    def push(batch: pa.Table) -> pa.Table:
        a = batch["a_id"].to_numpy()
        b = batch["b_id"].to_numpy()
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        hb = _cc_bucket_of(u, B)
        order = np.argsort(hb, kind="stable")
        u, v = u[order], v[order]
        cuts = np.searchsorted(hb[order], np.arange(B + 1))
        waits = [actors[c].add_edges.remote(u[cuts[c]:cuts[c + 1]],
                                            v[cuts[c]:cuts[c + 1]])
                 for c in range(B) if cuts[c + 1] > cuts[c]]
        ray.get(waits)  # edge delivered before this task reports done
        return pa.table({"n": np.array([len(a)], np.int64)})

    pairs_ds.map_batches(push, batch_format="pyarrow").count()
    n_nodes = sum(ray.get([a.finalize.remote() for a in actors]))
    if n_nodes == 0:
        for a in actors:
            ray.kill(a)
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "cluster_id": pa.array([], pa.int64())}))

    prev = None
    for rnd in range(max_rounds):
        slots = [actors[b].prop.options(num_returns=2 * B).remote()
                 for b in range(B)]
        replies = [actors[c].reply.options(num_returns=B).remote(
                       *[slots[b][B + c] for b in range(B)])
                   for c in range(B)]
        results = ray.get([actors[c].apply.remote(
                               *[slots[b][c] for b in range(B)],
                               *[replies[b][c] for b in range(B)])
                           for c in range(B)])
        cur = sum(s for s, _ in results)
        moved = sum(m for _, m in results)
        if round_stats is not None:
            # evidence that per-round exchange is label-sized, not
            # edge-sized: `moved` counts every (node, label) row that
            # crossed a bucket boundary this round
            round_stats.append({"round": rnd, "label_sum": cur,
                                "moved_rows": moved,
                                "n_nodes": n_nodes})
        if cur == prev:
            break
        prev = cur
    else:
        raise AssertionError(f"no fixpoint after {max_rounds} rounds")

    tables = ray.get([a.labels_table.remote() for a in actors])
    # from_arrow first: it copies the tables into driver-owned objects,
    # so killing the owning actors afterwards can never unpin buffers
    out = ray.data.from_arrow([t for t in tables if len(t)])
    for a in actors:
        ray.kill(a)
    return out.sort("doc_id")


def dup_components_sql(tau: float = JACCARD_TAU, k: int = SHINGLE_K) -> str:
    """Recursive-CTE closure over the exact-Jaccard pair table (the
    engine side runs over ngram_jaccard_pairs output)."""
    inner = ngram_jaccard_sql(tau, k).strip().rstrip()
    return f"""
WITH RECURSIVE pairs AS (
  SELECT a_id, b_id FROM ({inner}) _p
),
e AS (SELECT a_id u, b_id v FROM pairs UNION ALL SELECT b_id, a_id FROM pairs),
lab(node, lbl) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.v, lab.lbl FROM e JOIN lab ON lab.node = e.u
)
SELECT node AS doc_id, min(lbl) AS cluster_id FROM lab GROUP BY node
ORDER BY doc_id
"""


# ----------------------------------------------------------- grouped top-k

GROUPED_TOPK_K = 5


def grouped_topk(docs_ds, group_col: str = "lang",
                 order_col: str = "n_chars", k: int = GROUPED_TOPK_K):
    """Top-k rows per group by (order_col DESC, doc_id ASC) — the
    "best examples per stratum" selection.  (group, rank, doc_id, value).

    Scale shape: the order is TOTAL (doc_id breaks ties), so each block's
    per-group top-k is a provably sufficient partial — the exchange
    carries ≤ k rows per (group, block) and the per-group finisher sorts
    ≤ k·blocks rows."""
    def part(batch: pa.Table) -> pa.Table:
        g = np.asarray(_text_col(batch, group_col), dtype=object)
        v = batch[order_col].to_numpy()
        d = batch["doc_id"].to_numpy()
        order = np.lexsort((d, -v, g))
        g_s, v_s, d_s = g[order], v[order], d[order]
        new = np.empty(len(g_s), bool)
        if len(g_s):
            new[0] = True
            new[1:] = g_s[1:] != g_s[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        pos = np.arange(len(g_s)) - starts[seg]
        keep = pos < k
        return pa.table({group_col: pa.array(g_s[keep], pa.string()),
                         "doc_id": d_s[keep], order_col: v_s[keep]})

    def final(group: pa.Table) -> pa.Table:
        v = group[order_col].to_numpy()
        d = group["doc_id"].to_numpy()
        order = np.lexsort((d, -v))[:k]
        name = group[group_col][0].as_py()
        return pa.table({
            group_col: pa.array([name] * len(order), pa.string()),
            "rank": np.arange(1, len(order) + 1, dtype=np.int64),
            "doc_id": d[order],
            order_col: v[order],
        })

    return (mat(docs_ds.map_batches(part, batch_format="pyarrow"))
            .groupby(group_col).map_groups(final, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort([group_col, "rank"]))


def grouped_topk_sql(group_col: str = "lang", order_col: str = "n_chars",
                     k: int = GROUPED_TOPK_K) -> str:
    return f"""
SELECT {group_col}, rank, doc_id, {order_col} FROM (
  SELECT {group_col}, doc_id, {order_col},
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY {order_col} DESC, doc_id) AS rank
  FROM documents)
WHERE rank <= {k} ORDER BY {group_col}, rank
"""


# ------------------------------------------------------- text normalization

def normalize_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, norm_text, changed): canonical text form — lowercase,
    whitespace runs collapsed to single spaces, trimmed — the step before
    any hash-based dedup on noisy corpora.  Three Arrow kernels per batch
    (utf8_lower, RE2 replace, trim), zero Python-object round trips;
    DuckDB mirrors with lower + regexp_replace(..., 'g') + trim (both
    RE2, parity pinned in pytest edge cases)."""
    text = _text_col(batch)
    norm = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", " "))
    return pa.table({
        "doc_id": batch["doc_id"],
        "norm_text": norm,
        "changed": pc.not_equal(norm, text),
    })


def normalize_sql() -> str:
    return r"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text,
       trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> text AS changed
FROM documents ORDER BY doc_id
"""


def dedup_corpus(docs_ds, tau: float = JACCARD_TAU, k: int = SHINGLE_K):
    """End-to-end near-dup canonicalization — the composition a corpus
    owner actually runs: exact n-gram Jaccard pairs -> connected
    components -> keep each cluster's minimum doc_id, drop the rest.
    -> surviving (doc_id) rows, sorted.

    Scale shape: the component label table is node-sized (pair
    endpoints only), so the drop set broadcasts via ray.put and the
    corpus filter is a pure per-batch np.isin — the corpus itself never
    shuffles.  Swap the pair source for minhash_lsh_pairs at scales
    where exact Jaccard's candidate bound bites (module doc)."""
    import ray

    comp = dup_components(ngram_jaccard_pairs(docs_ds, tau, k))
    drops = []
    for b in comp.iter_batches(batch_size=None, batch_format="pyarrow"):
        d = b["doc_id"].to_numpy()
        c = b["cluster_id"].to_numpy()
        drops.append(d[d != c])
    drop = np.unique(np.concatenate(drops)) if drops else \
        np.zeros(0, np.int64)
    drop_ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        mask = ~np.isin(ids, ray.get(drop_ref))
        return pa.table({"doc_id": ids[mask]})

    return (docs_ds.map_batches(keep, batch_format="pyarrow")
            .materialize()  # mat() rule
            .sort("doc_id"))


def dedup_corpus_sql(tau: float = JACCARD_TAU, k: int = SHINGLE_K) -> str:
    comp = dup_components_sql(tau, k).strip()
    return f"""
SELECT doc_id FROM documents
WHERE doc_id NOT IN (
  SELECT doc_id FROM ({comp}) c WHERE c.doc_id != c.cluster_id
)
ORDER BY doc_id
"""


# ----------------------------------------------- per-source duplication rate

def dup_rate_by_source(docs_ds, nbits: int = 8):
    """-> per source (source, n_docs, n_dup_docs, dup_rate): how much of
    each source's text is duplicated ANYWHERE in the corpus (md5
    equality, cross-source) — the per-provider contamination audit a
    curation pipeline runs before mixing sources.

    Shape: each block collapses to distinct (fingerprint, source, count)
    rows; ONE exchange groups them by a coarse hash bucket of the
    fingerprint (all rows of a fingerprint share its bucket, so the
    global count>1 test is exact in-bucket; vectorized np.unique, no
    per-fingerprint Python — the _coarse_bucket lesson); per-bucket
    per-source partials are metadata-sized and tree-combine in a final
    repartition(1).  The doc texts themselves never shuffle — only
    (16-byte fp, source, count) triples."""
    def partial(batch: pa.Table) -> pa.Table:
        text = _text_col(batch)
        fp = np.array([hashlib.md5(s.encode()).hexdigest()
                       for s in text.to_pylist()], dtype=object)
        src_col = _text_col(batch, "source")
        # a NULL source would silently become the string "None" here
        # while SQL GROUP BY keeps a distinct NULL group — fail loudly
        # instead (the mixture_rebalance null-source precedent)
        if src_col.null_count:
            raise ValueError("dup_rate_by_source: NULL source values")
        src = np.asarray(src_col, dtype=object)
        key = np.char.add(np.char.add(fp.astype(str), "\x00"),
                          src.astype(str))
        uk, idx, inv = np.unique(key, return_index=True,
                                 return_inverse=True)
        u64 = np.array([int(f[:16], 16) for f in fp[idx]], np.uint64)
        return pa.table({
            "bk": _coarse_bucket(u64, nbits),
            "fingerprint": pa.array(fp[idx], pa.string()),
            "source": pa.array(src[idx], pa.string()),
            "c": np.bincount(inv, minlength=len(uk)).astype(np.int64),
        })

    def per_bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "nd": pa.array([], pa.int64())})
        fp = np.asarray(group["fingerprint"], dtype=object)
        src = np.asarray(group["source"], dtype=object)
        c = group["c"].to_numpy()
        _, inv = np.unique(fp, return_inverse=True)
        tot = np.bincount(inv, weights=c).astype(np.int64)
        dup = tot[inv] > 1
        us, sinv = np.unique(src, return_inverse=True)
        return pa.table({
            "source": pa.array(us, pa.string()),
            "n": np.bincount(sinv, weights=c,
                             minlength=len(us)).astype(np.int64),
            "nd": np.bincount(sinv, weights=c * dup,
                              minlength=len(us)).astype(np.int64),
        })

    def finalize(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["source"], dtype=object)
        us, sinv = np.unique(src, return_inverse=True)
        n = np.bincount(sinv, weights=batch["n"].to_numpy(),
                        minlength=len(us)).astype(np.int64)
        nd = np.bincount(sinv, weights=batch["nd"].to_numpy(),
                         minlength=len(us)).astype(np.int64)
        return pa.table({
            "source": pa.array(us, pa.string()),
            "n_docs": n,
            "n_dup_docs": nd,
            "dup_rate": nd.astype(np.float64) / n.astype(np.float64),
        })

    return (mat(docs_ds.map_batches(partial, batch_format="pyarrow"))
            .groupby("bk").map_groups(per_bucket, batch_format="pyarrow")
            .repartition(1)
            .map_batches(finalize, batch_format="pyarrow",
                         batch_size=None))


def dup_rate_by_source_sql() -> str:
    return """
WITH f AS (SELECT source, md5(text) AS fp FROM documents),
tot AS (SELECT fp, count(*) AS c FROM f GROUP BY fp)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN tot.c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       CAST(sum(CASE WHEN tot.c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS dup_rate
FROM f JOIN tot USING (fp)
GROUP BY source ORDER BY source
"""


# ------------------------------------- physical fingerprint store + delta

FP_STORE_BITS = 6  # 64 hive buckets


def fingerprint_build_store(docs_ds, store_dir: str,
                            nbits: int = FP_STORE_BITS) -> str:
    """Materialize the corpus's exact-dedup state as a bucketed parquet
    store: one hive partition (bucket=N/) per fingerprint-hash bucket,
    rows (fingerprint, keep_id = min doc_id).  The ingest-time half of
    incremental dedup: at 100 TB the existing corpus is checked against
    ONCE and new shards query the store — the text itself never moves
    again (the ivf_build_store / bm25_build_store discipline, applied
    to dedup state)."""
    def partial(batch: pa.Table) -> pa.Table:
        text = _text_col(batch)
        fp = np.array([hashlib.md5(s.encode()).hexdigest()
                       for s in text.to_pylist()], dtype=object)
        ids = batch["doc_id"].to_numpy()
        uniq, inv = np.unique(fp, return_inverse=True)
        mn = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, ids)
        u64 = np.array([int(f[:16], 16) for f in uniq], np.uint64)
        return pa.table({
            "bucket": _coarse_bucket(u64, nbits),
            "fingerprint": pa.array(uniq, pa.string()),
            "keep_id": mn,
        })

    def merge(group: pa.Table) -> pa.Table:
        fp = np.asarray(group["fingerprint"], dtype=object)
        ids = group["keep_id"].to_numpy()
        bk = group["bucket"].to_numpy()
        uniq, inv = np.unique(fp, return_inverse=True)
        mn = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, ids)
        first = np.zeros(len(uniq), np.int64)
        np.maximum.at(first, inv, np.arange(len(fp)))
        return pa.table({
            "bucket": bk[first],
            "fingerprint": pa.array(uniq, pa.string()),
            "keep_id": mn,
        })

    (mat(docs_ds.map_batches(partial, batch_format="pyarrow"))
     .groupby("bucket").map_groups(merge, batch_format="pyarrow")
     .write_parquet(store_dir, partition_cols=["bucket"]))
    return store_dir


def dedup_against_store(new_docs_ds, store_dir: str,
                        nbits: int = FP_STORE_BITS):
    """Incremental exact dedup: which NEW documents already exist in a
    fingerprint_build_store corpus -> (doc_id, is_dup, keep_id
    nullable), sorted by doc_id.

    Scale shape: new docs collapse per block to (bucket, doc_id, fp)
    rows; ONE bucket exchange groups them, and each group reads ONLY
    its own store partition (partition-pruned at the directory level —
    non-touched buckets' bytes stay on disk, exactly the
    ivf_topk_store read discipline).  Membership resolves on the
    uint64 fingerprint prefix via searchsorted with a full-string
    verify on hits (no Python-object binary search)."""
    import glob as _glob
    import os

    def route(batch: pa.Table) -> pa.Table:
        text = _text_col(batch)
        fp = np.array([hashlib.md5(s.encode()).hexdigest()
                       for s in text.to_pylist()], dtype=object)
        u64 = np.array([int(f[:16], 16) for f in fp], np.uint64)
        return pa.table({
            "bucket": _coarse_bucket(u64, nbits),
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fp, pa.string()),
        })

    def check(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "is_dup": pa.array([], pa.bool_()),
            "keep_id": pa.array([], pa.int64()),
        })
        n = len(group)
        if n == 0:
            return empty
        bk = int(group["bucket"][0].as_py())
        ids = group["doc_id"].to_numpy()
        fp = np.asarray(group["fingerprint"], dtype=object)
        part = os.path.join(store_dir, f"bucket={bk}")
        files = sorted(_glob.glob(os.path.join(part, "*.parquet")))
        if not files:
            return pa.table({
                "doc_id": ids,
                "is_dup": np.zeros(n, bool),
                "keep_id": pa.array([None] * n, pa.int64()),
            })
        st = pa.concat_tables([pq.read_table(f) for f in files])
        sfp = np.asarray(st["fingerprint"], dtype=object)
        skeep = st["keep_id"].to_numpy()
        s64 = np.array([int(f[:16], 16) for f in sfp], np.uint64)
        order = np.argsort(s64, kind="stable")
        s64_s, sfp_s, skeep_s = s64[order], sfp[order], skeep[order]
        q64 = np.array([int(f[:16], 16) for f in fp], np.uint64)
        lo = np.searchsorted(s64_s, q64, side="left")
        hi = np.searchsorted(s64_s, q64, side="right")
        pos_c = np.clip(lo, 0, max(0, len(s64_s) - 1))
        hit = (hi > lo)
        # 64-bit prefix match -> verify the full 128-bit hex string;
        # an equal-prefix RUN (distinct stored md5s colliding on the
        # top 64 bits — ~n²/2^65, but correctness is a contract) scans
        # its few entries
        hit &= np.where(hi - lo == 1, sfp_s[pos_c] == fp, True)
        keep = np.where(hit, skeep_s[pos_c], 0)
        multi = np.flatnonzero(hit & (hi - lo > 1))
        for i in multi:
            run = slice(lo[i], hi[i])
            m = np.flatnonzero(sfp_s[run] == fp[i])
            if len(m):
                keep[i] = skeep_s[lo[i] + m[0]]
            else:
                hit[i] = False
        return pa.table({
            "doc_id": ids,
            "is_dup": hit,
            "keep_id": pa.array(
                [int(k) if h else None for h, k in zip(hit, keep)],
                pa.int64()),
        })

    return (mat(new_docs_ds.map_batches(route, batch_format="pyarrow"))
            .groupby("bucket").map_groups(check, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort("doc_id"))


# --------------------------------------- physical near-dup (LSH) store

def neardup_build_store(docs_ds, store_dir: str, k: int = SHINGLE_K,
                        num_perms: int = MINHASH_PERMS,
                        bands: int = MINHASH_BANDS,
                        nbits: int = FP_STORE_BITS) -> str:
    """Materialize the corpus's NEAR-dup state as two hive-partitioned
    parquet tables under store_dir: bands/ (bucket=N -> (sh, doc_id)
    banded MinHash rows) and shingles/ (sbucket=M -> (doc_id, shingles))
    — the fingerprint_build_store discipline extended to LSH, so a new
    crawl shard finds its near-duplicates in the corpus without the
    corpus text ever moving again.  Band keys share _band_rows with the
    in-memory LSH, so the two paths bucket identically."""
    import os
    pa_, pb_ = _minhash_params(num_perms)

    sets_ds = mat(docs_ds.map_batches(
        lambda b: _shingle_table(b, k), batch_format="pyarrow"))

    def banded(batch: pa.Table) -> pa.Table:
        t = _band_rows(batch, num_perms, bands, pa_, pb_)
        key = t["sh"].to_numpy().view(np.uint64)
        return t.append_column("bucket", pa.array(
            _coarse_bucket(key, nbits)))

    sets_ds.map_batches(banded, batch_format="pyarrow").write_parquet(
        os.path.join(store_dir, "bands"), partition_cols=["bucket"])

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return batch.append_column("sbucket", pa.array(
            _coarse_bucket(ids.astype(np.uint64), nbits)))

    sets_ds.map_batches(shingle_rows, batch_format="pyarrow").write_parquet(
        os.path.join(store_dir, "shingles"), partition_cols=["sbucket"])
    return store_dir


#: broadcast cap for the new shard's shingle sets in
#: neardup_against_store (rows); the shard side is small by contract —
#: beyond this, route the shard's shingles through a doc-id-bucketed
#: exchange instead of a broadcast (the token_rarity fallback lesson).
NEARDUP_SHARD_MAX = 2_000_000


def neardup_against_store(new_docs_ds, store_dir: str,
                          tau: float = JACCARD_TAU, k: int = SHINGLE_K,
                          num_perms: int = MINHASH_PERMS,
                          bands: int = MINHASH_BANDS,
                          nbits: int = FP_STORE_BITS):
    """Incremental near-dup: which NEW documents are near-duplicates
    (exact Jaccard >= tau over k-shingles) of a neardup_build_store
    corpus -> (a_id = new doc, b_id = store doc, jacc), sorted.

    Scale shape: the new shard's banded rows group by band-key bucket
    and each group reads ONLY its own bands/ partition to form
    candidates (partition-pruned, like dedup_against_store); candidate
    verification groups by the STORE doc's shingle bucket and reads
    only those shingles/ partitions.  The new shard's shingle sets
    broadcast once (ray.put) — the shard is the small side by contract
    (capped at NEARDUP_SHARD_MAX rows, fail-loudly).  Precision is 1.0
    (every candidate re-verified with exact Jaccard); recall is the
    LSH operating point's, 1.0 on the test corpora (the
    sql_minhash_lsh precedent)."""
    import glob as _glob
    import os

    import ray

    pa_, pb_ = _minhash_params(num_perms)

    sets_ds = mat(new_docs_ds.map_batches(
        lambda b: _shingle_table(b, k), batch_format="pyarrow"))

    # broadcast the new shard's shingle sets (small side by contract)
    parts = [t for t in ray.get(sets_ds.to_arrow_refs()) if len(t)]
    n_shard = sum(len(t) for t in parts)
    if n_shard > NEARDUP_SHARD_MAX:
        raise ValueError(
            f"neardup_against_store: new shard has {n_shard} docs > "
            f"NEARDUP_SHARD_MAX={NEARDUP_SHARD_MAX}; route the shard "
            f"shingles through a bucketed exchange instead")
    shard: dict[int, np.ndarray] = {}
    for t in parts:
        ids = t["doc_id"].to_numpy()
        col = t["shingles"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        lens = np.asarray(pc.list_value_length(col), np.int64)
        flat = np.asarray(col.flatten(), np.uint64)
        off = _segment_offsets(lens)
        for i, d in enumerate(ids):
            shard[int(d)] = np.sort(flat[off[i]:off[i + 1]])
    shard_ref = ray.put(shard)

    def banded(batch: pa.Table) -> pa.Table:
        t = _band_rows(batch, num_perms, bands, pa_, pb_)
        key = t["sh"].to_numpy().view(np.uint64)
        return t.append_column("bucket", pa.array(
            _coarse_bucket(key, nbits)))

    def candidates(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64())})
        if len(group) == 0:
            return empty
        bk = int(group["bucket"][0].as_py())
        part = os.path.join(store_dir, "bands", f"bucket={bk}")
        files = sorted(_glob.glob(os.path.join(part, "*.parquet")))
        if not files:
            return empty
        st = pa.concat_tables([pq.read_table(f) for f in files])
        s_sh = st["sh"].to_numpy()
        s_id = st["doc_id"].to_numpy()
        order = np.argsort(s_sh, kind="stable")
        s_sh_s, s_id_s = s_sh[order], s_id[order]
        q_sh = group["sh"].to_numpy()
        q_id = group["doc_id"].to_numpy()
        # pair packing below assumes 32-bit doc ids; fail loudly past it
        assert (len(q_id) == 0 or int(q_id.max()) < 1 << 32) and \
            (len(s_id) == 0 or int(s_id.max()) < 1 << 32), \
            "neardup_against_store: doc_id >= 2^32, widen pair packing"
        lo = np.searchsorted(s_sh_s, q_sh, side="left")
        hi = np.searchsorted(s_sh_s, q_sh, side="right")
        runs = hi - lo
        m = runs > 0
        if not m.any():
            return empty
        a = np.repeat(q_id[m], runs[m])
        idx = (np.arange(int(runs[m].sum()))
               - np.repeat(np.cumsum(runs[m]) - runs[m], runs[m])
               + np.repeat(lo[m], runs[m]))
        b = s_id_s[idx]
        pair = a.astype(np.uint64) * np.uint64(1 << 32) + \
            b.astype(np.uint64)  # dedup same pair from multiple bands
        uniq = np.unique(pair)
        return pa.table({
            "a_id": (uniq >> np.uint64(32)).astype(np.int64),
            "b_id": (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64),
        })

    cand = (mat(sets_ds.map_batches(banded, batch_format="pyarrow"))
            .groupby("bucket").map_groups(candidates,
                                          batch_format="pyarrow"))

    def add_sbucket(batch: pa.Table) -> pa.Table:
        b = batch["b_id"].to_numpy()
        return batch.append_column("sbucket", pa.array(
            _coarse_bucket(b.astype(np.uint64), nbits)))

    def verify(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64()),
                          "jacc": pa.array([], pa.float64())})
        if len(group) == 0:
            return empty
        sb = int(group["sbucket"][0].as_py())
        part = os.path.join(store_dir, "shingles", f"sbucket={sb}")
        files = sorted(_glob.glob(os.path.join(part, "*.parquet")))
        if not files:
            return empty
        st = pa.concat_tables([pq.read_table(f) for f in files])
        s_ids = st["doc_id"].to_numpy()
        col = st["shingles"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        lens = np.asarray(pc.list_value_length(col), np.int64)
        flat = np.asarray(col.flatten(), np.uint64)
        off = _segment_offsets(lens)
        where = {int(d): i for i, d in enumerate(s_ids)}
        sh = ray.get(shard_ref)
        # the same (a, b) candidate arrives once per band-key COARSE
        # bucket it collided in (the in-bucket dedup can't see across
        # buckets); all copies share b's sbucket, so dedup here
        ga = group["a_id"].to_numpy()
        gb = group["b_id"].to_numpy()
        pair = np.unique(ga.astype(np.uint64) * np.uint64(1 << 32)
                         + gb.astype(np.uint64))
        a_out, b_out, j_out = [], [], []
        for a, b in zip((pair >> np.uint64(32)).astype(np.int64),
                        (pair & np.uint64(0xFFFFFFFF)).astype(np.int64)):
            sa = sh.get(int(a))
            i = where.get(int(b))
            if sa is None or i is None:
                continue
            sbv = flat[off[i]:off[i + 1]]
            inter = len(np.intersect1d(sa, sbv, assume_unique=True))
            union = len(sa) + len(sbv) - inter
            if union == 0:
                continue
            j = inter / union
            if j >= tau:
                a_out.append(int(a))
                b_out.append(int(b))
                j_out.append(j)
        return pa.table({"a_id": pa.array(a_out, pa.int64()),
                         "b_id": pa.array(b_out, pa.int64()),
                         "jacc": pa.array(j_out, pa.float64())})

    return (mat(cand.map_batches(add_sbucket, batch_format="pyarrow"))
            .groupby("sbucket").map_groups(verify, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort(["a_id", "b_id"]))
