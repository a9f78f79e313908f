"""Text-analysis + deduplication operators over the documents table.

Large-scale training-data-pipeline operators (brief: dedup, text analysis),
each a Dataset -> Dataset pipeline with a DuckDB-mirrorable contract:

* token/quality stats, language-ID heuristic, md5 fingerprint — pure
  per-batch maps (zero-copy Arrow in/out, pyarrow.compute kernels).
* exact dedup — md5 grouping with per-batch partial aggregation before the
  (tiny) groupby shuffle.
* n-gram Jaccard near-dup pairs — EXACT (no false negatives) via
  prefix-filtering [Chaudhuri et al., ICDE'06 / Xiao et al. PPJoin]: order
  each doc's shingle set by a global total order (the shingle's 64-bit md5
  value); any pair with J >= tau must share a shingle within each side's
  first |S| - ceil(tau*|S|) + 1 shingles, so only prefix shingles are
  exploded into the inverted-index shuffle.  Candidates are verified with
  exact set intersection (vectorized, no per-pair Python loop).
* MinHash+LSH near-dup pairs — banded signatures (64 perms, 16 bands x 4
  rows), candidates verified with the same exact-Jaccard verifier;
  approximate recall (no SQL oracle; recall asserted in tests).
* SimHash near-dup pairs — 64-bit token-multiset simhash; pairs within
  hamming distance h=3 found EXACTLY via the 4-block pigeonhole (a pair
  differing in <= 3 bits must agree on one of 4 disjoint 16-bit blocks).

Token hashes are the first 8 bytes of md5 (big-endian) so DuckDB can mirror
them: CAST(concat('0x', substr(md5(t), 1, 16)) AS UBIGINT).  All float
outputs are exact integer ratios (int/int in float64), bitwise equal
between numpy and DuckDB.

Scale notes: every shuffle key is declared; bucket-size skew for the
inverted index is bounded by hash-ordered prefixes (production variant:
df-ascending shingle order, one extra count pass, strictly smaller
buckets).  Nothing materializes the corpus on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "of", "to", "in", "is", "and")
SHINGLE_K = 8
JACCARD_TAU = 0.5
SIMHASH_HAM = 3     # exact with 4 blocks (pigeonhole: 3 < 4)
SIMHASH_BLOCKS = 4
MINHASH_PERMS = 64
MINHASH_BANDS = 16  # rows per band = 4
_PAIR_SHIFT = np.int64(1) << np.int64(32)  # doc ids < 2^31


# --------------------------------------------------------------- primitives

def md5_u64(strings: np.ndarray) -> np.ndarray:
    """uint64 = first 8 big-endian bytes of md5, deduped before hashing
    (shared vocab means most strings repeat within a batch)."""
    uniq, inv = np.unique(np.asarray(strings, dtype=object), return_inverse=True)
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
         for s in uniq),
        dtype=np.uint64, count=len(uniq))
    return h[inv]


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
    th = md5_u64(np.asarray(flat, dtype=object))
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

    def combine(group: pa.Table) -> pa.Table:
        return pa.table({
            "fingerprint": group["fingerprint"][:1],
            "keep_id": pa.array([int(pc.min(group["keep_id"]).as_py())],
                                pa.int64()),
            "n_dups": pa.array([int(pc.sum(group["n_dups"]).as_py())],
                               pa.int64()),
        })

    return (docs_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("fingerprint").map_groups(combine, batch_format="pyarrow"))


def exact_dedup_sql() -> str:
    return """
SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id,
       count(*) AS n_dups
FROM documents GROUP BY fingerprint ORDER BY fingerprint
"""


# -------------------------------------------------------- shingles (hashed)

def shingle_batch(batch: pa.Table, k: int = SHINGLE_K):
    """Per doc: sorted uint64 hashes of the DISTINCT k-char shingles.
    Vectorized over shingle OFFSET (k..max_len slices), never over rows.
    Returns (doc_ids, list-of-arrays)."""
    text = _text_col(batch)
    ids = batch["doc_id"].to_numpy()
    nch = np.asarray(pc.utf8_length(text), np.int64)
    n_sh = np.maximum(0, nch - k + 1)
    max_sh = int(n_sh.max()) if len(n_sh) else 0
    rows, shs = [], []
    for i in range(max_sh):
        sel = np.flatnonzero(n_sh > i)
        if not len(sel):
            break
        chunk = pc.utf8_slice_codeunits(
            pc.take(text, pa.array(sel)), start=i, stop=i + k)
        rows.append(sel)
        shs.append(np.asarray(chunk, dtype=object))
    if not rows:
        return ids, [np.zeros(0, np.uint64) for _ in ids]
    row = np.concatenate(rows)
    h = md5_u64(np.concatenate(shs))
    order = np.argsort(row, kind="stable")
    row, h = row[order], h[order]
    starts = np.searchsorted(row, np.arange(len(ids)))
    ends = np.searchsorted(row, np.arange(len(ids)), side="right")
    return ids, [np.unique(h[s:e]) for s, e in zip(starts, ends)]


def shingle_sql_expr(k: int = SHINGLE_K) -> str:
    """DuckDB list of the same uint64 shingle hashes (distinct)."""
    sub = f"substr(text, CAST(i AS INT), {k})"
    return (f"list_distinct(list_transform(range(1, length(text)-{k}+2), "
            f"i -> {md5_u64_sql(sub)}))")


def _shingle_table(batch: pa.Table, k: int) -> pa.Table:
    ids, sets = shingle_batch(batch, k)
    lens = np.fromiter((len(s) for s in sets), np.int64, len(sets))
    flat = np.concatenate(sets) if sets else np.zeros(0, np.uint64)
    off = _segment_offsets(lens)
    arr = pa.LargeListArray.from_arrays(off, pa.array(flat, pa.uint64()))
    return pa.table({"doc_id": ids, "n_sh": lens, "shingles": arr})


def _prefix_len(n: np.ndarray, tau: float) -> np.ndarray:
    """Prefix-filter length |S| - ceil(tau*|S|) + 1 (>= 1 for n >= 1)."""
    return np.maximum(1, n - np.ceil(tau * n).astype(np.int64) + 1)


# --------------------------------------------- candidate pairs -> verified

def _pairs_from_groups(group: pa.Table) -> pa.Table:
    """All (a < b) doc pairs within one inverted-index bucket."""
    ids = np.unique(group["doc_id"].to_numpy())
    m = len(ids)
    if m < 2:
        return pa.table({"pair": pa.array([], pa.int64())})
    ai, bi = np.triu_indices(m, 1)
    pair = ids[ai] * _PAIR_SHIFT + ids[bi]
    return pa.table({"pair": pair})


def _first_row(group: pa.Table) -> pa.Table:
    return group.slice(0, 1)


def _verify_jaccard(pairs_ds, sets_ds, tau: float):
    """pairs (pair) x sets (doc_id, n_sh, shingles) -> exact Jaccard rows
    (a_id, b_id, jacc) with J >= tau.  Intersection sizes are computed for
    a whole batch at once by sorting the concatenated (pair_row, hash)
    keys — no per-pair Python loop."""
    from .joins import hash_join_int_key

    def split_pair(batch: pa.Table) -> pa.Table:
        p = batch["pair"].to_numpy()
        return pa.table({"a_id": p // _PAIR_SHIFT, "b_id": p % _PAIR_SHIFT})

    pairs = pairs_ds.map_batches(split_pair, batch_format="pyarrow")

    def rename(to_key, n_name, s_name):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({to_key: batch["doc_id"],
                             n_name: batch["n_sh"],
                             s_name: batch["shingles"]})
        return f

    a_sets = sets_ds.map_batches(rename("a_id", "n_a", "s_a"),
                                 batch_format="pyarrow")
    b_sets = sets_ds.map_batches(rename("b_id", "n_b", "s_b"),
                                 batch_format="pyarrow")
    joined = hash_join_int_key(
        hash_join_int_key(pairs, a_sets, "a_id"), b_sets, "b_id")

    def verify(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "jacc": pa.array([], pa.float64())})
        sa = batch["s_a"].combine_chunks() if isinstance(batch["s_a"], pa.ChunkedArray) else batch["s_a"]
        sb = batch["s_b"].combine_chunks() if isinstance(batch["s_b"], pa.ChunkedArray) else batch["s_b"]
        la = np.asarray(pc.list_value_length(sa), np.int64)
        lb = np.asarray(pc.list_value_length(sb), np.int64)
        row_a = np.repeat(np.arange(len(la)), la)
        row_b = np.repeat(np.arange(len(lb)), lb)
        ha = np.asarray(sa.flatten(), np.uint64)
        hb = np.asarray(sb.flatten(), np.uint64)
        # hashes within a row-set are unique; a (row, hash) key appearing
        # on both sides marks one intersection element
        row = np.concatenate([row_a, row_b])
        h = np.concatenate([ha, hb])
        order = np.lexsort((h, row))
        row_s, h_s = row[order], h[order]
        dup = (row_s[1:] == row_s[:-1]) & (h_s[1:] == h_s[:-1])
        inter = np.bincount(row_s[1:][dup], minlength=len(la))
        union = la + lb - inter
        jacc = inter.astype(np.float64) / union.astype(np.float64)
        keep = jacc >= tau
        return pa.table({
            "a_id": batch["a_id"].to_numpy()[keep],
            "b_id": batch["b_id"].to_numpy()[keep],
            "jacc": jacc[keep],
        })

    return joined.map_batches(verify, batch_format="pyarrow")


# ------------------------------------------------- n-gram Jaccard (exact)

def ngram_jaccard_pairs(docs_ds, tau: float = JACCARD_TAU,
                        k: int = SHINGLE_K):
    """EXACT near-duplicate pairs with shingle-Jaccard >= tau.

    Prefix filtering: shingles are ordered by their (uniform) 64-bit hash —
    a global total order — and only each doc's first
    |S| - ceil(tau*|S|) + 1 shingles enter the inverted index, which
    provably preserves all pairs with J >= tau.  ONE groupby(shingle)
    shuffle builds candidates; a bucketed hash join attaches both shingle
    sets; the verifier computes exact J.  Output: (a_id, b_id, jacc).
    """
    sets_ds = docs_ds.map_batches(
        lambda b: _shingle_table(b, k), batch_format="pyarrow")

    def prefix_rows(batch: pa.Table) -> pa.Table:
        s = batch["shingles"]
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        lens = np.asarray(pc.list_value_length(s), np.int64)
        plen = _prefix_len(lens, tau)
        flat = np.asarray(s.flatten(), np.uint64)
        off = _segment_offsets(lens)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1], lens)
        keep = pos < np.repeat(plen, lens)
        return pa.table({
            "sh": flat[keep].astype(np.int64),  # groupby key (int64 view)
            "doc_id": np.repeat(batch["doc_id"].to_numpy(), lens)[keep],
        })

    prefix = sets_ds.map_batches(prefix_rows, batch_format="pyarrow")
    cand = (prefix.groupby("sh")
            .map_groups(_pairs_from_groups, batch_format="pyarrow")
            .groupby("pair").map_groups(_first_row, batch_format="pyarrow"))
    return _verify_jaccard(cand, sets_ds, tau)


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
        # band key: md5 of the band's row values (collision-safe bucket id)
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

    banded = sets_ds.map_batches(band_rows, batch_format="pyarrow")
    cand = (banded.groupby("sh")
            .map_groups(_pairs_from_groups, batch_format="pyarrow")
            .groupby("pair").map_groups(_first_row, batch_format="pyarrow"))
    return _verify_jaccard(cand, sets_ds, tau)


# ----------------------------------------------------------------- SimHash

def simhash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash uint64): majority vote per bit over the doc's token
    hash multiset; strict majority sets the bit (ties -> 0)."""
    toks = _token_lists(_text_col(batch))
    lens = np.asarray(pc.list_value_length(toks), np.int64)
    off = _segment_offsets(lens)
    th = md5_u64(np.asarray(toks.flatten(), dtype=object))
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    cs = np.concatenate([np.zeros((1, 64), np.int64), np.cumsum(bits, 0)])
    ones = cs[off[1:]] - cs[off[:-1]]
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

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        sh = np.asarray(group["simhash"], np.uint64)
        _, first = np.unique(ids, return_index=True)
        ids, sh = ids[first], sh[first]
        m = len(ids)
        if m < 2:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        ai, bi = np.triu_indices(m, 1)
        x = sh[ai] ^ sh[bi]
        ham = np.zeros(len(x), np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_ham
        return pa.table({"pair": ids[ai[keep]] * _PAIR_SHIFT + ids[bi[keep]],
                         "hamming": ham[keep]})

    def emit(group: pa.Table) -> pa.Table:
        p = int(group["pair"][0].as_py())
        return pa.table({
            "a_id": pa.array([p // int(_PAIR_SHIFT)], pa.int64()),
            "b_id": pa.array([p % int(_PAIR_SHIFT)], pa.int64()),
            "hamming": group["hamming"][:1],
        })

    return (docs_ds.map_batches(block_rows, batch_format="pyarrow")
            .groupby("bkey").map_groups(bucket_pairs, batch_format="pyarrow")
            .groupby("pair").map_groups(emit, batch_format="pyarrow"))


def simhash_dup_sql(max_ham: int = SIMHASH_HAM) -> str:
    return f"""
WITH sh AS (SELECT doc_id, {simhash_sql_expr()} AS s FROM documents)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
FROM sh a, sh b
WHERE a.doc_id < b.doc_id AND bit_count(xor(a.s, b.s)) <= {max_ham}
ORDER BY a_id, b_id
"""
