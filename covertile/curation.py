"""Training-data curation operators beyond filtering/sampling:

* sequence_pack — the concat-and-chop packing every LLM training run
  performs: documents in doc_id order are laid end-to-end on a global
  token axis and chopped into fixed-length sequences.  The engine-side
  shape is a DISTRIBUTED PREFIX SCAN (an operator Ray Data lacks):
  per-chunk token totals via per-block partials + driver combine
  (the pipeline.compute_plan precedent), exclusive chunk offsets
  broadcast, then ONE (chunk-bucket) exchange whose groups compute
  within-chunk exclusive cumsums vectorized across many chunks.
* split_contamination — train/test leakage audit: k-gram shingles that
  occur in more than one split of the deterministic train/val/test
  assignment.  One declared shuffle keyed by shingle hash with one-hot
  split partials pre-summed per block.
* pii_scrub — vectorized RE2 redaction (emails, phone numbers) with
  match counts; pyarrow and DuckDB share the RE2 engine, so the
  redacted text and counts are bitwise-mirrorable (same discipline as
  textops.subword_stats).

No reference analogue (the reference is a spatial index); these are
north-rule training-data extensions like textops/eventops.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .joins import mat
import pyarrow.compute as pc

from . import textops as T

SEQ_LEN = 512          # tokens per packed training sequence
PACK_CHUNK = 4096      # docs per prefix-scan chunk
CONTAM_K = T.SHINGLE_K

_PHI = np.uint64(0x9E3779B97F4A7C15)


# ---------------------------------------------------------- sequence pack

PACK_MAX_CHUNKS = 1_000_000  # driver offset-table bound (8 MB of int64s)


def sequence_pack(docs_ds, seq_len: int = SEQ_LEN,
                  chunk: int | None = None):
    """-> (doc_id, n_tokens, start_tok, first_seq, last_seq) sorted by
    doc_id: each document's exclusive global token offset under doc_id
    order and the packed-sequence range it lands in (seq = floor(token
    offset / seq_len)).

    Scale shape — a two-level prefix scan:
      1. token counts per doc (pure map, whitespace tokenizer mirrored
         by the SQL oracle) reduce per block to one row per doc-id
         CHUNK (doc_id // chunk): the chunk-total table combines on the
         driver, the same partial+driver-combine shape as
         pipeline.compute_plan.  `chunk` auto-sizes from the id range
         so the driver never holds more than PACK_MAX_CHUNKS offsets —
         a trillion-doc corpus gets million-doc chunks (8 MB of
         offsets), each still far below a group task's working set.
      2. exclusive chunk offsets broadcast (ray.put); ONE 256-way
         exchange on hash(chunk) where a vectorized multi-chunk pass
         (lexsort + segment cumsum, the sessionize discipline) assigns
         within-chunk offsets.
    Token order is defined by doc_id, so the result is deterministic
    and retry-safe."""
    import ray
    import pyarrow.compute as _pc

    def counts(batch: pa.Table) -> pa.Table:
        toks = T._token_lists(T._text_col(batch))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": np.asarray(_pc.list_value_length(toks), np.int64),
        })

    # two consumers (chunk totals + the assignment pass): materialize the
    # tiny (doc_id, n_tokens) projection once instead of re-tokenizing
    counted = docs_ds.map_batches(counts,
                                  batch_format="pyarrow").materialize()

    if chunk is None:
        id_hi = counted.max("doc_id")
        id_hi = int(id_hi) if id_hi is not None else 0
        chunk = max(PACK_CHUNK, -(-(id_hi + 1) // PACK_MAX_CHUNKS))

    ck_of = lambda ids: ids // np.int64(chunk)  # noqa: E731

    def chunk_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        n = batch["n_tokens"].to_numpy()
        ck = ck_of(ids)
        uk, inv = np.unique(ck, return_inverse=True)
        return pa.table({
            "ck": uk,
            "tot": np.bincount(inv, weights=n,
                               minlength=len(uk)).astype(np.int64),
        })

    parts = counted.map_batches(
        chunk_partial, batch_format="pyarrow").take_all()
    ck_all = np.concatenate([[int(r["ck"])] for r in parts]) \
        if parts else np.zeros(0, np.int64)
    tot_all = np.concatenate([[int(r["tot"])] for r in parts]) \
        if parts else np.zeros(0, np.int64)
    uk, inv = np.unique(ck_all, return_inverse=True)
    totals = np.bincount(inv, weights=tot_all,
                         minlength=len(uk)).astype(np.int64)
    # exclusive prefix over chunk totals, keyed by chunk id
    offs = np.concatenate(([0], np.cumsum(totals)[:-1]))
    offsets_ref = ray.put((uk, offs))

    from .sizing import bucket_shift
    _shift = bucket_shift()

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        ck = ck_of(ids)
        bk = ((ck.astype(np.uint64) * _PHI) >> _shift).astype(np.int64)
        return pa.table({"bk": bk, "doc_id": ids,
                         "n_tokens": batch["n_tokens"]})

    def assign(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "start_tok": pa.array([], pa.int64()),
            "first_seq": pa.array([], pa.int64()),
            "last_seq": pa.array([], pa.int64()),
        })
        m = len(group)
        if m == 0:
            return empty
        cuk, coffs = ray.get(offsets_ref)
        ids = group["doc_id"].to_numpy()
        n = group["n_tokens"].to_numpy()
        order = np.argsort(ids, kind="stable")  # doc order within chunks
        ids, n = ids[order], n[order]
        ck = ck_of(ids)
        # segment-reset exclusive cumsum: subtract each segment's first
        # prefix value (the sessionize run idiom)
        pref = np.concatenate(([0], np.cumsum(n)))[:-1]
        new = np.empty(m, bool)
        new[0] = True
        new[1:] = ck[1:] != ck[:-1]
        seg_base = pref[np.flatnonzero(new)]
        seg = np.cumsum(new) - 1
        local = pref - seg_base[seg]
        start = local + coffs[np.searchsorted(cuk, ck)]
        L = np.int64(seq_len)
        return pa.table({
            "doc_id": ids,
            "n_tokens": n,
            "start_tok": start,
            "first_seq": start // L,
            "last_seq": (start + np.maximum(n, 1) - 1) // L,
        })

    return (mat(counted.map_batches(bucketize, batch_format="pyarrow"))
            .groupby("bk").map_groups(assign, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort("doc_id"))


def sequence_pack_sql(seq_len: int = SEQ_LEN) -> str:
    L = int(seq_len)
    return f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
o AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER
             (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM t
)
SELECT doc_id, n_tokens, start_tok,
       start_tok // {L} AS first_seq,
       (start_tok + GREATEST(n_tokens, 1) - 1) // {L} AS last_seq
FROM o ORDER BY doc_id
"""


# --------------------------------------------------- split contamination

# ------------------------------------------------------------ doc chunks

CHUNK_TOKENS = 64   # tokens per retrieval/training chunk
CHUNK_OVERLAP = 8   # tokens shared between consecutive chunks


def doc_chunks(docs_ds, chunk_tokens: int = CHUNK_TOKENS,
               overlap: int = CHUNK_OVERLAP):
    """Fixed-token-window document chunking with overlap — the
    long-document split step of retrieval / context-window training
    prep.  -> (doc_id, chunk_id, n_chunk_tokens, chunk_text) sorted;
    chunk i covers tokens [i·stride, min(i·stride+chunk_tokens, nt)),
    stride = chunk_tokens − overlap, and the chunk count is
    max(1, ceil((nt − overlap)/stride)) so a tail that would carry no
    NEW tokens is never emitted (every doc yields ≥1 chunk).

    Pure per-batch map, no shuffle besides the canonical output sort:
    chunk boundaries come from integer arithmetic on the per-doc token
    counts, the chunk token payload is ONE np.take gather off the
    flattened token array, and the chunk strings are rebuilt with a
    zero-copy ListArray over that gather + pc.binary_join — no Python
    loop at any row count.  At 100 TB this is embarrassingly parallel;
    output size ≈ input × (1 + overlap/stride)."""
    assert 0 <= overlap < chunk_tokens
    stride = chunk_tokens - overlap

    def chunk(batch: pa.Table) -> pa.Table:
        toks = T._token_lists(T._text_col(batch))
        nt = np.asarray(pc.list_value_length(toks), np.int64)
        ids = batch["doc_id"].to_numpy()
        off = T._segment_offsets(nt)
        flat = toks.flatten()
        nch = np.maximum(1, -(-(nt - overlap) // stride))
        doc_of = np.repeat(np.arange(len(nt), dtype=np.int64), nch)
        # chunk_id within its doc: position minus the doc's first slot
        first = np.concatenate(([0], np.cumsum(nch)[:-1]))
        cid = np.arange(int(nch.sum()), dtype=np.int64) - first[doc_of]
        start = cid * stride
        clen = np.minimum(start + chunk_tokens, nt[doc_of]) - start
        # flat gather: for chunk j, tokens off[doc]+start .. +clen
        goff = np.concatenate(([0], np.cumsum(clen)))
        tot = int(goff[-1])
        gather = (np.repeat(off[doc_of] + start, clen)
                  + (np.arange(tot) - np.repeat(goff[:-1], clen)))
        payload = flat.take(pa.array(gather, pa.int64()))
        chunks = (pa.ListArray.from_arrays(pa.array(goff, pa.int32()),
                                           payload) if tot < 2**31 else
                  pa.LargeListArray.from_arrays(pa.array(goff, pa.int64()),
                                                payload))
        return pa.table({
            "doc_id": ids[doc_of],
            "chunk_id": cid,
            "n_chunk_tokens": clen,
            "chunk_text": pc.binary_join(chunks, " "),
        })

    return (docs_ds.map_batches(chunk, batch_format="pyarrow")
            .sort(["doc_id", "chunk_id"]))


def doc_chunks_sql(chunk_tokens: int = CHUNK_TOKENS,
                   overlap: int = CHUNK_OVERLAP) -> str:
    st = chunk_tokens - overlap
    return f"""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS l,
                     len(string_split(text, ' ')) AS nt FROM documents),
c AS (SELECT doc_id, nt, l,
             unnest(range(0, greatest(1, CAST(ceil(
                 CAST(nt - {overlap} AS DOUBLE) / {st}) AS BIGINT)))) AS i
      FROM base)
SELECT doc_id, i AS chunk_id,
       least(i*{st} + {chunk_tokens}, nt) - i*{st} AS n_chunk_tokens,
       array_to_string(list_slice(l, i*{st} + 1,
                                  least(i*{st} + {chunk_tokens}, nt)),
                       ' ') AS chunk_text
FROM c ORDER BY doc_id, chunk_id
"""


def split_contamination(docs_ds, k: int = CONTAM_K,
                        split_pct: dict | None = None):
    """Leakage audit over the deterministic train/val/test assignment:
    k-character shingles (md5_u64-keyed, the textops shingle identity)
    that appear in documents of MORE THAN ONE split, with per-split doc
    counts -> (shingle, n_test, n_train, n_val) sorted by shingle.

    Scale shape: per-block partials pre-sum the one-hot split columns
    per shingle, then ONE shuffle keyed by shingle hash; the final
    filter keeps only multi-split shingles.  Shingle extraction windows
    the flat UTF-8 buffer at CODEPOINT boundaries (character windows,
    not byte windows) and md5-hashes each window's raw bytes — exactly
    what DuckDB's md5(substr(text, i, k)) hashes — so the keys are
    value-equal to the SQL oracle for arbitrary non-ASCII text."""
    pct = dict(T.SPLIT_PCT if split_pct is None else split_pct)
    names = sorted(pct)
    edges = np.cumsum([pct[n] for n in names])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        text = T._text_col(batch)
        if len(ids) == 0 or text.null_count == len(ids):
            cols = {"sh": pa.array([], pa.int64())}
            cols.update({f"n_{n}": pa.array([], pa.int64())
                         for n in names})
            return pa.table(cols)
        ta = (text.combine_chunks()
              if isinstance(text, pa.ChunkedArray) else text)
        if not pa.types.is_large_string(ta.type):
            ta = ta.cast(pa.large_string())
        off = np.frombuffer(ta.buffers()[1], np.int64)[
            ta.offset: ta.offset + len(ta) + 1]
        data = np.frombuffer(ta.buffers()[2], np.uint8)
        # CHARACTER-based k-windows (not byte windows): window boundaries
        # sit on UTF-8 codepoint starts, so every window is valid UTF-8
        # and its raw bytes are exactly what DuckDB's md5(substr(text,i,k))
        # hashes — bitwise oracle parity for arbitrary non-ASCII text.
        seg = data[off[0]: off[-1]]
        char_pos = off[0] + np.flatnonzero((seg & 0xC0) != 0x80)
        char_pos_ext = np.append(char_pos, off[-1])
        char_cnt = np.searchsorted(char_pos, off)   # chars before each doc
        n_sh = np.maximum(0, np.diff(char_cnt) - k + 1)
        tot = int(n_sh.sum())
        rows = np.repeat(np.arange(len(ids)), n_sh)
        excl = np.concatenate(([0], np.cumsum(n_sh)[:-1]))
        w_char = (np.repeat(char_cnt[:-1], n_sh)
                  + (np.arange(tot) - np.repeat(excl, n_sh)))
        b_start = char_pos_ext[w_char]
        wlen = char_pos_ext[w_char + k] - b_start
        # padded (tot, maxw) byte matrix; 0xFF never occurs in valid UTF-8
        # so padding cannot collide with real window bytes
        maxw = int(wlen.max()) if tot else k
        j = np.arange(maxw)[None, :]
        win = np.full((tot, maxw), 0xFF, np.uint8)
        valid = j < wlen[:, None]
        gather = np.minimum(b_start[:, None] + j, len(data) - 1)
        win[valid] = data[gather][valid]
        void = np.ascontiguousarray(win).view(
            np.dtype((np.void, maxw))).ravel()
        u_void, sub_inv = np.unique(void, return_inverse=True)
        h_uniq = np.fromiter(
            (int.from_bytes(
                hashlib.md5(v.tobytes().rstrip(b"\xff")).digest()[:8],
                "big") for v in u_void),
            dtype=np.uint64, count=len(u_void))
        h = h_uniq[sub_inv]
        # distinct (doc, shingle) pairs; the key rides the exchange as a
        # SIGNED int64 view (ray's sort/groupby has no uint64 path — it
        # would fall back to pickled python objects)
        h = h.view(np.int64)
        key_order = np.lexsort((h, rows))
        rs, hs = rows[key_order], h[key_order]
        keep = np.empty(tot, bool)
        if tot:
            keep[0] = True
            keep[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
        rs, hs = rs[keep], hs[keep]
        split_sel = np.searchsorted(edges, T._sample_bucket(ids),
                                    side="right")
        doc_split = split_sel[rs]
        # pre-sum per (shingle, split) before the exchange
        uk_h, inv_h = np.unique(hs, return_inverse=True)
        cols = {"sh": pa.array(uk_h, pa.int64())}
        for si, nm in enumerate(names):
            cols[f"n_{nm}"] = np.bincount(
                inv_h[doc_split == si],
                minlength=len(uk_h)).astype(np.int64)
        return pa.table(cols)

    agg = (mat(docs_ds.map_batches(partial, batch_format="pyarrow"))
           .groupby("sh").sum([f"n_{n}" for n in names]))

    def finalize(batch: pa.Table) -> pa.Table:
        sums = [batch[f"sum(n_{n})"].to_numpy() for n in names]
        hit = sum((s > 0).astype(np.int64) for s in sums) >= 2
        cols = {"sh": batch["sh"].filter(pa.array(hit))}
        for nm, s in zip(names, sums):
            cols[f"n_{nm}"] = s[hit]
        return pa.table(cols)

    return (agg.map_batches(finalize, batch_format="pyarrow")
            .sort("sh"))


def split_contamination_sql(k: int = CONTAM_K,
                            split_pct: dict | None = None) -> str:
    pct = dict(T.SPLIT_PCT if split_pct is None else split_pct)
    names = sorted(pct)
    edges = np.cumsum([pct[n] for n in names])
    b = T._sample_bucket_sql()
    cases = " ".join(f"WHEN {b} < {int(e)} THEN '{n}'"
                     for n, e in zip(names, edges))
    sums = ",\n       ".join(
        f"CAST(sum(CASE WHEN split = '{n}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{n}" for n in names)
    hits = " + ".join(
        f"CASE WHEN sum(CASE WHEN split = '{n}' THEN 1 ELSE 0 END) > 0"
        f" THEN 1 ELSE 0 END" for n in names)
    # mirror the engine's signed-int64 view of the uint64 md5 hash
    # (two's complement via HUGEINT arithmetic)
    sh_signed = ("CAST(CASE WHEN u >= 9223372036854775808 "
                 "THEN CAST(u AS HUGEINT) - 18446744073709551616 "
                 "ELSE CAST(u AS HUGEINT) END AS BIGINT)")
    return f"""
WITH s AS (
  SELECT doc_id, CASE {cases} END AS split,
         unnest({T.shingle_sql_expr(k)}) AS u
  FROM documents
),
sg AS (SELECT doc_id, split, {sh_signed} AS sh FROM s)
SELECT sh, {sums}
FROM sg GROUP BY sh
HAVING {hits} >= 2
ORDER BY sh
"""


# ----------------------------------------------------------- PII scrub

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"


def pii_scrub(docs_ds):
    """-> (doc_id, n_emails, n_phones, clean_text) sorted by doc_id:
    match counts and globally-redacted text ([EMAIL] / [PHONE], emails
    replaced first).  Pure per-batch map over pyarrow's RE2 kernels;
    DuckDB's regexp_replace(..., 'g') runs the same RE2 patterns, so
    the redacted strings are bitwise-mirrorable."""
    def scrub(batch: pa.Table) -> pa.Table:
        text = T._text_col(batch)
        n_email = np.asarray(
            pc.count_substring_regex(text, PII_EMAIL), np.int64)
        cleaned = pc.replace_substring_regex(text, PII_EMAIL, "[EMAIL]")
        n_phone = np.asarray(
            pc.count_substring_regex(cleaned, PII_PHONE), np.int64)
        cleaned = pc.replace_substring_regex(cleaned, PII_PHONE, "[PHONE]")
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_emails": n_email,
            "n_phones": n_phone,
            "clean_text": cleaned,
        })

    return docs_ds.map_batches(scrub, batch_format="pyarrow").sort("doc_id")


def pii_scrub_sql(table: str = "documents") -> str:
    # single-quoted DuckDB literals pass backslashes through verbatim
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(
           regexp_replace(text, '{PII_EMAIL}', '[EMAIL]', 'g'),
           '{PII_PHONE}')) AS n_phones,
       regexp_replace(
           regexp_replace(text, '{PII_EMAIL}', '[EMAIL]', 'g'),
           '{PII_PHONE}', '[PHONE]', 'g') AS clean_text
FROM {table} ORDER BY doc_id
"""


# ---------------------------------------------------------- table profile

PROFILE_COLUMNS = ("doc_id", "lang", "n_chars", "source", "text")


def table_profile(ds, columns: tuple[str, ...] = PROFILE_COLUMNS):
    """Data-quality profile of a table: one row per column ->
    (column, n_rows, n_nulls, n_distinct), sorted by column name.
    The ingest-validation pass a training pipeline runs before anything
    else touches new data.

    Scale shape: counts/nulls reduce per block to one row per column
    (metadata) and tree-combine; EXACT distinct goes through ONE
    shuffle of per-block-deduped (column, key) pairs — string values
    key by md5_u64, integers by value, floats/timestamps by bit view,
    so the exchange carries two int64s per distinct-value-per-block
    regardless of value width — then a metadata-sized per-column count.
    NULLs are excluded from distinct (SQL count(DISTINCT) semantics)
    and counted separately."""
    import pyarrow.compute as pc

    cols = tuple(columns)

    def _keys(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """(valid mask, int64 key per valid value)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        valid = np.asarray(pc.is_valid(arr))
        dropped = arr.drop_null()
        t = dropped.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            k = T.md5_u64(dropped).view(np.int64)
        elif pa.types.is_timestamp(t):
            k = dropped.cast(pa.int64()).to_numpy()
        elif pa.types.is_floating(t):
            k = dropped.to_numpy().astype(np.float64).view(np.int64)
        else:
            k = dropped.cast(pa.int64()).to_numpy()
        return valid, k

    def counts_partial(batch: pa.Table) -> pa.Table:
        n = len(batch)
        nulls = [n - int(np.asarray(pc.is_valid(
            batch[c].combine_chunks()
            if isinstance(batch[c], pa.ChunkedArray) else batch[c])).sum())
            for c in cols]
        return pa.table({
            "column": pa.array(list(cols), pa.string()),
            "n_rows": np.full(len(cols), n, np.int64),
            "n_nulls": np.array(nulls, np.int64),
        })

    def distinct_partial(batch: pa.Table) -> pa.Table:
        out_c, out_k = [], []
        for ci, c in enumerate(cols):
            _, k = _keys(batch[c])
            u = np.unique(k)
            out_c.append(np.full(len(u), ci, np.int64))
            out_k.append(u)
        return pa.table({"col": np.concatenate(out_c),
                         "k": np.concatenate(out_k)})

    def count_per_col(batch: pa.Table) -> pa.Table:
        col = batch["col"].to_numpy()
        return pa.table({
            "col": np.arange(len(cols), dtype=np.int64),
            "nd": np.bincount(col, minlength=len(cols)).astype(np.int64),
        })

    distinct = (mat(ds.map_batches(distinct_partial,
                                   batch_format="pyarrow"))
                .groupby(["col", "k"]).count()
                .map_batches(count_per_col, batch_format="pyarrow")
                .repartition(1))

    base = (ds.map_batches(counts_partial, batch_format="pyarrow")
            .repartition(1))

    def base_final(batch: pa.Table) -> pa.Table:
        cn = np.asarray(batch["column"], dtype=object)
        uk, inv = np.unique(cn, return_inverse=True)
        return pa.table({
            "column": pa.array(uk, pa.string()),
            "n_rows": np.bincount(
                inv, weights=batch["n_rows"].to_numpy(),
                minlength=len(uk)).astype(np.int64),
            "n_nulls": np.bincount(
                inv, weights=batch["n_nulls"].to_numpy(),
                minlength=len(uk)).astype(np.int64),
        })

    def nd_final(batch: pa.Table) -> pa.Table:
        col = batch["col"].to_numpy()
        nd = np.bincount(col, weights=batch["nd"].to_numpy(),
                         minlength=len(cols)).astype(np.int64)
        names = np.array(sorted(cols), dtype=object)
        order = np.argsort(np.array(cols, dtype=object), kind="stable")
        return pa.table({
            "column": pa.array(names, pa.string()),
            "n_distinct": nd[order],
        })

    b = base.map_batches(base_final, batch_format="pyarrow",
                         batch_size=None)
    d = distinct.map_batches(nd_final, batch_format="pyarrow",
                             batch_size=None)

    def zip_final(batch: pa.Table) -> pa.Table:
        # both inputs are |columns|-row tables keyed by column name;
        # combine via a union + per-name merge (no join machinery for a
        # metadata-sized result)
        cn = np.asarray(batch["column"], dtype=object)
        uk, inv = np.unique(cn, return_inverse=True)

        def m(col):
            if col not in batch.column_names:
                v = np.zeros(len(cn), np.int64)
            else:
                c_ = batch[col]
                if isinstance(c_, pa.ChunkedArray):
                    c_ = c_.combine_chunks()
                # union null-fills the columns the other side lacks;
                # a bare to_numpy would turn those NULLs into int64 min
                v = np.asarray(pc.fill_null(c_, 0)).astype(np.int64)
            return np.bincount(inv, weights=v,
                               minlength=len(uk)).astype(np.int64)

        return pa.table({
            "column": pa.array(uk, pa.string()),
            "n_rows": m("n_rows"),
            "n_nulls": m("n_nulls"),
            "n_distinct": m("n_distinct"),
        })

    merged = (b.union(d)
              .repartition(1)
              .map_batches(zip_final, batch_format="pyarrow",
                           batch_size=None))
    return merged


def table_profile_sql(table: str = "documents",
                      columns: tuple[str, ...] = PROFILE_COLUMNS) -> str:
    selects = " UNION ALL ".join(
        f"""SELECT '{c}' AS "column", count(*) AS n_rows,
            count(*) - count({c}) AS n_nulls,
            count(DISTINCT {c}) AS n_distinct FROM {table}"""
        for c in sorted(columns))
    return f'{selects} ORDER BY "column"'


# ------------------------------------------------- duplicated substrings

DUPSPAN_W = 64   # window width, characters
DUPSPAN_S = 32   # stride, characters
DUPSPAN_BROADCAST_MAX = 16_000_000  # candidate hashes (~256 MB put)


def _stride_window_hashes(batch: pa.Table, w: int, s: int):
    """(row_idx, char_pos, md5_u64-as-int64) for every w-character window
    at stride s over the batch's text column — the split_contamination
    flat-buffer windowing (codepoint-boundary windows over the raw UTF-8
    buffer, so the hashed bytes are exactly what DuckDB's
    md5(substr(text, pos+1, w)) hashes) generalized from stride 1 to
    stride s, and returning the doc-local character position of each
    window alongside its hash."""
    ids = batch["doc_id"].to_numpy()
    z = np.zeros(0, np.int64)
    text = T._text_col(batch)
    if len(ids) == 0 or text.null_count == len(ids):
        return z, z, z
    ta = (text.combine_chunks()
          if isinstance(text, pa.ChunkedArray) else text)
    if not pa.types.is_large_string(ta.type):
        ta = ta.cast(pa.large_string())
    off = np.frombuffer(ta.buffers()[1], np.int64)[
        ta.offset: ta.offset + len(ta) + 1]
    data = np.frombuffer(ta.buffers()[2], np.uint8)
    seg = data[off[0]: off[-1]]
    char_pos = off[0] + np.flatnonzero((seg & 0xC0) != 0x80)
    char_pos_ext = np.append(char_pos, off[-1])
    char_cnt = np.searchsorted(char_pos, off)   # chars before each doc
    nchars = np.diff(char_cnt)
    n_win = np.where(nchars >= w, (nchars - w) // s + 1, 0)
    tot = int(n_win.sum())
    if tot == 0:
        return z, z, z
    rows = np.repeat(np.arange(len(ids)), n_win)
    excl = np.concatenate(([0], np.cumsum(n_win)[:-1]))
    pos = (np.arange(tot) - np.repeat(excl, n_win)) * s
    w_char = np.repeat(char_cnt[:-1], n_win) + pos
    b_start = char_pos_ext[w_char]
    wlen = char_pos_ext[w_char + w] - b_start
    maxw = int(wlen.max())
    j = np.arange(maxw)[None, :]
    win = np.full((tot, maxw), 0xFF, np.uint8)  # 0xFF: not valid UTF-8
    valid = j < wlen[:, None]
    gather = np.minimum(b_start[:, None] + j, len(data) - 1)
    win[valid] = data[gather][valid]
    void = np.ascontiguousarray(win).view(
        np.dtype((np.void, maxw))).ravel()
    u_void, sub_inv = np.unique(void, return_inverse=True)
    h_uniq = np.fromiter(
        (int.from_bytes(
            hashlib.md5(v.tobytes().rstrip(b"\xff")).digest()[:8],
            "big") for v in u_void),
        dtype=np.uint64, count=len(u_void))
    return rows, pos, h_uniq[sub_inv].view(np.int64)


def _dup_window_candidates(docs_ds, w: int, s: int):
    """Census pass shared by dup_spans / doc_dup_ratio: the materialized
    (h, ndocs) table of window hashes occurring in >1 distinct document.
    Per-block (doc, hash)-deduped partials pre-sum distinct-doc counts
    (each doc lives in exactly one input row, so per-block partials sum
    to the global distinct count); ONE pair-bounded exchange keyed by a
    hash bucket (sizing.bucket_shift), filtered inside the combine."""
    from .sizing import bucket_shift
    _shift = bucket_shift()

    def census(batch: pa.Table) -> pa.Table:
        rows, _, h = _stride_window_hashes(batch, w, s)
        if len(rows) == 0:
            z = np.zeros(0, np.int64)
            return pa.table({"h": z, "nd": z, "bk": z})
        order = np.lexsort((h, rows))
        rs, hs = rows[order], h[order]
        keep = np.empty(len(rs), bool)
        keep[0] = True
        keep[1:] = (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])
        hs = hs[keep]
        u, inv = np.unique(hs, return_inverse=True)
        nd = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table({"h": u, "nd": nd,
                         "bk": (u.view(np.uint64) >> _shift)
                         .astype(np.int64)})

    def combine(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy()
        u, inv = np.unique(h, return_inverse=True)
        nd = np.bincount(inv, weights=g["nd"].to_numpy(),
                         minlength=len(u)).astype(np.int64)
        hit = nd > 1
        return pa.table({"h": u[hit], "ndocs": nd[hit]})

    return (mat(docs_ds.map_batches(census, batch_format="pyarrow"))
            .groupby("bk").map_groups(combine, batch_format="pyarrow")
            .materialize())


def _collect_candidate_arrays(cand):
    """Sorted (h, ndocs) numpy pair from the materialized candidate set."""
    hs, nds = [np.zeros(0, np.int64)], [np.zeros(0, np.int64)]
    for b in cand.iter_batches(batch_size=None, batch_format="pyarrow"):
        hs.append(b["h"].to_numpy())
        nds.append(b["ndocs"].to_numpy())
    h_all, nd_all = np.concatenate(hs), np.concatenate(nds)
    order = np.argsort(h_all)
    return h_all[order], nd_all[order]


def dup_spans(docs_ds, w: int = DUPSPAN_W, s: int = DUPSPAN_S,
              broadcast_max: int = DUPSPAN_BROADCAST_MAX):
    """Exact duplicated-substring audit (the suffix-array dedup signal of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better", at fixed granularity): every w-character window at stride s
    whose exact text occurs in MORE THAN ONE document, reported at each
    site -> (doc_id, pos, ndocs) sorted, where pos is the window's
    character offset and ndocs the number of distinct documents sharing
    the window.  Window identity is md5_u64 of the window text on both
    sides (the split_contamination precedent), so the oracle is bitwise.

    Scale shape, two corpus passes and NO corpus-sized shuffle:
    1. census — per-block (doc, window-hash)-deduped partials pre-sum
       distinct-doc counts per hash (each doc lives in exactly one input
       row, so per-block distinct-doc partials sum to the global distinct
       count); ONE pair-bounded exchange keyed by a hash bucket
       (sizing.bucket_shift), filtered to ndocs > 1 inside the combine.
    2. report — the candidate (hash, ndocs) table rides back as a sorted
       broadcast array pair when it fits (duplicated windows are the rare
       case), else as a hash_join_int_key on the window hash (the
       token_rarity fallback discipline); window POSITIONS are computed
       in place in pass 2 and never move between nodes."""
    import ray as _ray

    cand = _dup_window_candidates(docs_ds, w, s)

    out_schema = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64()),
                            ("ndocs", pa.int64())])

    if cand.count() <= broadcast_max:
        ref = _ray.put(_collect_candidate_arrays(cand))

        def report(batch: pa.Table) -> pa.Table:
            rows, pos, h = _stride_window_hashes(batch, w, s)
            hv, ndv = _ray.get(ref)
            if len(rows) == 0 or len(hv) == 0:
                return out_schema.empty_table()
            idx = np.searchsorted(hv, h)
            idx_c = np.minimum(idx, len(hv) - 1)
            hit = hv[idx_c] == h
            ids = batch["doc_id"].to_numpy()
            return pa.table({"doc_id": ids[rows[hit]],
                             "pos": pos[hit],
                             "ndocs": ndv[idx_c[hit]]})

        return (docs_ds.map_batches(report, batch_format="pyarrow")
                .sort(["doc_id", "pos"]))

    from .joins import hash_join_int_key

    def sites(batch: pa.Table) -> pa.Table:
        rows, pos, h = _stride_window_hashes(batch, w, s)
        ids = batch["doc_id"].to_numpy()
        return pa.table({"h": h, "doc_id": ids[rows]
                         if len(rows) else np.zeros(0, np.int64),
                         "pos": pos})

    joined = hash_join_int_key(
        docs_ds.map_batches(sites, batch_format="pyarrow"), cand,
        key="h",
        left_schema=pa.schema([("h", pa.int64()), ("doc_id", pa.int64()),
                               ("pos", pa.int64())]),
        right_schema=pa.schema([("h", pa.int64()),
                                ("ndocs", pa.int64())]))

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "pos", "ndocs"])

    return (joined.map_batches(project, batch_format="pyarrow")
            .sort(["doc_id", "pos"]))


def dup_spans_sql(w: int = DUPSPAN_W, s: int = DUPSPAN_S) -> str:
    h = T.md5_u64_sql(f"substr(text, CAST(pos + 1 AS INT), {w})")
    return f"""
WITH p AS (
  SELECT doc_id, text,
         unnest(range(0, length(text) - {w} + 1, {s})) AS pos
  FROM documents WHERE length(text) >= {w}
),
w AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, {h} AS h FROM p),
g AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM w
      GROUP BY h HAVING count(DISTINCT doc_id) > 1)
SELECT w.doc_id, w.pos, g.ndocs
FROM w JOIN g USING (h)
ORDER BY doc_id, pos
"""


def doc_dup_ratio(docs_ds, w: int = DUPSPAN_W, s: int = DUPSPAN_S,
                  broadcast_max: int = DUPSPAN_BROADCAST_MAX):
    """Per-document duplicated-substring profile — the actionable filter
    form of dup_spans (rank/drop docs by how much of their text is
    boilerplate shared with other docs): for every doc long enough to
    window, (doc_id, n_windows, n_dup, dup_ratio) sorted, where n_dup
    counts the doc's stride-s w-char windows whose exact text occurs in
    >1 distinct document and dup_ratio is the single terminal float
    division (bitwise vs the oracle).

    Scale shape: shares dup_spans' census (_dup_window_candidates — one
    pair-bounded exchange); the report pass aggregates per doc IN PLACE
    (each doc is one input row, so the broadcast path has zero further
    shuffles).  Past broadcast_max candidates the membership runs as a
    LEFT hash join on the window hash plus one doc-bucketed partial-sum
    exchange (both paths equality-tested)."""
    import ray as _ray

    cand = _dup_window_candidates(docs_ds, w, s)

    def _out(ids, nw, nd) -> pa.Table:
        return pa.table({
            "doc_id": ids, "n_windows": nw, "n_dup": nd,
            "dup_ratio": nd.astype(np.float64) / nw.astype(np.float64),
        })

    if cand.count() <= broadcast_max:
        ref = _ray.put(_collect_candidate_arrays(cand))

        def report(batch: pa.Table) -> pa.Table:
            rows, _, h = _stride_window_hashes(batch, w, s)
            z = np.zeros(0, np.int64)
            if len(rows) == 0:
                return _out(z, z, z)
            hv, _ndv = _ray.get(ref)
            if len(hv):
                idx_c = np.minimum(np.searchsorted(hv, h), len(hv) - 1)
                hit = hv[idx_c] == h
            else:
                hit = np.zeros(len(h), bool)
            u_rows = np.unique(rows)
            nw = np.bincount(rows)[u_rows]
            nd = np.bincount(rows[hit],
                             minlength=int(u_rows.max()) + 1)[u_rows]
            ids = batch["doc_id"].to_numpy()[u_rows]
            return _out(ids, nw.astype(np.int64), nd.astype(np.int64))

        return (docs_ds.map_batches(report, batch_format="pyarrow")
                .sort("doc_id"))

    from .joins import hash_join_int_key
    from .sizing import bucket_shift
    _shift2 = bucket_shift()

    def sites(batch: pa.Table) -> pa.Table:
        rows, _, h = _stride_window_hashes(batch, w, s)
        ids = batch["doc_id"].to_numpy()
        return pa.table({"h": h, "doc_id": ids[rows]
                         if len(rows) else np.zeros(0, np.int64)})

    joined = hash_join_int_key(
        docs_ds.map_batches(sites, batch_format="pyarrow"), cand,
        key="h", how="left",
        left_schema=pa.schema([("h", pa.int64()),
                               ("doc_id", pa.int64())]),
        right_schema=pa.schema([("h", pa.int64()),
                                ("ndocs", pa.int64())]))

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        dup = pa.compute.is_valid(batch["ndocs"]).to_numpy(
            zero_copy_only=False)
        u, inv = np.unique(ids, return_inverse=True)
        return pa.table({
            "doc_id": u,
            "nw": np.bincount(inv).astype(np.int64),
            "nd": np.bincount(inv, weights=dup).astype(np.int64),
            "bk": ((u.astype(np.uint64) * _PHI) >> _shift2)
            .astype(np.int64),
        })

    def merge(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy()
        u, inv = np.unique(ids, return_inverse=True)
        nw = np.bincount(inv, weights=g["nw"].to_numpy()).astype(np.int64)
        nd = np.bincount(inv, weights=g["nd"].to_numpy()).astype(np.int64)
        return _out(u, nw, nd)

    return (mat(joined.map_batches(partial, batch_format="pyarrow"))
            .groupby("bk").map_groups(merge, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort("doc_id"))


def doc_dup_ratio_sql(w: int = DUPSPAN_W, s: int = DUPSPAN_S) -> str:
    h = T.md5_u64_sql(f"substr(text, CAST(pos + 1 AS INT), {w})")
    return f"""
WITH p AS (
  SELECT doc_id, text,
         unnest(range(0, length(text) - {w} + 1, {s})) AS pos
  FROM documents WHERE length(text) >= {w}
),
w AS (SELECT doc_id, pos, {h} AS h FROM p),
g AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM w
      GROUP BY h HAVING count(DISTINCT doc_id) > 1)
SELECT w.doc_id,
       count(*) AS n_windows,
       CAST(sum(CASE WHEN g.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup,
       CAST(sum(CASE WHEN g.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS dup_ratio
FROM w LEFT JOIN g USING (h)
GROUP BY w.doc_id
ORDER BY doc_id
"""


# ------------------------------------------------- HLL distinct sketch

HLL_P = 12                    # 2^12 = 4096 registers
HLL_M = 1 << HLL_P
HLL_W = 32                    # rho window: low 32 bits of the hash
# registers hold rho in [1, 33]; 33 = all-zero window.  The window caps
# rho, which biases HLL only when distinct counts approach m * 2^33 —
# far beyond any estimate this sketch is asked for; in exchange every
# 2^-rho term is a dyadic >= 2^-33, so the 4096-term register sum is
# EXACTLY representable in float64 (45 bits) and the estimate is
# bitwise-deterministic under any merge order.


def _hll_rho(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) for uint64 hashes: bucket = top p bits, rho = one
    plus the number of leading zeros of the low-32-bit window."""
    bucket = (u >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = (u & np.uint64(0xFFFFFFFF)).astype(np.float64)
    # frexp exponent of an exactly-representable integer IS bit_length
    e = np.frexp(w)[1]
    return bucket, (np.int64(HLL_W + 1) - e).astype(np.int64)


def hll_estimate(regs: np.ndarray) -> float:
    """HLL estimate from a group's non-zero registers (rho values in
    [1, 33]); identical float expression order to hll_estimate_sql."""
    import math
    np_present = len(regs)
    s_int = int(np.sum(np.int64(1) << (HLL_W + 1 - regs))) \
        if np_present else 0
    sp = s_int / float(1 << (HLL_W + 1))
    m = float(HLL_M)
    e = ((0.7213 / (1.0 + 1.079 / m)) * m * m) \
        / (sp + (m - float(np_present)))
    v = HLL_M - np_present
    if e <= 2.5 * m and v > 0:
        e = m * math.log(m / float(v))
    return e


def hll_estimate_sql(np_col: str, sint_col: str) -> str:
    """The estimator as one SQL expression over (register count,
    integer register sum) columns — mirrors hll_estimate bitwise."""
    m = HLL_M
    alpha = f"(0.7213 / (1.0 + 1.079 / {float(m)}))"
    e = (f"({alpha} * {float(m)} * {float(m)})"
         f" / (CAST({sint_col} AS DOUBLE) / {float(1 << (HLL_W + 1))}"
         f" + ({float(m)} - CAST({np_col} AS DOUBLE)))")
    return (f"CASE WHEN {e} <= {2.5 * m} AND ({m} - {np_col}) > 0 "
            f"THEN {float(m)} * ln({float(m)}"
            f" / CAST({m} - {np_col} AS DOUBLE)) ELSE {e} END")


def hll_profile(ds, columns: tuple[str, ...] = PROFILE_COLUMNS):
    """Approximate-distinct profile — the sketch twin of table_profile:
    per column (column, n_rows, hll_est) sorted, where hll_est is a
    HyperLogLog estimate (Flajolet et al. 2007; p=12, 4096 registers)
    of the column's distinct count over its non-null values.

    Unlike the exact table_profile (one (col, value-hash) exchange),
    the corpus never shuffles AT ALL: per-block partials emit at most
    4096 register rows + 1 count row per column, ONE metadata-sized
    groupby merges registers via max (HLL merge is register-wise max,
    associative and idempotent — retry-safe by construction), and a
    single-task finalize applies the estimator.  Bitwise oracle: the
    register sum is carried as the integer Σ 2^(33-rho) (exact, < 2^44)
    and every float step is one identically-ordered expression on both
    sides, including the small-range linear-counting branch (ln parity
    is the bm25 libm contract)."""
    def partial(batch: pa.Table) -> pa.Table:
        cols, bks, rhos, ns = [], [], [], []
        for c in columns:
            col = batch[c]
            if pa.types.is_string(col.type) or \
                    pa.types.is_large_string(col.type):
                vals = np.asarray(col.drop_null(), dtype=object)
            else:
                arr = col.drop_null().to_numpy(zero_copy_only=False)
                vals = arr.astype("U").astype(object)
            n = len(vals)
            if n:
                bucket, rho = _hll_rho(T.md5_u64(vals))
                uk, inv = np.unique(bucket, return_inverse=True)
                mx = np.zeros(len(uk), np.int64)
                np.maximum.at(mx, inv, rho)
                cols.append(np.full(len(uk), c, dtype=object))
                bks.append(uk)
                rhos.append(mx)
                ns.append(np.zeros(len(uk), np.int64))
            cols.append(np.array([c], dtype=object))
            bks.append(np.array([-1], np.int64))   # count row
            rhos.append(np.zeros(1, np.int64))
            ns.append(np.array([n], np.int64))
        return pa.table({
            "column": pa.array(np.concatenate(cols), pa.string()),
            "bucket": np.concatenate(bks),
            "rho": np.concatenate(rhos),
            "n": np.concatenate(ns),
        })

    agg = (mat(ds.map_batches(partial, batch_format="pyarrow"))
           .groupby(["column", "bucket"]).aggregate(
               *_hll_aggs()))

    def finalize(batch: pa.Table) -> pa.Table:
        col = np.asarray(batch["column"], dtype=object)
        bk = batch["bucket"].to_numpy()
        rho = batch["max(rho)"].to_numpy()
        n = batch["sum(n)"].to_numpy()
        out_c, out_n, out_e = [], [], []
        for c in sorted(columns):
            sel = col == c
            out_c.append(c)
            out_n.append(int(n[sel & (bk == -1)].sum()))
            out_e.append(hll_estimate(rho[sel & (bk >= 0)]))
        return pa.table({
            "column": pa.array(out_c, pa.string()),
            "n_rows": pa.array(out_n, pa.int64()),
            "hll_est": pa.array(out_e, pa.float64()),
        })

    return (agg.repartition(1)
            .map_batches(finalize, batch_format="pyarrow",
                         batch_size=None))


def _hll_aggs():
    from ray.data.aggregate import Max, Sum
    return Max("rho"), Sum("n")


def hll_profile_sql(table: str = "documents",
                    columns: tuple[str, ...] = PROFILE_COLUMNS) -> str:
    parts = []
    for c in sorted(columns):
        cast = c if c in ("text", "lang", "source") \
            else f"CAST({c} AS VARCHAR)"
        u = T.md5_u64_sql(cast)
        parts.append(f"""
SELECT '{c}' AS "column", n_rows,
       {hll_estimate_sql("np", "s_int")} AS hll_est
FROM (
  SELECT count(*) AS np,
         CAST(COALESCE(sum(CAST(1 AS BIGINT) << ({HLL_W + 1} - M)), 0)
              AS BIGINT) AS s_int,
         (SELECT count({c}) FROM {table}) AS n_rows
  FROM (
    SELECT CAST(u >> {64 - HLL_P} AS BIGINT) AS bucket,
           max(CASE {hll_rho_ladder_sql()} END) AS M
    FROM (SELECT u, CAST(u & 4294967295 AS BIGINT) AS w
          FROM (SELECT {u} AS u FROM {table}
                WHERE {c} IS NOT NULL))
    GROUP BY bucket
  )
)""")
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


def hll_rho_ladder_sql(w_col: str = "w") -> str:
    """rho as an exact integer CASE ladder over the 32-bit window column
    (no float log2): CASE WHEN w >= 2^31 THEN 1 ... ELSE 33."""
    return " ".join(
        f"WHEN {w_col} >= {1 << (HLL_W - k)} THEN {k}"
        for k in range(1, HLL_W + 1)) + f" ELSE {HLL_W + 1}"


# -------------------------------------------------- count-min sketch

CMS_DEPTH = 4
CMS_WIDTH = 1 << 16          # 65536 cells per row; sketch = 2 MB of i64
CMS_TOPK = 50
# per-row salt added to the md5 token hash before the 32-bit-multiplier
# mix (eventops._mix64): independent-enough row hashes, every step
# bitwise-mirrorable in SQL
CMS_SALTS = tuple((i * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
                  for i in range(CMS_DEPTH))


def _cms_buckets(u: np.ndarray) -> list[np.ndarray]:
    from .eventops import _mix64
    return [(_mix64(u + np.uint64(s)) & np.uint64(CMS_WIDTH - 1))
            .astype(np.int64) for s in CMS_SALTS]


def cms_topk_counts(docs_ds, k: int = CMS_TOPK):
    """Count-min sketch over the corpus token stream, read back at the
    exact top-k tokens -> (token, n_exact, cms_est) sorted by token.
    The third sketch-family member: a fixed 4x65536 integer table (2 MB
    anywhere) whose cells are SUMS — associative, so per-block partials
    merge exactly under any order/retry — and whose point estimate
    min_i(cell_i) upper-bounds the true count (one-sided error,
    asserted in tests).  Bitwise oracle: cells are exact int64 sums and
    the probe is a min over the same 4 cells on both sides.

    Scale shape: per-block value_counts partials pre-sum per (row,
    cell), so the ONE exchange carries at most 4 x 65536 rows per block
    regardless of corpus size (vs topk_terms' vocab-sized exchange);
    the materialized sketch is driver-sized by construction.  The
    exchange is keyed by a COARSE cell-range bucket (sizing-derived
    count) with a dense np.add.at merge per bucket — a fine-grained
    groupby(rb).sum over the same rows measured 30x slower (33s -> ~1s
    at 200k docs / 3.5M partial rows): Ray's aggregate cost scales with
    group COUNT, and rb has 2^18 groups where the bucket route has
    ~64.  The exact top-k probe list reuses textops.topk_terms (its
    own vocab-keyed exchange)."""
    from . import textops as _T
    from .sizing import fanout

    n_cells = CMS_DEPTH * CMS_WIDTH
    cells_per = -(-n_cells // min(int(fanout()), 1024))

    def part(batch: pa.Table) -> pa.Table:
        flat = _T._token_lists(_T._text_col(batch)).flatten()
        vc = pc.value_counts(flat)
        u = _T.md5_u64(vc.field("values"))
        c = vc.field("counts").cast(pa.int64()).to_numpy()
        rbs, cs = [], []
        for i, b in enumerate(_cms_buckets(u)):
            rb = np.int64(i) * np.int64(CMS_WIDTH) + b
            uk, inv = np.unique(rb, return_inverse=True)
            rbs.append(uk)
            cs.append(np.bincount(inv, weights=c,
                                  minlength=len(uk)).astype(np.int64))
        rb = np.concatenate(rbs)
        return pa.table({"rb": rb, "c": np.concatenate(cs),
                         "bk": rb // np.int64(cells_per)})

    def merge(g: pa.Table) -> pa.Table:
        rb = g["rb"].to_numpy()
        base = (rb[0] // cells_per) * cells_per
        dense = np.zeros(cells_per, np.int64)
        np.add.at(dense, rb - base, g["c"].to_numpy())
        nz = np.flatnonzero(dense)
        return pa.table({"rb": nz + base, "c": dense[nz]})

    cms_rows = (mat(docs_ds.map_batches(part, batch_format="pyarrow"))
                .groupby("bk").map_groups(merge, batch_format="pyarrow"))
    cells = np.zeros(n_cells, np.int64)
    for b in cms_rows.iter_batches(batch_size=None,
                                   batch_format="pyarrow"):
        cells[b["rb"].to_numpy()] = b["c"].to_numpy()

    top = _T.topk_terms(docs_ds, k=k).to_pandas()
    toks = np.asarray(top["token"], dtype=object)
    n_exact = top["n"].to_numpy()
    u = _T.md5_u64(toks)
    est = np.full(len(toks), np.iinfo(np.int64).max, np.int64)
    for i, b in enumerate(_cms_buckets(u)):
        est = np.minimum(est, cells[i * CMS_WIDTH + b])
    order = np.argsort(toks.astype("U"), kind="stable") \
        if len(toks) else np.zeros(0, np.int64)
    return pa.table({
        "token": pa.array(toks[order], pa.string()),
        "n_exact": n_exact[order],
        "cms_est": est[order],
    })


def cms_topk_counts_sql(k: int = CMS_TOPK) -> str:
    from . import textops as _T
    from .eventops import _mix64_sql
    w64 = "18446744073709551616"

    def b_expr(i):
        salted = (f"CAST((CAST(u AS HUGEINT) + {CMS_SALTS[i]}) % {w64}"
                  f" AS UBIGINT)")
        return (f"CAST({_mix64_sql(salted)} & {CMS_WIDTH - 1}"
                f" AS BIGINT)")

    cell_rows = " UNION ALL ".join(
        f"SELECT {i} * {CMS_WIDTH} + {b_expr(i)} AS rb, c FROM h"
        for i in range(CMS_DEPTH))
    probe_cells = " OR ".join(
        f"c.rb = {i} * {CMS_WIDTH} + p.b{i}" for i in range(CMS_DEPTH))
    probe_bs = ", ".join(f"{b_expr(i)} AS b{i}"
                         for i in range(CMS_DEPTH))
    return f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
             FROM documents),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY token),
h AS (SELECT token, c, {_T.md5_u64_sql("token")} AS u FROM cnt),
cms AS (SELECT rb, CAST(sum(c) AS BIGINT) AS s
        FROM ({cell_rows}) GROUP BY rb),
top AS (SELECT token, c AS n_exact FROM cnt
        ORDER BY c DESC, token LIMIT {int(k)}),
probes AS (SELECT t.token, t.n_exact, {probe_bs}
           FROM top t JOIN h ON t.token = h.token)
SELECT p.token, p.n_exact,
       (SELECT min(c.s) FROM cms c WHERE {probe_cells}) AS cms_est
FROM probes p
ORDER BY p.token
"""
