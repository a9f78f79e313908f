"""Interleaved text+media span table: derivation, invariant, flat stats.

The north rule mandates the engine operate over tables shaped
    (doc_id, spans: list<struct<kind, text, media_ref, offset:int32>>)
with the per-row span-sequence invariant — (kind, text, media_ref, order)
byte-identical between pipeline input and output (BASELINE.json input_hint).

`interleave_spans` derives that table deterministically from a flat
documents table: the text is split into W-codeunit chunks and media spans
(doc_id % 3 of them) are interleaved one-for-one after each text chunk.
Geometry never touches the spans column: the heavy spatial shuffles move
only (doc_id, x, y, cell) and results re-join spans by doc_id at output
time (SURVEY.md §7.4 risk 4), so media payload bytes never transit the
spatial exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TEXT_CHUNK = 120  # codeunits per text span
MEDIA_MOD = 3     # doc_id % MEDIA_MOD media spans per doc

SPAN_TYPE = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])


def span_counts(doc_id: np.ndarray, n_chars: np.ndarray):
    """(n_text, n_media) per doc — mirrored by the SQL in api.sql_span_stats."""
    n_text = np.maximum(1, -(-np.asarray(n_chars, np.int64) // TEXT_CHUNK))
    n_media = np.asarray(doc_id, np.int64) % MEDIA_MOD
    return n_text, n_media


def interleave_spans(batch: pa.Table) -> pa.Table:
    """documents batch (doc_id, text, source, n_chars) -> (doc_id, spans).

    Vectorized: loops over chunk INDEX (max ~n_chars/W iterations), never
    over rows; string slicing via pyarrow utf8_slice_codeunits; media refs
    via binary_join_element_wise.
    """
    ids = batch["doc_id"].to_numpy()
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    source = batch["source"]
    if isinstance(source, pa.ChunkedArray):
        source = source.combine_chunks()
    n_chars = pc.utf8_length(text).to_numpy()
    n_text, n_media = span_counts(ids, n_chars)
    total = n_text + n_media
    doc_off = np.zeros(len(ids) + 1, np.int64)
    np.cumsum(total, out=doc_off[1:])

    rows, poss, kinds, texts, refs = [], [], [], [], []
    max_t = int(n_text.max()) if len(n_text) else 0
    for i in range(max_t):
        sel = np.flatnonzero(n_text > i)
        if not len(sel):
            break
        sel_a = pa.array(sel)
        chunk = pc.utf8_slice_codeunits(
            pc.take(text, sel_a), start=i * TEXT_CHUNK,
            stop=(i + 1) * TEXT_CHUNK)
        rows.append(sel)
        # position of text i: i texts + min(i, M) medias before it
        poss.append(i + np.minimum(i, n_media[sel]))
        kinds.append(np.zeros(len(sel), np.int8))
        texts.append(chunk)
        refs.append(pa.nulls(len(sel), pa.string()))
    for j in range(MEDIA_MOD):
        sel = np.flatnonzero(n_media > j)
        if not len(sel):
            continue
        sel_a = pa.array(sel)
        ref = pc.binary_join_element_wise(
            "media://", pc.take(source, sel_a), "/",
            pa.array(ids[sel].astype(str)), "/", str(j), "")
        rows.append(sel)
        # position of media j: min(j+1, T) texts + j medias before it
        poss.append(np.minimum(j + 1, n_text[sel]) + j)
        kinds.append(np.ones(len(sel), np.int8))
        texts.append(pa.nulls(len(sel), pa.string()))
        refs.append(ref)

    row = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    pos = np.concatenate(poss) if poss else np.zeros(0, np.int64)
    kind = np.concatenate(kinds) if kinds else np.zeros(0, np.int8)
    text_f = pa.concat_arrays([a if isinstance(a, pa.Array)
                               else a.combine_chunks() for a in texts]) \
        if texts else pa.array([], pa.string())
    ref_f = pa.concat_arrays([a for a in refs]) if refs \
        else pa.array([], pa.string())

    order = np.lexsort((pos, row))
    order_a = pa.array(order)
    struct = pa.StructArray.from_arrays([
        pc.take(pa.array(np.where(kind == 0, "text", "media")[order]),
                pa.array(np.arange(len(order)))),
        pc.fill_null(pc.take(text_f, order_a), ""),
        pc.fill_null(pc.take(ref_f, order_a), ""),
        pa.array(pos[order].astype(np.int32)),
    ], fields=list(SPAN_TYPE))
    spans = pa.LargeListArray.from_arrays(doc_off, struct)
    return pa.table({"doc_id": ids, "spans": spans})


def span_table(docs_ds):
    """documents Dataset -> (doc_id, spans) Dataset."""
    return docs_ds.map_batches(interleave_spans, batch_format="pyarrow")


def flatten_spans(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) -> one row per span (doc_id, kind, text, media_ref,
    offset) — for stats/inspection; inverse direction of interleave."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lens = np.asarray(pc.list_value_length(spans))
    ids = np.repeat(batch["doc_id"].to_numpy(), lens)
    flat = spans.flatten()
    return pa.table({
        "doc_id": ids,
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset").cast(pa.int32()),
    })


def span_sequences_equal(a: pa.Table, b: pa.Table) -> bool:
    """Per-row span-sequence invariant: identical (kind, text, media_ref,
    offset) sequences per doc_id between two span tables."""
    fa = flatten_spans(a)
    fb = flatten_spans(b)
    if len(fa) != len(fb):
        return False
    ka = fa.sort_by([("doc_id", "ascending"), ("offset", "ascending")])
    kb = fb.sort_by([("doc_id", "ascending"), ("offset", "ascending")])
    return ka.equals(kb)
