"""Multimodal (media-span) operators: decode / feature-extract plumbing.

The interleaved documents carry media spans as opaque references
(media_ref strings standing in for binary payload columns; this container
has no image/audio codecs).  Per the brief, the DECODE step is stubbed —
`_decode_real` raises NotImplementedError unless a codec library is
importable — while the Ray-side plumbing is real and tested: schema,
actor-pool stage (codec "loaded" once per actor in __init__), batch
sizing, and output layout.

The deterministic fake decode is a pure function of media_ref (ascii-sum
arithmetic), so the whole pipeline has a bitwise DuckDB oracle: the span
derivation is mirrored via UNNEST(range(doc_id % 3)) and the fake feature
formulas in SQL integer arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import spans as S

MEDIA_BATCH = 1024  # binary payloads need small batches (brief: memory-aware)


def _ascii_sum(refs: pa.Array) -> np.ndarray:
    """Vectorized sum of ascii codes per string (the fake-decode seed)."""
    # utf8 here is pure ascii; sum bytes via the flattened binary buffer
    b = pc.cast(refs, pa.binary())
    lens = np.asarray(pc.binary_length(b), np.int64)
    joined = b.cast(pa.large_binary())
    buf = np.frombuffer(
        b"".join(joined.to_pylist()), dtype=np.uint8).astype(np.int64)
    off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=off[1:])
    cs = np.concatenate(([0], np.cumsum(buf)))
    return cs[off[1:]] - cs[off[:-1]]


def _decode_real(refs):
    try:
        import PIL  # noqa: F401  (not present in this container)
    except ImportError:
        raise NotImplementedError(
            "real media decode requires an image/audio codec library; "
            "this environment ships none — the deterministic fake below "
            "exercises the identical Ray plumbing")
    raise NotImplementedError("codec integration point")


def fake_decode(refs: pa.Array):
    """Deterministic stand-in for decode: features are integer functions of
    the ascii sum s of media_ref (mirrored in media_features_sql)."""
    s = _ascii_sum(refs)
    return {
        "width": 160 + 16 * (s % 28),
        "height": 90 + 9 * (s % 33),
        "n_frames": 1 + s % 24,
    }


class MediaDecodeActor:
    """map_batches callable CLASS (actor pool): per-actor one-time codec
    setup in __init__, per-batch vectorized decode in __call__.

    Input batch:  (doc_id, media_ref, offset)
    Output batch: (doc_id, media_ref, offset, width, height, n_frames)
    """

    def __init__(self, use_real_codec: bool = False):
        self.use_real = use_real_codec
        if use_real_codec:
            _decode_real(None)  # fail fast at actor start, not per batch
        self.codec = "fake-v1"  # stands in for a loaded model/codec handle

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"]
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.combine_chunks()
        feats = fake_decode(refs)
        out = batch.select(["doc_id", "media_ref", "offset"])
        for name, arr in feats.items():
            out = out.append_column(name, pa.array(arr, pa.int64()))
        return out


def media_spans(docs_ds):
    """documents -> one row per MEDIA span: (doc_id, media_ref, offset).
    Spans are derived (S.span_table) then filtered to kind == 'media' —
    the text payload never enters the media stage."""
    tbl = S.span_table(docs_ds)

    def flatten_media(batch: pa.Table) -> pa.Table:
        flat = S.flatten_spans(batch)
        mask = pc.equal(flat["kind"], "media")
        sel = flat.filter(mask)
        return pa.table({
            "doc_id": sel["doc_id"],
            "media_ref": sel["media_ref"],
            "offset": sel["offset"].cast(pa.int64()),
        })

    return tbl.map_batches(flatten_media, batch_format="pyarrow")


def media_features(docs_ds, concurrency=(1, 4)):
    """Full media pipeline: span derivation -> media-span flatten ->
    actor-pool decode (stub-gated real codec, deterministic fake)."""
    return media_spans(docs_ds).map_batches(
        MediaDecodeActor,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=concurrency,
    )


def media_features_sql() -> str:
    """Mirror: media span j of doc d has ref
    'media://{source}/{d}/{j}' and offset min(j+1, n_text) + j, where
    n_text = max(1, ceil(n_chars / TEXT_CHUNK)) (spans.py derivation)."""
    nt = (f"GREATEST(1, CAST(ceil(n_chars / {S.TEXT_CHUNK}.0) AS BIGINT))")
    ref = "concat('media://', source, '/', CAST(doc_id AS VARCHAR), '/', CAST(j AS VARCHAR))"
    s = (f"list_sum(list_transform(range(1, length({ref}) + 1), "
         f"i -> ascii(substr({ref}, CAST(i AS INT), 1))))")
    return f"""
WITH m AS (
  SELECT doc_id, unnest(range(doc_id % {S.MEDIA_MOD})) AS j, source, n_chars
  FROM documents
)
SELECT doc_id,
       {ref} AS media_ref,
       LEAST(j + 1, {nt}) + j AS "offset",
       160 + 16 * ({s} % 28) AS width,
       90 + 9 * ({s} % 33) AS height,
       1 + {s} % 24 AS n_frames
FROM m ORDER BY doc_id, "offset"
"""
