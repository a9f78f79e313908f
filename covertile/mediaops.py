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
    """Vectorized sum of ascii codes per string (the fake-decode seed).

    Reads the flat Arrow string buffer directly (offsets + data), same
    discipline as textops.shingle_batch — no Python-object round trip."""
    ta = refs.combine_chunks() if isinstance(refs, pa.ChunkedArray) else refs
    if not pa.types.is_large_string(ta.type):
        ta = ta.cast(pa.large_string())
    off = np.frombuffer(ta.buffers()[1], np.int64)[
        ta.offset: ta.offset + len(ta) + 1]
    data = np.frombuffer(ta.buffers()[2], np.uint8)
    cs = np.concatenate(([0], np.cumsum(data, dtype=np.int64)))
    return cs[off[1:]] - cs[off[:-1]]


def _require_codec():
    """Import-gate for the real codec path.  Returns the PIL Image module
    or raises NotImplementedError (this container ships no codecs; tests
    assert the gate, the decode body runs wherever PIL is installed)."""
    try:
        from PIL import Image
        return Image
    except ImportError as e:
        raise NotImplementedError(
            "real media decode requires an image codec library (PIL); "
            "this environment ships none — the deterministic fake "
            "exercises the identical Ray plumbing") from e


def _decode_real(payloads: pa.Array) -> dict:
    """Real decode over a BINARY payload column: encoded image bytes ->
    (width, height, n_frames).  Per-image codec calls are inherently
    per-item (libjpeg/libpng decode one buffer at a time), which is why
    MEDIA_BATCH stays small and the stage is an actor pool; everything
    around the codec loop is columnar."""
    Image = _require_codec()
    import io
    n = len(payloads)
    w = np.empty(n, np.int64)
    h = np.empty(n, np.int64)
    nf = np.empty(n, np.int64)
    for i in range(n):
        with Image.open(io.BytesIO(payloads[i].as_py())) as im:
            w[i] = im.width
            h[i] = im.height
            nf[i] = int(getattr(im, "n_frames", 1))
    return {"width": w, "height": h, "n_frames": nf}


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
        # fail fast at actor start, not per batch; the loaded module is
        # the per-actor codec handle (one import per actor, not per call)
        self.codec = _require_codec() if use_real_codec else "fake-v1"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.use_real:
            payload = batch["payload"]
            if isinstance(payload, pa.ChunkedArray):
                payload = payload.combine_chunks()
            feats = _decode_real(payload)
            out = batch.select(["doc_id", "media_ref", "offset"])
            for name, arr in feats.items():
                out = out.append_column(name, pa.array(arr, pa.int64()))
            return out
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
       CAST(160 + 16 * ({s} % 28) AS BIGINT) AS width,
       CAST(90 + 9 * ({s} % 33) AS BIGINT) AS height,
       CAST(1 + {s} % 24 AS BIGINT) AS n_frames
FROM m ORDER BY doc_id, "offset"
"""


RESIZE_W, RESIZE_H = 224, 224
FRAME_SAMPLE_N = 4


class MediaResizeActor:
    """Actor-pool resize stage: consumes decoded features and emits the
    letterboxed target geometry (scale = min(W/w, H/h), centered) — pure
    integer arithmetic on the fake-decoded dims so the SQL oracle is
    exact.  A real implementation would transform the binary payload with
    the codec handle loaded in __init__; the geometry contract is what
    downstream stages consume either way."""

    def __init__(self, target_w: int = RESIZE_W, target_h: int = RESIZE_H):
        self.tw, self.th = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy()
        h = batch["height"].to_numpy()
        # integer letterbox: scaled = floor(dim * t / max-side limiting)
        out_w = np.where(w * self.th <= h * self.tw,
                         (w * self.th) // h, self.tw).astype(np.int64)
        out_h = np.where(w * self.th <= h * self.tw,
                         self.th, (h * self.tw) // w).astype(np.int64)
        out = batch.select(["doc_id", "media_ref", "offset"])
        out = out.append_column("out_w", pa.array(out_w, pa.int64()))
        out = out.append_column("out_h", pa.array(out_h, pa.int64()))
        out = out.append_column(
            "pad_x", pa.array((self.tw - out_w) // 2, pa.int64()))
        out = out.append_column(
            "pad_y", pa.array((self.th - out_h) // 2, pa.int64()))
        return out


class FrameSampleActor:
    """Actor-pool frame-sampling stage: n_samples evenly spaced frame
    indices per media span (frame i -> floor(i * n_frames / n_samples)),
    exploded one row per sampled frame — the video-pipeline shape where a
    later stage decodes exactly these frames."""

    def __init__(self, n_samples: int = FRAME_SAMPLE_N):
        self.n = n_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        nf = batch["n_frames"].to_numpy()
        take = np.minimum(nf, self.n)
        rep = np.repeat(np.arange(len(nf)), take)
        pos = np.arange(take.sum(), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(take)))[:-1], take)
        frame = (pos * nf[rep]) // take[rep]
        out = pa.table({
            "doc_id": batch["doc_id"].take(pa.array(rep)),
            "media_ref": batch["media_ref"].take(pa.array(rep)),
            "offset": batch["offset"].take(pa.array(rep)),
            "sample_idx": pos,
            "frame_idx": frame.astype(np.int64),
        })
        return out


def media_resize(docs_ds, concurrency=(1, 4)):
    return media_features(docs_ds, concurrency).map_batches(
        MediaResizeActor, batch_format="pyarrow",
        batch_size=MEDIA_BATCH, concurrency=concurrency)


def frame_sample(docs_ds, concurrency=(1, 4)):
    return media_features(docs_ds, concurrency).map_batches(
        FrameSampleActor, batch_format="pyarrow",
        batch_size=MEDIA_BATCH, concurrency=concurrency)


def media_resize_sql(tw: int = RESIZE_W, th: int = RESIZE_H) -> str:
    base = media_features_sql().strip().rstrip()
    base = base[: base.rindex("ORDER BY")]
    return f"""
WITH feat AS ({base})
SELECT doc_id, media_ref, "offset",
       CASE WHEN width * {th} <= height * {tw}
            THEN (width * {th}) // height ELSE {tw} END AS out_w,
       CASE WHEN width * {th} <= height * {tw}
            THEN {th} ELSE (height * {tw}) // width END AS out_h,
       ({tw} - CASE WHEN width * {th} <= height * {tw}
               THEN (width * {th}) // height ELSE {tw} END) // 2 AS pad_x,
       ({th} - CASE WHEN width * {th} <= height * {tw}
               THEN {th} ELSE (height * {tw}) // width END) // 2 AS pad_y
FROM feat ORDER BY doc_id, "offset"
"""


def frame_sample_sql(n: int = FRAME_SAMPLE_N) -> str:
    base = media_features_sql().strip()
    base = base[: base.rindex("ORDER BY")]
    return f"""
WITH feat AS ({base}),
s AS (
  SELECT doc_id, media_ref, "offset",
         CAST(n_frames AS BIGINT) AS n_frames,
         CAST(LEAST(n_frames, {n}) AS BIGINT) AS take,
         unnest(range(CAST(LEAST(n_frames, {n}) AS BIGINT))) AS sample_idx
  FROM feat
)
SELECT doc_id, media_ref, "offset", sample_idx,
       (sample_idx * n_frames) // take AS frame_idx
FROM s ORDER BY doc_id, "offset", sample_idx
"""
