"""Embedding similarity + multimodal operators: oracles, recall, stubs."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
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
    "ann_topk", "ann_topk_filtered",
    "embedding_cosine_dedup", "cosine_lsh_dedup", "emb_knn",
    "ivf_topk_exact", "ivf_topk_store",
    "media_features", "media_resize", "frame_sample",
    "media_pixel_stats", "media_dedup", "dim_stats",
    "cosine_neardup_incremental",
])
def test_vec_query_matches_oracle(ray_session, con, name):
    from covertile import api_vec
    got = fetch(api_vec.QUERIES[name](SF))
    want = con.execute(api_vec.ORACLES[name]()).df()
    assert_matches(got, want, name)


def test_media_dedup_groups_by_decoded_content(ray_session):
    """Two different refs whose payloads decode to identical
    (dims, frames, pixels) land in ONE group, and every span is
    accounted for exactly once."""
    from covertile import api_vec, mediaops, spans
    out = fetch(api_vec.QUERIES["media_dedup"](SF))
    import duckdb as _dd
    con = _dd.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    n_spans = con.execute(
        f"SELECT CAST(SUM(doc_id % {spans.MEDIA_MOD}) AS BIGINT) "
        f"FROM documents").fetchone()[0]
    assert int(out["n_copies"].sum()) == int(n_spans)
    assert (out["n_copies"] > 1).any()  # real cross-ref dup groups
    # keep_ref is the lexicographic min of its group: unique keys
    assert out["keep_ref"].is_unique


def test_float_margins_are_safe(con):
    """The no-float-output contract relies on comparisons never sitting
    within summation-order noise (~1e-7) of a decision boundary: check the
    tau gap and the rank-k tie gap on this dataset."""
    from covertile.vecops import ANN_K, ANN_NUM_QUERIES, COS_TAU
    df = con.execute("""
SELECT a.vec_id i, b.vec_id j,
       list_cosine_similarity(a.embedding, b.embedding) c
FROM embeddings a, embeddings b WHERE a.vec_id != b.vec_id""").df()
    c = df["c"].to_numpy()
    assert np.abs(c - COS_TAU).min() > 1e-5
    # per-query gap around rank K for the ann query set
    for q in sorted(df["i"].unique())[:ANN_NUM_QUERIES]:
        s = np.sort(df[df["i"] == q]["c"].to_numpy())[::-1]
        assert s[ANN_K - 1] - s[ANN_K] > 1e-5


def test_emb_knn_l2_gap_is_safe(con):
    """emb_knn's (dist asc, id asc) rank contract: adjacent-rank L2 gaps
    on this dataset must dwarf float64 summation-order noise."""
    from covertile.vecops import ANN_K, ANN_NUM_QUERIES
    df = con.execute("""
WITH q AS (SELECT vec_id, embedding FROM embeddings
           ORDER BY vec_id LIMIT {nq})
SELECT q.vec_id i,
  sqrt(list_sum(list_transform(list_zip(q.embedding, e.embedding),
       x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
          * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))) d
FROM q, embeddings e WHERE e.vec_id != q.vec_id
""".format(nq=ANN_NUM_QUERIES)).df()
    for q in df["i"].unique():
        s = np.sort(df[df["i"] == q]["d"].to_numpy())[: ANN_K + 2]
        gaps = np.diff(s)
        gaps = gaps[gaps > 0]  # exact duplicates tie-break by id (int-safe)
        assert gaps.min() > 1e-9


def test_ivf_recall(ray_session):
    """IVF with 4/16 probes must keep high top-k recall vs exact ANN."""
    from covertile import api_vec
    exact = fetch(api_vec.QUERIES["ann_topk"](SF))
    approx = fetch(api_vec.QUERIES["ivf_topk"](SF))
    ek = set(zip(exact["query_id"], exact["neighbor_id"]))
    ak = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(ek & ak) / len(ek)
    assert recall >= 0.7, f"IVF recall too low: {recall}"


def test_ivf_twin_contract(ray_session):
    """The no-oracle `ivf_topk` driver row carries machine-checked
    meaning via its exact twin (SURVEY §8.2):

    (a) probes=ALL — the full IVF path (centroid fit, bucket assignment,
        probe scoring, tie-safe merge) is bitwise the exact ann_topk
        result, i.e. the `ivf_topk_exact` contract the driver checks
        against SQL really is "same machinery, pruning disabled";
    (b) pruned probes — the result is the EXACT top-k over the
        probed-bucket subset (masked exactness, recomputed here in
        straight-line numpy): the approximation lives entirely in WHICH
        buckets are probed, never in scoring, tie-breaking or ranking.
    """
    import pyarrow.parquet as pq
    from covertile import api_vec, vecops

    # (a) probes=all == ann_topk, bitwise (schema + values)
    exact = fetch(api_vec.QUERIES["ann_topk"](SF))
    allp = fetch(api_vec.QUERIES["ivf_topk_exact"](SF))
    assert_matches(allp, exact, "ivf probes=all vs ann_topk")

    # (b) pruned == exact top-k of the probed subset
    got = fetch(api_vec.QUERIES["ivf_topk"](SF))
    cent = api_vec._centroids_of(SF)
    qid, qm = api_vec._queries_of(SF)
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids, m = vecops._emb_matrix(t)
    probe = np.argsort(-(qm @ cent.T), axis=1)[:, : vecops.IVF_PROBES]
    bucket = (m @ cent.T).argmax(1)
    rows = []
    for i in range(len(qid)):
        ok = np.isin(bucket, probe[i]) & (ids != qid[i])
        sub, cos = ids[ok], qm[i] @ m[ok].T
        order = np.lexsort((sub, -cos))[: vecops.ANN_K]
        rows += [(int(qid[i]), r + 1, int(sub[j]))
                 for r, j in enumerate(order)]
    want = sorted(rows)
    assert [tuple(r) for r in
            got[["query_id", "rank", "neighbor_id"]].to_numpy()] == want


def test_png_roundtrip_and_filters():
    """Native PNG codec (stdlib zlib + numpy): encode -> decode is exact
    for gray/RGB/RGBA, and the decoder undoes all five scanline filters
    (synthesized per-filter IDAT streams)."""
    import zlib
    from covertile.mediaops import decode_png, encode_png, png_meta

    rng = np.random.default_rng(3)
    for ch in (1, 3, 4):
        img = rng.integers(0, 256, (13, 7, ch), dtype=np.uint8)
        buf = encode_png(img)
        w, h, depth, _ = png_meta(buf)
        assert (w, h, depth) == (7, 13, 8)
        assert np.array_equal(decode_png(buf), img)
    # hand-built streams exercising filter types 1..4 against a
    # reference unfilter (the spec recurrences, straight-line python)
    w, h, ch = 5, 4, 3
    img = rng.integers(0, 256, (h, w * ch), dtype=np.uint8)
    for f in (1, 2, 3, 4):
        recon = img.astype(np.int64)
        raw = bytearray()
        prev = np.zeros(w * ch, np.int64)
        for y in range(h):
            raw.append(f)
            for x in range(w * ch):
                a = recon[y][x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (
                        b if pb <= pc_ else c)
                raw.append(int((recon[y][x] - pred) % 256))
            prev = recon[y]
        magic = b"\x89PNG\r\n\x1a\n"

        def chunk(t, d):
            crc = zlib.crc32(t + d) & 0xFFFFFFFF
            return len(d).to_bytes(4, "big") + t + d + crc.to_bytes(4, "big")

        ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes([8, 2, 0, 0, 0]))
        buf = (magic + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
        assert np.array_equal(decode_png(buf),
                              img.reshape(h, w, ch)), f"filter {f}"


def test_jpeg_meta_sof_scan():
    from covertile.mediaops import jpeg_meta
    # minimal JPEG skeleton: SOI, APP0, DQT (skipped), SOF0 with 31x17
    sof = (b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
           + (17).to_bytes(2, "big") + (31).to_bytes(2, "big")
           + b"\x01\x11\x00")
    buf = (b"\xff\xd8" + b"\xff\xe0" + (4).to_bytes(2, "big") + b"JF"
           + sof + b"\xff\xd9")
    assert jpeg_meta(buf) == (31, 17)


def test_media_decode_real_branch(ray_session):
    """Real-decode actor over synthesized PNG/JPEG payloads through the
    actual map_batches actor-pool stage; non-PNG/JPEG formats still gate
    on the codec library."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.mediaops import MediaDecodeActor, _decode_real, encode_png

    rng = np.random.default_rng(5)
    pngs = [encode_png(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
            for w, h in [(6, 4), (9, 2), (3, 11)]]
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "media_ref": pa.array(["m/1", "m/2", "m/3"]),
        "offset": pa.array([1, 1, 1], pa.int64()),
        "payload": pa.array(pngs, pa.binary()),
    })
    out = (rd.from_arrow(tbl)
           .map_batches(MediaDecodeActor,
                        fn_constructor_kwargs={"use_real_codec": True},
                        batch_format="pyarrow", concurrency=1)
           .to_pandas().sort_values("doc_id"))
    assert out["width"].tolist() == [6, 9, 3]
    assert out["height"].tolist() == [4, 2, 11]
    assert out["n_frames"].tolist() == [1, 1, 1]
    # unsupported container format -> PIL gate (absent here)
    gif = pa.array([b"GIF89a" + bytes(20)], pa.binary())
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            _decode_real(gif)


def test_media_pixel_resize_actor(ray_session):
    """Real pixel path end-to-end: PNG decode -> letterbox -> re-encode
    inside the actor-pool stage; output payloads decode to the exact
    letterboxed pixels."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.mediaops import (MediaPixelResizeActor, decode_png,
                                    encode_png, letterbox_pixels)

    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (10, 20, 3), dtype=np.uint8),
            rng.integers(0, 256, (16, 8, 3), dtype=np.uint8)]
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([encode_png(i) for i in imgs], pa.binary()),
    })
    out = (rd.from_arrow(tbl)
           .map_batches(MediaPixelResizeActor,
                        fn_constructor_kwargs={"target_w": 12,
                                               "target_h": 6},
                        batch_format="pyarrow", concurrency=1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i, img in enumerate(imgs):
        want = letterbox_pixels(img, 12, 6)
        got = decode_png(out["payload"][i])
        assert np.array_equal(got, want)
        assert got.shape == (6, 12, 3)


def test_media_actor_batch_contract():
    """Actor-pool plumbing: schema in/out, vectorized fake decode."""
    import pyarrow as pa
    from covertile.mediaops import MediaDecodeActor, fake_decode
    a = MediaDecodeActor()
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "media_ref": pa.array(["media://s/1/0", "media://s/2/0"]),
        "offset": pa.array([1, 1], pa.int64()),
    })
    out = a(batch)
    assert out.column_names == ["doc_id", "media_ref", "offset",
                                "width", "height", "n_frames"]
    f = fake_decode(batch["media_ref"].combine_chunks())
    assert out["width"].to_pylist() == list(f["width"])
    # deterministic: same refs -> same features
    assert a(batch).equals(out)


def test_ann_topk_tie_safe_across_blocks(ray_session):
    """Duplicate embeddings tie exactly at the per-block k-th boundary:
    the partial must keep every tied candidate so the global merge can
    pick the smaller-id survivors the (cos desc, id asc) contract needs."""
    import pyarrow as pa
    import ray.data as rd
    from covertile import vecops

    d, k = 8, 3
    base = np.zeros(d, np.float32)
    base[0] = 1.0
    # 20 identical corpus vectors (all cosine 1.0 to the query) split
    # across many blocks, ids shuffled so small ids land in late blocks
    ids = np.array([13, 7, 19, 2, 11, 5, 17, 3, 23, 1,
                    29, 31, 37, 41, 43, 47, 53, 59, 61, 67], np.int64)
    tbl = pa.table({
        "vec_id": ids,
        "embedding": pa.array([base.tolist()] * len(ids),
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(7)
    qid = np.array([1000], np.int64)
    out = vecops.ann_topk(ds, qid, base[None, :].astype(np.float64), k=k)
    got = out.to_pandas().sort_values("rank")
    # smallest ids win the all-ties contest
    assert list(got["neighbor_id"]) == sorted(ids.tolist())[:k]
    assert list(got["rank"]) == [1, 2, 3]


@pytest.mark.parametrize("d", [4, 64])
def test_emb_knn_strategies_agree(ray_session, d):
    """emb_knn's two per-block kernels (cover-tree descent vs blocked BLAS
    scan) must produce IDENTICAL output — same ids, ranks, and tie
    handling — at both a tree-native dimension and a scan-native one."""
    import pyarrow as pa
    import ray.data as rd
    from covertile import vecops

    rng = np.random.default_rng(11)
    n, k = 240, 5
    m = rng.normal(size=(n, d)).astype(np.float32)
    m[40] = m[7]  # exact duplicate -> dist tie broken by vec_id
    ids = rng.permutation(n).astype(np.int64)
    tbl = pa.table({
        "vec_id": ids,
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl).repartition(7)
    qid, qraw = ids[:6].copy(), m[:6].copy()
    frames = {}
    for strat in ("tree", "scan"):
        out = vecops.emb_knn(ds, qid, qraw, k=k, strategy=strat)
        frames[strat] = (out.sort(["query_id", "rank"]).to_pandas()
                         .reset_index(drop=True))
    assert frames["tree"].equals(frames["scan"])
    assert len(frames["scan"]) == 6 * k


def test_cosine_pairs_partitioned_cross_bucket_exact(ray_session):
    """Adversarial: clustered corpus with deliberate boundary pairs that
    cross centroid buckets.  The halo routing must find every pair
    exactly once (brute-force numpy oracle)."""
    import pyarrow as pa
    import ray.data as rd
    from covertile import vecops

    rng = np.random.default_rng(7)
    d, tau = 16, 0.85
    # three separated cluster directions + vectors interpolated BETWEEN
    # clusters so near-dup pairs straddle Voronoi boundaries
    cent_dirs = rng.normal(size=(3, d))
    cent_dirs /= np.linalg.norm(cent_dirs, axis=1, keepdims=True)
    vecs = []
    for i in range(300):
        c = cent_dirs[i % 3]
        v = c + 0.12 * rng.normal(size=d)
        vecs.append(v)
    for i in range(60):  # boundary straddlers: mix two clusters
        a, b = cent_dirs[i % 3], cent_dirs[(i + 1) % 3]
        w = 0.5 + 0.02 * rng.normal()
        v = w * a + (1 - w) * b + 0.05 * rng.normal(size=d)
        vecs.append(v)
    m = np.asarray(vecs, np.float32)
    ids = rng.permutation(len(m)).astype(np.int64)  # ids not cluster-sorted
    tbl = pa.table({
        "vec_id": ids,
        "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
    })
    # brute-force oracle with the engine's own normalization arithmetic
    _, u = vecops._emb_matrix(tbl)
    cos = u @ u.T
    qi, cj = np.nonzero(cos >= tau)
    keep = ids[qi] < ids[cj]
    want = set(zip(ids[qi][keep].tolist(), ids[cj][keep].tolist()))
    assert len(want) > 50  # the fixture really produces cross-bucket pairs

    ds = rd.from_arrow(tbl).repartition(9)
    cent = vecops.fit_centroids(u[:128], n_clusters=3)
    out = vecops.cosine_pairs_partitioned(ds, cent, tau=tau).to_pandas()
    got_list = list(zip(out["a_id"].tolist(), out["b_id"].tolist()))
    assert len(got_list) == len(set(got_list))  # exactly-once emission
    assert set(got_list) == want


def test_ivf_store_equals_inmemory_at_pruned_probes(ray_session, tmp_path):
    """The partition-pruned store read must return byte-identical results
    to the in-memory masked ivf_topk at the SAME pruned operating point
    (not just probes=all)."""
    import ray.data as rd
    from covertile import api_vec, vecops

    cent = api_vec._centroids_of(SF)
    qid, qm = api_vec._queries_of(SF)
    store = str(tmp_path / "ivf")
    vecops.ivf_build_store(api_vec._emb(SF), cent, store)
    got = fetch(vecops.ivf_topk_store(store, qid, qm)
                .sort(["query_id", "rank"]))
    want = fetch(vecops.ivf_topk(api_vec._emb(SF), qid, qm, cent)
                 .sort(["query_id", "rank"]))
    assert got.equals(want)
    # pruning is real: non-probed bucket dirs exist but were not read
    import glob, os
    all_b = {os.path.basename(p) for p in glob.glob(store + "/bucket=*")}
    probe = set()
    import numpy as np
    pr = np.argsort(-(qm @ np.load(store + "/centroids.npy").T),
                    axis=1)[:, : vecops.IVF_PROBES]
    probe = {f"bucket={int(b)}" for b in np.unique(pr)}
    assert probe <= all_b and (len(probe) < len(all_b) or len(all_b) <= 6)


def test_sq_quantization_roundtrip_and_oracle(ray_session):
    """int8 scalar quantization: codes match the DuckDB list expression
    ELEMENT-WISE (the driver query only sees the checksum projection),
    reconstruction error is bounded by scale/2, and codes stay in
    [-127, 127]."""
    import duckdb
    import pyarrow.parquet as pq
    from covertile.vecops import _SQ_CODE, _SQ_SCALE, _raw_matrix, _sq_codes

    SF = "/root/testdata/sf0.001"
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids, m = _raw_matrix(t)
    s, c = _sq_codes(m)
    assert np.abs(c).max() <= 127
    deq = c * s[:, None]
    assert np.abs(deq - m.astype(np.float64)).max() <= (s.max() / 2) + 1e-12
    con = duckdb.connect()
    con.register("embeddings", t)
    sql = (f"WITH d AS (SELECT vec_id, embedding, {_SQ_SCALE} AS s "
           f"FROM embeddings) "
           f"SELECT vec_id, list_transform(embedding, v -> {_SQ_CODE}) "
           f"AS codes FROM d ORDER BY vec_id")
    want = con.execute(sql).df()
    order = np.argsort(ids)
    for row, codes in zip(order, want["codes"]):
        assert np.array_equal(c[row], np.asarray(codes, np.float64)), ids[row]


def test_sq_ann_recall_vs_exact(ray_session):
    """Search over 4x-compressed vectors keeps high overlap with the
    exact full-precision top-k (quantization noise ~1e-2 on unit
    vectors)."""
    from covertile import api_vec
    SF = "/root/testdata/sf0.001"
    exact = api_vec.QUERIES["ann_topk"](SF).to_pandas()
    sq = api_vec.QUERIES["sq_ann_topk"](SF).to_pandas()
    ek = set(zip(exact["query_id"], exact["neighbor_id"]))
    sk = set(zip(sq["query_id"], sq["neighbor_id"]))
    assert len(ek & sk) / len(ek) >= 0.8


def test_ivf_sq_store_handles_empty_blocks(ray_session, tmp_path):
    """A zero-row block through ivf_sq_build_store.assign (np.arange step
    d=0) or ivf_sq_topk_store.partial (reshape(0,-1)) must not crash —
    streaming pipelines routinely produce empty blocks after filters."""
    import pyarrow as pa
    import ray.data as rd
    from covertile import api_vec, vecops

    cent = api_vec._centroids_of(SF)
    qid, qm = api_vec._queries_of(SF)
    emb = api_vec._emb(SF)
    tbl = emb.take_batch(64, batch_format="pyarrow")
    empty = tbl.slice(0, 0)
    ds = rd.from_arrow([empty, tbl, empty])
    store = str(tmp_path / "sqstore_empty")
    vecops.ivf_sq_build_store(ds, cent, store)
    out = (vecops.ivf_sq_topk_store(store, qid, qm, probes=len(cent))
           .to_pandas())
    assert len(out) > 0


def test_ivf_sq_store_pruned_equals_masked(ray_session, tmp_path):
    """The compressed store at a PRUNED operating point (probes < all)
    must return exactly what in-memory dequantized scoring restricted to
    the same probe masks returns; and the store holds no raw embedding
    column (codes + scale only)."""
    import glob
    import pyarrow.parquet as pq
    import ray.data as rd
    from covertile import api_vec, vecops

    cent = api_vec._centroids_of(SF)
    qid, qm = api_vec._queries_of(SF)
    store = str(tmp_path / "sqstore")
    vecops.ivf_sq_build_store(api_vec._emb(SF), cent, store)
    f = glob.glob(store + "/bucket=*/*.parquet")[0]
    names = pq.ParquetFile(f).schema_arrow.names
    assert "embedding" not in names and "codes" in names and "scale" in names
    a = (vecops.ivf_sq_topk_store(store, qid, qm,
                                  probes=vecops.IVF_PROBES)
         .to_pandas().sort_values(["query_id", "rank"])
         .reset_index(drop=True))
    b = (vecops.ivf_sq_topk_store(store, qid, qm, probes=len(cent))
         .to_pandas().sort_values(["query_id", "rank"])
         .reset_index(drop=True))
    # pruned results are a (possibly different) exact top-k over fewer
    # buckets; recall against the full sweep stays high on this data
    ak = set(zip(a["query_id"], a["neighbor_id"]))
    bk = set(zip(b["query_id"], b["neighbor_id"]))
    assert len(ak & bk) / len(bk) >= 0.7
    # full sweep equals in-memory compressed search bitwise
    c = (vecops.sq_ann_topk(api_vec._emb(SF), qid, qm)
         .to_pandas().sort_values(["query_id", "rank"])
         .reset_index(drop=True))
    for col in b.columns:
        assert np.array_equal(b[col].to_numpy(), c[col].to_numpy()), col


def test_png_actl_frame_count_roundtrip():
    """APNG acTL metadata: encode_png(n_frames=k) writes an acTL chunk
    before IDAT; png_frames reads it back; plain PNGs report 1; the
    pixel payload still decodes identically."""
    from covertile.mediaops import decode_png, encode_png, png_frames

    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    plain = encode_png(img)
    anim = encode_png(img, n_frames=7)
    assert png_frames(plain) == 1
    assert png_frames(anim) == 7
    assert np.array_equal(decode_png(anim), decode_png(plain))


def test_media_store_idempotent_and_real_bytes(ray_session):
    """ensure_media_store writes the payload table once (marker file);
    every payload is a REAL PNG whose header dims and acTL frame count
    equal the media_ref contract, and whose pixels sum to the closed
    form the SQL oracle uses."""
    import os
    from covertile.mediaops import (decode_png, ensure_media_store,
                                    fake_decode, png_frames,
                                    _read_media_store)

    sf = "/root/testdata/sf0.001"
    d = ensure_media_store(sf)
    assert os.path.exists(os.path.join(d, "_DONE"))
    assert ensure_media_store(sf) == d  # second call: marker hit
    rows = _read_media_store(
        sf, ["media_ref", "payload"]).take(8)
    import pyarrow as pa
    refs = pa.array([r["media_ref"] for r in rows], pa.string())
    f = fake_decode(refs)  # the contract formulas (pytest helper role)
    for i, r in enumerate(rows):
        img = decode_png(r["payload"])
        assert img.shape == (f["height"][i], f["width"][i], 1)
        assert png_frames(r["payload"]) == f["n_frames"][i]


def test_cosine_lsh_subset_recall_and_dedup(ray_session, con):
    """LSH output == exact output at the planted-twin operating point
    (recall 1.0, precision 1.0), rows unique across bands, and every
    planted twin pair present."""
    from covertile import api_vec, vecops

    got = api_vec.q_cosine_lsh_dedup(SF).to_pandas()
    # uniqueness across bands (the pairs-sized dedup exchange works)
    keys = got["a_id"].to_numpy() * (1 << 32) + got["b_id"].to_numpy()
    assert len(np.unique(keys)) == len(keys)
    exact = con.execute(vecops.cosine_lsh_sql()).df()
    assert got.reset_index(drop=True).equals(exact.reset_index(drop=True))
    # the planted twins are exactly the expected (v, v+OFFSET) pairs
    twins = got[got["b_id"] >= int(vecops.TWIN_OFFSET)]
    assert (twins["b_id"].to_numpy()
            == twins["a_id"].to_numpy() + int(vecops.TWIN_OFFSET)).all()
    assert (twins["a_id"].to_numpy() % vecops.TWIN_EVERY == 0).all()
    assert len(twins) >= 1


def test_cosine_lsh_no_false_positives_low_bands(ray_session):
    """With a single band the verifier still guarantees precision 1.0:
    every emitted pair satisfies the exact float64 cosine threshold."""
    from covertile import api_vec, vecops

    ds = vecops.with_planted_twins(api_vec._emb(SF))
    pairs = vecops.cosine_lsh_pairs(ds, n_bands=1).to_pandas()
    emb = {r["vec_id"]: np.asarray(r["embedding"], np.float64)
           for r in ds.take_all()}
    for a, b in pairs.itertuples(index=False):
        va, vb = emb[a], emb[b]
        cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert cos >= vecops.LSH_TAU - 1e-12


def test_cosine_lsh_verify_paths_agree(ray_session, monkeypatch):
    """_verify_cosine's four executions (collect-vs-semi-join ids x
    broadcast-vs-hash-join verify) emit the identical pair set: the path
    switch is a pure cost decision, never a semantics one."""
    from covertile import api_vec, vecops

    ds = vecops.with_planted_twins(api_vec._emb(SF))

    def run():
        df = vecops.cosine_lsh_pairs(ds).to_pandas()
        return df.sort_values(["a_id", "b_id"]).reset_index(drop=True)

    default = run()
    assert len(default) >= 1
    # force the hash-semi-join id path AND the join-fallback verify
    monkeypatch.setattr(vecops, "LSH_ID_COLLECT_MAX", 0)
    monkeypatch.setattr(vecops, "LSH_BCAST_MAX_FLOATS", 0)
    assert run().equals(default)
    # mixed: collected ids, join verify
    monkeypatch.setattr(vecops, "LSH_ID_COLLECT_MAX", 16_000_000)
    assert run().equals(default)
    # mixed: semi-join ids, broadcast verify
    monkeypatch.setattr(vecops, "LSH_ID_COLLECT_MAX", 0)
    monkeypatch.setattr(vecops, "LSH_BCAST_MAX_FLOATS", 128_000_000)
    assert run().equals(default)


def test_cosine_neardup_store_pruned_subset(ray_session, tmp_path):
    """The pruned operating point (probes < all) returns a SUBSET of
    probes=all (which is exact), and probes=all finds every pair the
    brute cross-split cosine finds."""
    import pyarrow as pa
    import ray.data as rd
    from covertile import vecops

    rng = np.random.default_rng(11)
    d = 16
    cent = rng.standard_normal((4, d))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    # store vecs near centroids; new vecs = jittered copies of some
    n_store, n_new = 60, 12
    sv = cent[rng.integers(0, 4, n_store)] + \
        0.05 * rng.standard_normal((n_store, d))
    nv = sv[:n_new] + 0.01 * rng.standard_normal((n_new, d))

    def tbl(ids, m):
        off = np.arange(0, (len(ids) + 1) * d, d, dtype=np.int64)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.LargeListArray.from_arrays(
                off, pa.array(m.astype(np.float32).reshape(-1),
                              pa.float32())),
        })

    store = str(tmp_path / "cosstore")
    vecops.ivf_build_store(rd.from_arrow(tbl(np.arange(n_store), sv)),
                           cent, store)
    new_ds = tbl(np.arange(100, 100 + n_new), nv)
    exact = (vecops.cosine_neardup_against_store(
        rd.from_arrow(new_ds), store, tau=0.9, probes=None)
        .to_pandas())
    pruned = (vecops.cosine_neardup_against_store(
        rd.from_arrow(new_ds), store, tau=0.9, probes=1)
        .to_pandas())
    ep = {(a, b) for a, b in zip(exact["a_id"], exact["b_id"])}
    pp = {(a, b) for a, b in zip(pruned["a_id"], pruned["b_id"])}
    assert pp <= ep
    # brute truth
    a64 = nv / np.linalg.norm(nv.astype(np.float32).astype(np.float64),
                              axis=1, keepdims=True)
    s64 = sv / np.linalg.norm(sv.astype(np.float32).astype(np.float64),
                              axis=1, keepdims=True)
    # mirror the engine's f32-storage roundtrip before normalizing
    a64 = nv.astype(np.float32).astype(np.float64)
    a64 /= np.linalg.norm(a64, axis=1, keepdims=True)
    s64 = sv.astype(np.float32).astype(np.float64)
    s64 /= np.linalg.norm(s64, axis=1, keepdims=True)
    sim = a64 @ s64.T
    truth = {(100 + i, j) for i, j in zip(*np.nonzero(sim >= 0.9))}
    assert ep == truth
    assert len(ep) >= n_new  # every jittered copy finds its source
