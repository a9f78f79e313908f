"""Size-derived fan-out: unit rules + the bucket-count / chunk-size
invariance contract (bucket count and ts-chunking change task granularity
only, never results — VERDICT r03 'derive every fan-out from data/cluster
size' + 'hot-user chunking')."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_fanout_rules():
    from covertile import sizing

    b = sizing.fanout()
    assert b & (b - 1) == 0 and b >= 8          # power of two, floor
    assert sizing.fanout(rows=10) == b          # tiny input: CPU floor
    big = sizing.fanout(rows=10_000_000_000)    # 10G rows: row-bounded
    assert big >= 10_000_000_000 // sizing.TARGET_ROWS_PER_BUCKET
    assert big <= 1 << 16                       # clamp
    assert int(sizing.bucket_shift(8)) == 61    # 2^3 buckets -> top 3 bits
    assert int(sizing.bucket_shift(256)) == 56


def test_table_rows_metadata_only():
    from covertile import sizing

    n = sizing.table_rows(SF, "events")
    assert n is not None and n > 0
    assert sizing.table_rows(SF, "no_such_table") is None


def _df(ds):
    return ds.to_pandas().reset_index(drop=True)


def _assert_frames_equal(a, b):
    assert len(a) == len(b) and len(a) > 0
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        x, y = a[c].to_numpy(), b[c].to_numpy()
        if x.dtype.kind == "f":
            assert np.array_equal(x.view(np.int64), y.view(np.int64)), c
        else:
            assert np.array_equal(x, y), c


def _events(columns):
    import ray.data as rd
    return rd.read_parquet(f"{SF}/events.parquet", columns=list(columns))


@pytest.mark.parametrize("op,cols,kw", [
    ("funnel", ("event_id", "ts", "user_id", "event_type", "value"), {}),
    ("rolling_window", ("event_id", "ts", "user_id", "value"), {}),
    ("transition_counts", ("event_id", "ts", "user_id", "event_type"), {}),
    ("sessionize", ("user_id", "ts"), {}),
])
def test_bucket_count_invariance(ray_session, op, cols, kw):
    """Same operator at 4 and 64 buckets: bitwise-identical output."""
    from covertile import eventops

    fn = getattr(eventops, op)
    a = _df(fn(_events(cols), nbuckets=4, **kw))
    b = _df(fn(_events(cols), nbuckets=64, **kw))
    _assert_frames_equal(a, b)


@pytest.mark.parametrize("op,cols", [
    ("funnel", ("event_id", "ts", "user_id", "event_type", "value")),
    ("rolling_window", ("event_id", "ts", "user_id", "value")),
    ("transition_counts", ("event_id", "ts", "user_id", "event_type")),
])
def test_chunking_invariance(ray_session, op, cols):
    """1-hour chunks force most windows/transitions through the boundary
    stitch path; results must equal the default 24h-chunk run."""
    from covertile import eventops

    fn = getattr(eventops, op)
    a = _df(fn(_events(cols), chunk_hours=1))
    b = _df(fn(_events(cols), chunk_hours=24))
    _assert_frames_equal(a, b)


def test_hot_user_synthetic_chunk_split(ray_session):
    """One pathological user owning 99% of events: with 1h chunks the
    user's history fragments across many (user, chunk) groups, and the
    stitched rolling window still matches the single-group answer."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.eventops import rolling_window

    rng = np.random.default_rng(7)
    m = 5000
    uid = np.where(rng.random(m) < 0.99, 1, rng.integers(2, 5, m))
    ts = (np.datetime64("2024-01-01", "us")
          + rng.integers(0, 14 * 24 * 3600, m).astype("timedelta64[s]"))
    tbl = pa.table({
        "event_id": np.arange(m, dtype=np.int64),
        "user_id": uid.astype(np.int64),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "value": np.round(rng.random(m) * 100, 2),
    })
    a = _df(rolling_window(rd.from_arrow(tbl), chunk_hours=1, nbuckets=16))
    b = _df(rolling_window(rd.from_arrow(tbl), chunk_hours=10**6,
                           nbuckets=1))
    _assert_frames_equal(a, b)


def test_hash_join_bucket_invariance(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from covertile.joins import hash_join_int_key

    def run(nb):
        left = rd.from_arrow(pa.table({
            "k": np.arange(100, dtype=np.int64),
            "x": np.arange(100, dtype=np.int64) * 2}))
        right = rd.from_arrow(pa.table({
            "k": np.arange(0, 100, 3, dtype=np.int64),
            "y": np.arange(0, 100, 3, dtype=np.int64) + 7}))
        return (hash_join_int_key(left, right, "k", num_buckets=nb)
                .sort("k").to_pandas().reset_index(drop=True))

    _assert_frames_equal(run(2), run(None))


def test_partition_target_clamped():
    """VERDICT r04 #1: the driver-surface index build must NOT scale its
    per-partition point count linearly with n — past the clamp the
    partition COUNT grows with n instead (reference contract: per-hub
    load balance, src/DistCoverTree.cpp:726-758)."""
    from covertile.api import MIN_PARTITIONS, partition_target
    from covertile.pipeline import DEFAULT_TARGET_PARTITION_POINTS

    cap = DEFAULT_TARGET_PARTITION_POINTS
    assert partition_target(1_000) == max(256, 1_000 // MIN_PARTITIONS)
    assert partition_target(10**9) == cap          # clamped, not n/8
    assert partition_target(10**12) == cap
    # implied partition count grows with n past the clamp
    parts = [n // partition_target(n) for n in
             (10 * cap, 100 * cap, 1000 * cap)]
    assert parts == sorted(parts) and parts[0] < parts[-1]
    assert parts[-1] >= 1000  # not capped at MIN_PARTITIONS-way


def test_knn_spill_threshold_store_derived(ray_session):
    """VERDICT r04 #6: the auto-spill threshold derives from the cluster
    object store, not a host-tuned constant."""
    import ray
    from covertile import queries

    store = ray.cluster_resources().get("object_store_memory")
    thr = queries.knn_spill_threshold_rows()
    assert thr == int(store * queries.KNN_SPILL_STORE_FRACTION
                      // queries.KNN_DONE_ROW_BYTES)
    # same decision as the old 32M-row constant at this host's bench
    # sizes: 500k*8 done rows stay in-memory, 16M*8 spill
    assert 500_000 * 8 < thr < 16_000_000 * 8


def test_pids_ds_blocks_scale_with_cluster(ray_session, monkeypatch):
    """VERDICT r04 #2: self-join dispatch block count derives from
    cluster CPUs (4 dispatch tasks per CPU), not a fixed 256 cap.

    Asserts the contract (parallelism tracks cluster size, clamped to
    the pid count) with tolerance for Ray's dynamic block splitting —
    a read task may emit one extra block, so exact equality on
    num_blocks() is not stable across Ray versions."""
    from covertile import sizing
    from covertile.queries import _pids_ds

    class _Plan:
        num_partitions = 10_000

    class _Idx:
        plan = _Plan()

    for cpus in (8, 32):
        monkeypatch.setattr(sizing, "cluster_cpus", lambda c=cpus: c)
        ds = _pids_ds(_Idx()).materialize()
        expect = min(10_000, 4 * cpus)
        nb = ds.num_blocks()
        assert expect <= nb <= expect + max(2, expect // 16), (cpus, nb)
        assert ds.count() == 10_000

    # clamp: fewer pids than dispatch slots -> one block per pid
    _Plan.num_partitions = 5
    monkeypatch.setattr(sizing, "cluster_cpus", lambda: 32)
    ds = _pids_ds(_Idx()).materialize()
    assert 5 <= ds.num_blocks() <= 7
    assert ds.count() == 5
