"""Event-stream operators (windowed aggregate, sessionization) vs oracle."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{SF}/events.parquet')")
    return c


@pytest.mark.parametrize("name", ["events_window", "sessionize",
                                  "asof_join", "range_join", "funnel",
                                  "hopping_window", "props_stats",
                                  "cohort_retention",
                                  "window_heavy_hitters",
                                  "value_histogram",
                                  "inter_arrival_stats"])
def test_event_query_matches_oracle(ray_session, con, name):
    from covertile import api_events
    got = api_events.QUERIES[name](SF).to_pandas().reset_index(drop=True)
    want = con.execute(api_events.ORACLES[name]()).df()
    assert len(got) == len(want), (len(got), len(want))
    assert list(got.columns) == list(want.columns)
    for c_ in got.columns:
        a, b = got[c_].to_numpy(), want[c_].to_numpy()
        if a.dtype.kind == "f":
            assert np.array_equal(a.view(np.int64), b.view(np.int64)), c_
        else:
            assert np.array_equal(a, b), c_


def test_props_stats_all_null_group_yields_nulls(ray_session):
    """An event_type whose every row lacks a valid "k" must emit NULL
    sum/min/max (SQL aggregate semantics), not BIG/-BIG/0 sentinels."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.eventops import props_stats, props_stats_sql

    tbl = pa.table({
        "event_type": pa.array(["a", "a", "b", "b", "c"]),
        "props": pa.array(['{"k": 3}', '{"k": 7}',
                           '{"x": 1}', "{}", '{"k": 11}']),
    })
    got = props_stats(rd.from_arrow(tbl)).to_pandas()
    c = duckdb.connect()
    c.register("events", tbl)
    want = c.sql(props_stats_sql()).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == 3
    for col in got.columns:
        a, b = got[col].to_numpy(), want[col].to_numpy()
        if a.dtype.kind == "f":
            assert np.array_equal(a, b, equal_nan=True), col
        else:
            assert np.array_equal(a, b), col
    b_row = got[got["event_type"] == "b"].iloc[0]
    assert np.isnan(b_row["sum_k"]) and np.isnan(b_row["min_k"])


def test_sessionize_gap_semantics(ray_session):
    """Synthetic: one user, events at 0, 10, 50, 95 min with 30-min gap ->
    sessions {0,10}, {50}, {95}."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.eventops import sessionize

    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + np.array([0, 10, 50, 95], "timedelta64[m]").astype(
        "timedelta64[us]")
    t = pa.table({
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        "ts": pa.array(ts),
    })
    out = sessionize(rd.from_arrow(t)).to_pandas()
    assert out["n_sessions"].tolist() == [3]
    assert out["max_session_events"].tolist() == [2]
    assert out["n_events"].tolist() == [4]


def test_sessionize_chunking_invariant(ray_session):
    """The hot-user (user, ts-chunk) split + stitch must be invisible:
    an aggressively small chunk (1h — every session crosses boundaries)
    equals the default-chunk result on the real events table."""
    import ray.data as rd
    from covertile.eventops import sessionize

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    a = sessionize(ev).to_pandas().reset_index(drop=True)
    ev2 = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    b = sessionize(ev2, chunk_hours=1).to_pandas().reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    for c in a.columns:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), c


def test_asof_chunking_invariant(ray_session):
    """A 1-hour chunk forces most matches through the pending/boundary
    stitch path; the result must equal the default 24h-chunk run."""
    import ray.data as rd
    from covertile.eventops import asof_join

    def run(h):
        ev = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["event_id", "ts", "user_id",
                                      "event_type", "value"])
        return (asof_join(ev, chunk_hours=h).to_pandas()
                .reset_index(drop=True))

    assert run(1).equals(run(24))


def test_range_join_halo_exactness(ray_session):
    """Adversarial: views planted just inside/outside chunk boundaries and
    window edges, plus colliding (user, chunk) cells — brute-force numpy
    oracle over every (purchase, view) pair."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.eventops import range_join

    rng = np.random.default_rng(3)
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    day = 86_400_000_000
    rows = []
    eid = 0
    for u in range(40):
        for _ in range(30):
            t = base + int(rng.integers(0, 3 * day))
            kind = ["view", "purchase", "click"][int(rng.integers(0, 3))]
            rows.append((eid, t, u, kind, float(int(rng.integers(0, 10000)) / 100)))
            eid += 1
        # boundary plants: view just before midnight, purchase just after
        for d in (1, 2):
            b = base + d * day
            for dt_v, dt_p in ((-1, 0), (-30 * 60_000_000 + 1, 0),
                               (-30 * 60_000_000, 0), (-1, 1)):
                rows.append((eid, b + dt_v, u, "view", 1.23)); eid += 1
                rows.append((eid, b + dt_p, u, "purchase", 0.0)); eid += 1
    arr = list(zip(*rows))
    t = pa.table({
        "event_id": pa.array(arr[0], pa.int64()),
        "ts": pa.array(np.array(arr[1], np.int64).view("datetime64[us]")),
        "user_id": pa.array(arr[2], pa.int64()),
        "event_type": pa.array(arr[3], pa.string()),
        "value": pa.array(arr[4], pa.float64()),
    })
    ds = rd.from_arrow(t).repartition(7)
    got = range_join(ds).to_pandas().reset_index(drop=True)

    ts_np = np.array(arr[1], np.int64)
    uid = np.array(arr[2], np.int64)
    kind = np.array(arr[3], object)
    cents = np.round(np.array(arr[4]) * 100).astype(np.int64)
    look = 30 * 60_000_000
    want_rows = []
    for i in np.flatnonzero(kind == "purchase"):
        m = ((uid == uid[i]) & (kind == "view")
             & (ts_np > ts_np[i] - look) & (ts_np <= ts_np[i]))
        want_rows.append((arr[0][i], int(m.sum()),
                          float(cents[m].sum()) / 100.0))
    want_rows.sort()
    assert got["event_id"].tolist() == [r[0] for r in want_rows]
    assert got["n_views"].tolist() == [r[1] for r in want_rows]
    assert got["sum_view_value"].tolist() == [r[2] for r in want_rows]


from hypothesis import given, settings, strategies as st


@st.composite
def _event_stream(draw):
    n = draw(st.integers(5, 60))
    base = 1_700_000_000_000_000
    day = 86_400_000_000
    rows = []
    for i in range(n):
        rows.append((
            i,
            base + draw(st.integers(0, 3 * day)),
            draw(st.integers(0, 3)),                       # few users: collisions
            draw(st.sampled_from(["view", "purchase", "click"])),
            draw(st.integers(0, 9999)) / 100.0,
        ))
    return rows


@settings(max_examples=15, deadline=None)
@given(_event_stream(), st.sampled_from([1, 24]))
def test_asof_join_matches_bruteforce(ray_session, rows, chunk_h):
    """Property: asof_join == per-left argmax over (ts, event_id) of the
    user's purchases at ts<=ts_l, for random streams incl. equal-ts ties,
    at both a boundary-stressing and the default chunking."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.eventops import asof_join

    arr = list(zip(*rows))
    t = pa.table({
        "event_id": pa.array(arr[0], pa.int64()),
        "ts": pa.array(np.array(arr[1], np.int64).view("datetime64[us]")),
        "user_id": pa.array(arr[2], pa.int64()),
        "event_type": pa.array(arr[3], pa.string()),
        "value": pa.array(arr[4], pa.float64()),
    })
    got = (asof_join(rd.from_arrow(t).repartition(3), chunk_hours=chunk_h)
           .to_pandas())
    want = {}
    for eid, ts, uid, et, _v in rows:
        if et == "purchase":
            continue
        best = None
        for eid2, ts2, uid2, et2, _v2 in rows:
            if et2 == "purchase" and uid2 == uid and ts2 <= ts:
                k = (ts2, eid2)
                if best is None or k > best:
                    best = k
        if best is not None:
            want[eid] = best[1]
    if len(got) == 0:
        assert want == {}
        return
    got_map = dict(zip(got["event_id"], got["matched_event_id"]))
    assert got_map == want


@settings(max_examples=15, deadline=None)
@given(_event_stream())
def test_range_join_matches_bruteforce(ray_session, rows):
    import pyarrow as pa
    import ray.data as rd
    from covertile.eventops import range_join

    arr = list(zip(*rows))
    t = pa.table({
        "event_id": pa.array(arr[0], pa.int64()),
        "ts": pa.array(np.array(arr[1], np.int64).view("datetime64[us]")),
        "user_id": pa.array(arr[2], pa.int64()),
        "event_type": pa.array(arr[3], pa.string()),
        "value": pa.array(arr[4], pa.float64()),
    })
    got = range_join(rd.from_arrow(t).repartition(3)).to_pandas()
    look = 30 * 60_000_000
    want = []
    for eid, ts, uid, et, _v in rows:
        if et != "purchase":
            continue
        n = s = 0
        for eid2, ts2, uid2, et2, v2 in rows:
            if (et2 == "view" and uid2 == uid
                    and ts - look < ts2 <= ts):
                n += 1
                s += round(v2 * 100)
        want.append((eid, n, s / 100.0))
    want.sort()
    if len(got) == 0:
        assert want == []
        return
    assert got["event_id"].tolist() == [w[0] for w in want]
    assert got["n_views"].tolist() == [w[1] for w in want]
    assert got["sum_view_value"].tolist() == [w[2] for w in want]


@settings(max_examples=12, deadline=None)
@given(_event_stream(), st.sampled_from([1, 24]))
def test_sessionize_matches_bruteforce(ray_session, rows, chunk_h):
    """Property: sessionize == per-user gap-split over sorted timestamps,
    for random streams at both boundary-stressing and default chunking."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.eventops import SESSION_GAP_MINUTES, sessionize

    arr = list(zip(*rows))
    t = pa.table({
        "user_id": pa.array(arr[2], pa.int64()),
        "ts": pa.array(np.array(arr[1], np.int64).view("datetime64[us]")),
    })
    got = (sessionize(rd.from_arrow(t).repartition(3), chunk_hours=chunk_h)
           .to_pandas())
    gap = SESSION_GAP_MINUTES * 60_000_000
    want = {}
    by_user = {}
    for _eid, ts, uid, _et, _v in rows:
        by_user.setdefault(uid, []).append(ts)
    for uid, tss in by_user.items():
        tss.sort()
        sizes, cur = [], 1
        for a, b in zip(tss, tss[1:]):
            if b - a > gap:
                sizes.append(cur); cur = 1
            else:
                cur += 1
        sizes.append(cur)
        want[uid] = (len(tss), len(sizes), max(sizes))
    got_map = {u: (n, s, m) for u, n, s, m in zip(
        got["user_id"], got["n_events"], got["n_sessions"],
        got["max_session_events"])}
    assert got_map == want


@settings(max_examples=10, deadline=None)
@given(_event_stream())
def test_tumbling_window_matches_bruteforce(ray_session, rows):
    """Property: tumbling_window == per-(window, type) brute-force sums
    with exact integer cents."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.eventops import WINDOW_MINUTES, tumbling_window

    arr = list(zip(*rows))
    t = pa.table({
        "ts": pa.array(np.array(arr[1], np.int64).view("datetime64[us]")),
        "event_type": pa.array(arr[3], pa.string()),
        "value": pa.array(arr[4], pa.float64()),
    })
    got = tumbling_window(rd.from_arrow(t).repartition(3)).to_pandas()
    win_us = WINDOW_MINUTES * 60_000_000
    want = {}
    for _eid, ts, _uid, et, v in rows:
        key = ((ts // win_us) * win_us, et)
        n, c = want.get(key, (0, 0))
        want[key] = (n + 1, c + round(v * 100))
    got_map = {(w, e): (n, round(s * 100)) for w, e, n, s in zip(
        got["window_start_us"], got["event_type"],
        got["n_events"], got["sum_value"])}
    assert got_map == want


def test_hopping_window_non_multiple_width(ray_session, con):
    """W not a multiple of S exercises the partial-overlap LAST window
    (tail-eligibility split in the bucket-aggregated partial): hop=7min,
    width=60min -> ceil(60/7)=9 windows, the 9th covering only 4min of
    each bucket."""
    import numpy as np
    from covertile import api_events
    from covertile import eventops as E

    ds = api_events._events(SF)
    got = (E.hopping_window(ds, hop_minutes=7, width_minutes=60)
           .to_pandas().reset_index(drop=True))
    want = con.execute(E.hopping_window_sql(7, 60)).df()
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        assert str(a.dtype) == str(b.dtype), c
        if a.dtype.kind == "f":
            assert np.array_equal(a.view(np.int64), b.view(np.int64)), c
        else:
            assert np.array_equal(a, b), c


def test_transition_counts_matches_oracle(ray_session, con):
    from covertile import api_events
    got = (api_events.QUERIES["transition_counts"](SF)
           .to_pandas().reset_index(drop=True))
    want = con.execute(api_events.ORACLES["transition_counts"]()).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        assert str(got[c].dtype) == str(want[c].dtype), c
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c


def test_transition_counts_ordering_semantics(ray_session):
    """Ties on ts order by event_id; users never mix; single-event users
    contribute nothing."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.eventops import transition_counts

    ts = np.array([0, 1, 1, 2, 9], dtype="datetime64[us]")
    tbl = pa.table({
        "event_id": pa.array([1, 3, 2, 4, 9], pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["a", "c", "b", "a", "z"]),
    })
    out = (transition_counts(rd.from_arrow(tbl).repartition(3))
           .to_pandas())
    # user 1 order: (0,id1)a (1,id2)b (1,id3)c (2,id4)a -> ab, bc, ca
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "a"): 1}


def test_cohort_retention_bucket_invariance(ray_session):
    """The user-hash fan-out never changes the retention matrix (users
    are hash-disjoint across buckets, so bucket matrices sum exactly)."""
    import ray.data as rd
    from covertile import eventops

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "user_id"])
    a = (eventops.cohort_retention(ev, num_buckets=2).to_pandas()
         .sort_values(["cohort_day", "day"]).reset_index(drop=True))
    b = (eventops.cohort_retention(ev, num_buckets=17).to_pandas()
         .sort_values(["cohort_day", "day"]).reset_index(drop=True))
    assert a.equals(b)
    assert (a["day"] >= a["cohort_day"]).all()   # triangular matrix


def test_late_events_matches_oracle(ray_session, con):
    from covertile import api_events
    got = api_events.QUERIES["late_events"](SF).to_pandas().reset_index(
        drop=True)
    want = con.execute(api_events.ORACLES["late_events"]()).df()
    assert len(got) == len(want)
    assert list(got.columns) == list(want.columns)
    for c_ in got.columns:
        assert np.array_equal(got[c_].to_numpy(), want[c_].to_numpy()), c_
    # the sized jitter must actually plant disorder
    assert got["n_late"].sum() > 0


def test_late_events_chunking_invariant(ray_session):
    """Running max is associative: extreme id-chunkings (7-event chunks
    and one global chunk) must produce identical bytes."""
    from covertile import eventops
    from covertile.sources import read_table
    ev = lambda: read_table(SF, "events", ("event_id", "ts", "user_id"))
    a = eventops.late_events(ev(), jitter_minutes=480).to_pandas()
    for chunk in (7, 10**9):
        b = eventops.late_events(ev(), jitter_minutes=480,
                                 id_chunk=chunk).to_pandas()
        assert len(a) == len(b)
        for c_ in a.columns:
            assert np.array_equal(a[c_].to_numpy(), b[c_].to_numpy()), (
                chunk, c_)


def test_late_events_hand_case(ray_session):
    """Exact watermark semantics on a hand stream: arrival order is
    event_id; lateness strictly-greater-than the allowance; first event
    never late; disorder clipped at 0."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.eventops import late_events
    MIN = 60_000_000
    ts = np.array([0, 10 * MIN, 3 * MIN, 9 * MIN + 1, 20 * MIN,
                   0, 5 * MIN], dtype="datetime64[us]")
    tbl = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4, 10, 11], pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 2], pa.int64()),
    })
    out = (late_events(rd.from_arrow(tbl), late_minutes=1)
           .to_pandas().set_index("user_id"))
    # user 1: wm before e2 is 10min -> disorder 7min (late);
    # e3 disorder 59s+... wait: wm 10min, ts 9min+1us -> 60s-1us, NOT
    # late at 60s allowance (strict >); e4 in order.
    assert out.loc[1, "n_events"] == 5
    assert out.loc[1, "n_late"] == 1
    assert out.loc[1, "max_disorder_us"] == 7 * MIN
    # user 2 strictly in order
    assert out.loc[2, "n_late"] == 0
    assert out.loc[2, "max_disorder_us"] == 0


def test_uniques_sketch_matches_oracle(ray_session, con):
    from covertile import api_events
    got = api_events.QUERIES["uniques_sketch"](SF).to_pandas(
        ).reset_index(drop=True)
    want = con.execute(api_events.ORACLES["uniques_sketch"]()).df()
    assert len(got) == len(want)
    assert list(got.columns) == list(want.columns)
    for c_ in got.columns:
        a, b = got[c_].to_numpy(), want[c_].to_numpy()
        if a.dtype.kind == "f":
            assert np.array_equal(a.view(np.int64), b.view(np.int64)), c_
        else:
            assert np.array_equal(a, b), c_


def test_uniques_sketch_envelope_and_merge_order(ray_session, con):
    """Estimates sit near the exact per-window distincts (coarse check:
    windows here hold few users, where HLL linear counting is near
    exact) and the register merge is block-order independent."""
    from covertile import eventops
    from covertile.sources import read_table
    exact = con.execute("""
        SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
               count(DISTINCT user_id) AS nd
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""").df()
    ev = lambda n: read_table(
        SF, "events", ("event_type", "ts", "user_id")).repartition(n)
    a = eventops.uniques_sketch(ev(1)).to_pandas()
    b = eventops.uniques_sketch(ev(29)).to_pandas()
    for c_ in a.columns:
        assert np.array_equal(a[c_].to_numpy(), b[c_].to_numpy()), c_
    assert np.array_equal(
        a[["event_type", "day"]].to_numpy(dtype=object),
        exact[["event_type", "day"]].to_numpy(dtype=object))
    nd = exact["nd"].to_numpy().astype(float)
    est = a["hll_users"].to_numpy()
    assert np.all(np.abs(est - nd) <= np.maximum(0.15 * nd, 3.0))


def test_uniques_sketch_type_disjoint_batches(ray_session):
    """Regression: the shuffle key must be a pure function of
    (event_type, day).  Sorting by event_type makes most batches hold a
    SINGLE type, so a key derived from the batch-local np.unique type
    index would split the same group across buckets and emit duplicate
    (event_type, day) rows."""
    from covertile import eventops
    from covertile.sources import read_table
    ev = read_table(SF, "events", ("event_type", "ts", "user_id"))
    base = eventops.uniques_sketch(ev).to_pandas()
    sorted_ev = ev.sort("event_type").repartition(13)
    got = eventops.uniques_sketch(sorted_ev).to_pandas()
    assert len(got) == len(base)
    for c_ in base.columns:
        assert np.array_equal(got[c_].to_numpy(), base[c_].to_numpy()), c_


def test_window_heavy_hitters_empty_block(ray_session):
    """Empty input blocks flow through the partial without indexing."""
    import pyarrow as pa
    import ray.data as rd
    from covertile import eventops

    empty = pa.table({
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
    })
    assert eventops.window_heavy_hitters(rd.from_arrow(empty)).count() == 0
