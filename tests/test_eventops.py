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


@pytest.mark.parametrize("name", ["events_window", "sessionize"])
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
