"""Windowed / sessionized operators over the events stream table
(event_id, ts, user_id, event_type, value, props).

The reference has NO streaming operators (SURVEY.md §2.8); these are the
training-data-pipeline extensions for event-shaped inputs:

* tumbling_window — fixed windows over ts with per-batch PARTIAL
  aggregation before the (tiny) groupby shuffle: each block reduces to one
  row per (window, event_type) before anything moves.  `value` is summed in
  integer CENTS (the table carries 2-decimal values) so the sum is
  order-independent and the final float division is bitwise equal to the
  SQL oracle — float accumulation order would otherwise differ between
  Ray's partial/final combine tree and DuckDB.
* sessionize — per-user session stats under a gap timeout: ONE
  groupby(user_id) shuffle, vectorized diff inside each group.  The SQL
  mirror is the classic lag()/cumsum window-function formulation.

Partitioning note (100 TB): the window key is derivable per row, so the
partial-aggregate rows are bounded by (#windows x #types) per block —
the shuffle is metadata-sized regardless of input volume.  Sessionize
partitions by (user_id, ts-chunk) so a hot user never pins one task, and
stitches chunk-boundary session fragments in a second, fragment-sized
shuffle — exact by construction (see sessionize docstring).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

WINDOW_MINUTES = 60
SESSION_GAP_MINUTES = 30

_US_PER_MIN = 60_000_000


def tumbling_window(events_ds, window_minutes: int = WINDOW_MINUTES):
    """-> (window_start ts, event_type, n_events, sum_value, avg_value),
    sorted.  Exact-integer partial aggregation (see module doc)."""
    win_us = np.int64(window_minutes * _US_PER_MIN)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        win = (ts // win_us) * win_us
        et = np.asarray(batch["event_type"], dtype=object)
        cents = np.round(batch["value"].to_numpy() * 100.0).astype(np.int64)
        tkey, tinv = np.unique(et, return_inverse=True)
        key = win * np.int64(len(tkey)) + tinv
        uk, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv)
        sc = np.bincount(inv, weights=cents).astype(np.int64)
        return pa.table({
            "window_start": (uk // len(tkey)) * 1,  # int64 epoch-us
            "event_type": pa.array(tkey[(uk % len(tkey))], pa.string()),
            "n": n.astype(np.int64),
            "cents": sc,
        })

    agg = (events_ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["window_start", "event_type"]).sum(["n", "cents"]))

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["sum(n)"].to_numpy()
        cents = batch["sum(cents)"].to_numpy()
        return pa.table({
            # int64 epoch-microseconds: immune to timestamp-unit (ns/us)
            # representation differences between Ray->pandas and DuckDB->
            # pandas in the driver's hash compare
            "window_start_us": batch["window_start"],
            "event_type": batch["event_type"],
            "n_events": n,
            "sum_value": cents.astype(np.float64) / 100.0,
            "avg_value": (cents.astype(np.float64) / 100.0)
                         / n.astype(np.float64),
        })

    return (agg.map_batches(finalize, batch_format="pyarrow")
            .sort(["window_start_us", "event_type"]))


def tumbling_window_sql(window_minutes: int = WINDOW_MINUTES) -> str:
    w = window_minutes
    cents = "CAST(round(value * 100.0) AS BIGINT)"
    return f"""
SELECT CAST(epoch_us(time_bucket(INTERVAL {w} MINUTE, ts)) AS BIGINT)
         AS window_start_us,
       event_type,
       count(*) AS n_events,
       CAST(sum({cents}) AS DOUBLE) / 100.0 AS sum_value,
       (CAST(sum({cents}) AS DOUBLE) / 100.0) / count(*) AS avg_value
FROM events GROUP BY window_start_us, event_type
ORDER BY window_start_us, event_type
"""


SESSION_CHUNK_HOURS = 24


def sessionize(events_ds, gap_minutes: int = SESSION_GAP_MINUTES,
               chunk_hours: int = SESSION_CHUNK_HOURS):
    """-> per-user (user_id, n_events, n_sessions, max_session_events),
    sessions split where the gap to the previous event exceeds the
    timeout.

    Hot-user-proof two-stage scheme (exact):

    1. Events are bucketed by a 256-way hash of (user_id, ts-chunk) — a
       hot user's events spread across chunks instead of pinning one
       task.  Inside a coarse group ALL (user, chunk) runs are
       sessionized in one vectorized pass (lexsort + run detection),
       force-splitting at chunk boundaries, and reduced to per-session
       PART rows (user, start_ts, end_ts, n_events).
    2. Part rows (one per session fragment — metadata-sized, not
       event-sized) are re-bucketed by user hash and stitched: adjacent
       parts of a user merge iff next.start - prev.end <= gap, which is
       exactly the global gap rule, so chunking never changes the result
       (asserted vs the SQL oracle and vs a 1-chunk run in tests).

    Both shuffles are declared; the first moves each event once with a
    3-column projection, the second moves only session fragments.  One
    map_groups UDF call per user would cost ~1ms of Python each — the
    coarse-bucket vectorized pass is the same lesson as
    textops._candidate_pairs."""
    gap_us = np.int64(gap_minutes * _US_PER_MIN)
    chunk_us = np.int64(chunk_hours) * np.int64(60) * np.int64(_US_PER_MIN)
    PHI = np.uint64(0x9E3779B97F4A7C15)

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy()
        ts = batch["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        ck = ts // chunk_us
        h = (uid.astype(np.uint64) * PHI + ck.astype(np.uint64)) * PHI
        return pa.table({"bk": (h >> np.uint64(56)).astype(np.int64),
                         "user_id": uid, "ts": ts})

    def parts(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "start_ts": pa.array([], pa.int64()),
                "end_ts": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
            })
        ts = group["ts"].to_numpy()
        order = np.lexsort((ts, uid))
        uid_s, ts_s = uid[order], ts[order]
        new_run = np.empty(n, bool)
        new_run[0] = True
        new_run[1:] = ((uid_s[1:] != uid_s[:-1])
                       | (np.diff(ts_s) > gap_us)
                       # chunk boundary: the neighbor event may live in
                       # another bucket, so the gap check is deferred to
                       # the stitch stage
                       | (ts_s[1:] // chunk_us != ts_s[:-1] // chunk_us))
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], n) - 1
        return pa.table({
            "user_id": uid_s[starts],
            "start_ts": ts_s[starts],
            "end_ts": ts_s[ends],
            "n_events": np.append(starts[1:], n) - starts,
        })

    def user_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy()
        bk = ((uid.astype(np.uint64) * PHI) >> np.uint64(56)).astype(np.int64)
        return batch.append_column("bk2", pa.array(bk))

    def stitch(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy()
        n = len(uid)
        if n == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64()),
                "max_session_events": pa.array([], pa.int64()),
            })
        start = group["start_ts"].to_numpy()
        end = group["end_ts"].to_numpy()
        cnt = group["n_events"].to_numpy()
        order = np.lexsort((start, uid))
        uid_s, start_s, end_s, cnt_s = (uid[order], start[order],
                                        end[order], cnt[order])
        new_user = np.empty(n, bool)
        new_user[0] = True
        new_user[1:] = uid_s[1:] != uid_s[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= (start_s[1:] - end_s[:-1]) > gap_us
        sess_starts = np.flatnonzero(new_sess)
        sess_n = np.add.reduceat(cnt_s, sess_starts)
        user_starts = np.flatnonzero(new_user)
        u_first_sess = np.searchsorted(sess_starts, user_starts)
        u_end_sess = np.append(u_first_sess[1:], len(sess_starts))
        return pa.table({
            "user_id": uid_s[user_starts],
            "n_events": np.add.reduceat(cnt_s, user_starts),
            "n_sessions": u_end_sess - u_first_sess,
            "max_session_events": np.maximum.reduceat(
                sess_n, u_first_sess),
        })

    part_rows = (events_ds.map_batches(add_bucket, batch_format="pyarrow")
                 .groupby("bk").map_groups(parts, batch_format="pyarrow"))
    return (part_rows.map_batches(user_bucket, batch_format="pyarrow")
            .groupby("bk2").map_groups(stitch, batch_format="pyarrow")
            .sort("user_id"))


def sessionize_sql(gap_minutes: int = SESSION_GAP_MINUTES) -> str:
    g = gap_minutes
    return f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {g} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
),
per_sess AS (
  SELECT user_id, sess_id, count(*) AS n FROM sess GROUP BY user_id, sess_id
)
SELECT user_id,
       CAST(sum(n) AS BIGINT) AS n_events,
       count(*) AS n_sessions,
       CAST(max(n) AS BIGINT) AS max_session_events
FROM per_sess GROUP BY user_id ORDER BY user_id
"""
