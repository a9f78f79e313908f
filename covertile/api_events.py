"""Driver-facing event-stream queries (events table)."""

from __future__ import annotations

import os

from . import eventops


def _events(sf_dir: str, columns=("event_id", "ts", "user_id",
                                  "event_type", "value")):
    from .sources import read_table
    return read_table(sf_dir, "events", columns)


def _fanout(sf_dir: str) -> int:
    """Row-count-aware bucket count for the user-hash exchanges: parquet
    footer metadata (free) caps rows-per-bucket at scale; cluster CPUs
    floor the parallelism (sizing.fanout)."""
    from . import sizing
    return sizing.fanout(sizing.table_rows(sf_dir, "events"))


def q_tumbling_window(sf_dir: str):
    return eventops.tumbling_window(_events(sf_dir))


def sql_tumbling_window() -> str:
    return eventops.tumbling_window_sql()


def q_sessionize(sf_dir: str):
    return eventops.sessionize(_events(sf_dir),
                     nbuckets=_fanout(sf_dir))


def sql_sessionize() -> str:
    return eventops.sessionize_sql()


def q_asof_join(sf_dir: str):
    return eventops.asof_join(_events(sf_dir),
                     nbuckets=_fanout(sf_dir))


def sql_asof_join() -> str:
    return eventops.asof_join_sql()


def q_range_join(sf_dir: str):
    return eventops.range_join(_events(sf_dir),
                     nbuckets=_fanout(sf_dir))


def sql_range_join() -> str:
    return eventops.range_join_sql()


def q_hopping_window(sf_dir: str):
    return eventops.hopping_window(_events(sf_dir))


def sql_hopping_window() -> str:
    return eventops.hopping_window_sql()


def q_funnel(sf_dir: str):
    return eventops.funnel(_events(sf_dir),
                     nbuckets=_fanout(sf_dir))


def sql_funnel() -> str:
    return eventops.funnel_sql()


def q_props_stats(sf_dir: str):
    return eventops.props_stats(
        _events(sf_dir, columns=("event_type", "props")))


def sql_props_stats() -> str:
    return eventops.props_stats_sql()


def q_rolling_window(sf_dir: str):
    return eventops.rolling_window(
        _events(sf_dir, columns=("event_id", "ts", "user_id", "value")),
        nbuckets=_fanout(sf_dir))


def sql_rolling_window() -> str:
    return eventops.rolling_window_sql()


def q_transition_counts(sf_dir: str):
    return eventops.transition_counts(
        _events(sf_dir, columns=("event_id", "ts", "user_id",
                                 "event_type")),
        nbuckets=_fanout(sf_dir))


def sql_transition_counts() -> str:
    return eventops.transition_counts_sql()


def q_cohort_retention(sf_dir: str):
    return eventops.cohort_retention(
        _events(sf_dir, columns=("ts", "user_id"))
    ).materialize().sort(["cohort_day", "day"])


def sql_cohort_retention() -> str:
    return eventops.cohort_retention_sql()



def q_late_events(sf_dir: str):
    return eventops.late_events(
        _events(sf_dir, columns=("event_id", "ts", "user_id")),
        jitter_minutes=eventops.LATE_JITTER_MINUTES)


def sql_late_events() -> str:
    return eventops.late_events_sql(
        jitter_minutes=eventops.LATE_JITTER_MINUTES)



def q_uniques_sketch(sf_dir: str):
    return eventops.uniques_sketch(
        _events(sf_dir, columns=("event_type", "ts", "user_id")))


def sql_uniques_sketch() -> str:
    return eventops.uniques_sketch_sql()


def q_value_histogram(sf_dir: str):
    return eventops.value_histogram(
        _events(sf_dir, columns=("event_type", "value")))


def sql_value_histogram() -> str:
    return eventops.value_histogram_sql()


def q_window_heavy_hitters(sf_dir: str):
    return eventops.window_heavy_hitters(
        _events(sf_dir, columns=("ts", "user_id")))


def sql_window_heavy_hitters() -> str:
    return eventops.window_heavy_hitters_sql()


def q_inter_arrival_stats(sf_dir: str):
    return eventops.inter_arrival_stats(
        _events(sf_dir, columns=("ts", "user_id")),
        nbuckets=_fanout(sf_dir))


def sql_inter_arrival_stats() -> str:
    return eventops.inter_arrival_stats_sql()


QUERIES = {
    "events_window": q_tumbling_window,
    "cohort_retention": q_cohort_retention,
    "sessionize": q_sessionize,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "funnel": q_funnel,
    "hopping_window": q_hopping_window,
    "props_stats": q_props_stats,
    "rolling_window": q_rolling_window,
    "transition_counts": q_transition_counts,
    "late_events": q_late_events,
    "uniques_sketch": q_uniques_sketch,
    "window_heavy_hitters": q_window_heavy_hitters,
    "value_histogram": q_value_histogram,
    "inter_arrival_stats": q_inter_arrival_stats,
}

ORACLES = {
    "events_window": sql_tumbling_window,
    "cohort_retention": sql_cohort_retention,
    "sessionize": sql_sessionize,
    "asof_join": sql_asof_join,
    "range_join": sql_range_join,
    "funnel": sql_funnel,
    "hopping_window": sql_hopping_window,
    "props_stats": sql_props_stats,
    "rolling_window": sql_rolling_window,
    "transition_counts": sql_transition_counts,
    "late_events": sql_late_events,
    "uniques_sketch": sql_uniques_sketch,
    "window_heavy_hitters": sql_window_heavy_hitters,
    "value_histogram": sql_value_histogram,
    "inter_arrival_stats": sql_inter_arrival_stats,
}
