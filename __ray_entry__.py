"""Driver contract for the covertile Ray-Data engine.

The driver calls ray.init() itself BEFORE importing this module; nothing
here (or in covertile/) initialises or shuts down Ray.

entry()      — flagship pipeline on /root/testdata/sf0.001 (span-table
               derivation -> partitioned cover-tree index -> epsilon
               radius self-join -> spans re-joined), returns a Dataset.
queries()    — one entry per implemented operator (SURVEY.md §2).
oracle_sql() — DuckDB-equivalent SQL per query (column names match; float
               math is bit-identical by construction, see
               covertile/geometry.py).

Registry ordering rotates the driver's verification window (VERDICT r04
next-step #2).  The external driver checks queries in registry order and
has been observed to cap the run at 50 entries (CORRECTNESS_r03/r04
checked exactly the first 50), while the registry holds more than 50
queries — so a FIXED order would leave the same tail stale forever.
The order is derived from the recorded CORRECTNESS_r*.json files at call
time: never-driver-verified queries first, then ascending by the round
of each query's most recent driver row, ties in stable registry order.
Every query a 50-entry window drops is therefore one that was
driver-checked in the most recent recorded round (staleness <= 1 round);
tests/test_oracle_dtypes.py asserts that invariant against the same
files the driver writes.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable
from typing import Any

from covertile import api, api_events, api_rel, api_text, api_vec

_REPO = os.path.dirname(os.path.abspath(__file__))


def entry() -> Any:
    return api.flagship("/root/testdata/sf0.001")


def _last_driver_round() -> dict[str, int]:
    """query name -> round of its most recent driver row (0 = never).

    A 'driver row' is any entry in a CORRECTNESS_r*.json — including the
    two permanent no_oracle rows (index_lineage, ivf_topk: rows-only by
    design, with bitwise-green exact twins), whose freshness matters the
    same way.  Queries whose implementation changed incompatibly since
    their last driver row belong in _FORCE_FRESH below."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        if not isinstance(data, dict):
            continue
        for name in data:
            last[name] = max(last.get(name, 0), rnd)
    return last


#: Queries whose DRIVER PATH changed since their last recorded driver row
#: (treated as never-verified so they re-enter the window immediately).
#: r5: the media family now decodes REAL PNG bytes (covertile/mediaops.py
#: ensure_media_store) instead of fake_decode — their r3/r4 green rows
#: verified the old path.
_FORCE_FRESH = ("media_features", "media_resize", "frame_sample")


def _ordered(full: dict) -> dict:
    last = _last_driver_round()
    names = list(full)
    rank = {n: i for i, n in enumerate(names)}

    def key(n):
        stale = 0 if n in _FORCE_FRESH else last.get(n, 0)
        return (stale, rank[n])

    return {n: full[n] for n in sorted(names, key=key)}


def queries() -> dict[str, Callable[[str], Any]]:
    out = {
        "epsilon_graph": api.q_epsilon_graph,
        "knn_join": api.q_knn_join,
        "pip_join": api.q_pip_join,
        "tile_assign": api.q_tile_assign,
        "tile_agg": api.q_tile_agg,
        "cell_stats": api.q_cell_stats,
        "span_stats": api.q_span_stats,
        "span_transitions": api.q_span_transitions,
        "knn_radius_quantiles": api.q_knn_radius_quantiles,
        "doc_enrich": api.q_doc_enrich,
        "triangle_counts": api.q_triangle_counts,
        "spatial_components": api.q_spatial_components,
        "degree_histogram": api.q_degree_histogram,
        "index_lineage": api.q_index_lineage,
    }
    out.update(api_text.QUERIES)
    out.update(api_vec.QUERIES)
    out.update(api_events.QUERIES)
    out.update(api_rel.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out = {
        "epsilon_graph": api.sql_epsilon_graph(),
        "knn_join": api.sql_knn_join(),
        "pip_join": api.sql_pip_join(),
        "tile_assign": api.sql_tile_assign(),
        "tile_agg": api.sql_tile_agg(),
        "cell_stats": api.sql_cell_stats(),
        "span_stats": api.sql_span_stats(),
        "span_transitions": api.sql_span_transitions(),
        "knn_radius_quantiles": api.sql_knn_radius_quantiles(),
        "doc_enrich": api.sql_doc_enrich(),
        "triangle_counts": api.sql_triangle_counts(),
        "spatial_components": api.sql_spatial_components(),
        "degree_histogram": api.sql_degree_histogram(),
    }
    out.update({k: v() for k, v in api_text.ORACLES.items()})
    out.update({k: v() for k, v in api_vec.ORACLES.items()})
    out.update({k: v() for k, v in api_events.ORACLES.items()})
    out.update({k: v() for k, v in api_rel.ORACLES.items()})
    return _ordered(out)
