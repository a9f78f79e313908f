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
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from covertile import api, api_events, api_rel, api_text, api_vec


def entry() -> Any:
    return api.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    out = {
        "epsilon_graph": api.q_epsilon_graph,
        "knn_join": api.q_knn_join,
        "pip_join": api.q_pip_join,
        "tile_assign": api.q_tile_assign,
        "tile_agg": api.q_tile_agg,
        "cell_stats": api.q_cell_stats,
        "span_stats": api.q_span_stats,
        "doc_enrich": api.q_doc_enrich,
        "index_lineage": api.q_index_lineage,
    }
    out.update(api_text.QUERIES)
    out.update(api_vec.QUERIES)
    out.update(api_events.QUERIES)
    out.update(api_rel.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out = {
        "epsilon_graph": api.sql_epsilon_graph(),
        "knn_join": api.sql_knn_join(),
        "pip_join": api.sql_pip_join(),
        "tile_assign": api.sql_tile_assign(),
        "tile_agg": api.sql_tile_agg(),
        "cell_stats": api.sql_cell_stats(),
        "span_stats": api.sql_span_stats(),
        "doc_enrich": api.sql_doc_enrich(),
    }
    out.update({k: v() for k, v in api_text.ORACLES.items()})
    out.update({k: v() for k, v in api_vec.ORACLES.items()})
    out.update({k: v() for k, v in api_events.ORACLES.items()})
    out.update({k: v() for k, v in api_rel.ORACLES.items()})
    return out
