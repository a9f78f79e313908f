"""Deterministic polygon + raster-tile fixtures, SQL-literalizable.

Polygons are seeded star-shaped (simple, possibly concave) rings over the
point domain — FIXTURES.md §3.  The exact float64 vertex values are emitted
both as numpy arrays (engine side) and as SQL VALUES literals (oracle side),
so the crossing-number PIP test evaluates the *identical* IEEE expression on
both sides.  Tiles are a uniform G x G grid over [-12, 12]^2 — FIXTURES.md §4.
"""

from __future__ import annotations

import numpy as np

POLY_SEED = 7
POLY_COUNT = 32
TILE_G = 16
TILE_MIN = -12.0
TILE_MAX = 12.0
TILE_SIDE = (TILE_MAX - TILE_MIN) / TILE_G


def make_polygons(k: int = POLY_COUNT, seed: int = POLY_SEED):
    """-> (edges (E,4) f64 [x1,y1,x2,y2], poly_offsets (P+1,), poly_ids (P,)).

    Star-shaped rings: sorted random angles, per-vertex radii — simple
    polygons (non-self-intersecting), some concave.  PCG64 is stable across
    platforms, so the fixture is machine-independent.
    """
    rng = np.random.default_rng(seed)
    edges = []
    offsets = [0]
    for _ in range(k):
        m = int(rng.integers(5, 11))
        cx, cy = rng.uniform(-8, 8, 2)
        ang = np.sort(rng.uniform(0, 2 * np.pi, m))
        rad = rng.uniform(0.6, 2.8, m)
        vx = cx + rad * np.cos(ang)
        vy = cy + rad * np.sin(ang)
        nxt = np.roll(np.arange(m), -1)
        for i in range(m):
            edges.append((vx[i], vy[i], vx[nxt[i]], vy[nxt[i]]))
        offsets.append(len(edges))
    return (np.asarray(edges, np.float64),
            np.asarray(offsets, np.int64),
            np.arange(k, dtype=np.int64))


def polygon_edges_sql(k: int = POLY_COUNT, seed: int = POLY_SEED) -> str:
    """VALUES list `(polygon_id, x1, y1, x2, y2), ...` with repr() float
    literals — exact round-trip, so DuckDB sees the same doubles."""
    edges, offsets, ids = make_polygons(k, seed)
    rows = []
    for p in range(len(ids)):
        for e in range(offsets[p], offsets[p + 1]):
            x1, y1, x2, y2 = edges[e]
            rows.append(f"({ids[p]},{x1!r},{y1!r},{x2!r},{y2!r})")
    return ",".join(rows)


def pip_oracle_sql(pts_cte: str) -> str:
    """DuckDB crossing-number PIP, same float64 expression as queries.pip_join."""
    return f"""
WITH pts AS ({pts_cte}),
edges(polygon_id, x1, y1, x2, y2) AS (VALUES {polygon_edges_sql()}),
hits AS (
  SELECT p.doc_id, e.polygon_id
  FROM pts p JOIN edges e
    ON ((e.y1 > CAST(p.y AS DOUBLE)) != (e.y2 > CAST(p.y AS DOUBLE)))
   AND (CAST(p.x AS DOUBLE) <
        (e.x2 - e.x1) * (CAST(p.y AS DOUBLE) - e.y1) / (e.y2 - e.y1) + e.x1)
)
SELECT doc_id, CAST(polygon_id AS BIGINT) AS polygon_id FROM hits
GROUP BY doc_id, polygon_id HAVING count(*) % 2 = 1
ORDER BY doc_id, polygon_id
"""


def tile_assign_oracle_sql(pts_cte: str) -> str:
    return f"""
WITH pts AS ({pts_cte})
SELECT CAST(floor((CAST(y AS DOUBLE) - {TILE_MIN!r}) / {TILE_SIDE!r}) AS BIGINT)
         * {TILE_G}
     + CAST(floor((CAST(x AS DOUBLE) - {TILE_MIN!r}) / {TILE_SIDE!r}) AS BIGINT)
       AS tile_id,
       doc_id
FROM pts ORDER BY tile_id, doc_id
"""
