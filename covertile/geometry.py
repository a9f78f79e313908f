"""Deterministic doc_id -> (x, y) geometry derivation, SQL-mirrorable.

The north rule mandates building over an interleaved-document table; the
driver's correctness gate compares Ray results against DuckDB SQL over the
same parquet tables.  Geometry is therefore a *pure function of doc_id* using
only exact integer arithmetic + IEEE float64 ops + a final float32 cast, so
the numpy derivation here and the SQL fragment emitted by :func:`xy_sql` are
bit-for-bit identical (validated in tests/test_geometry.py).

This plays the role of the reference's seeded Gaussian generator
(/root/reference/src/Point.cpp:45-60): a deterministic synthetic point cloud,
float32 coords, 2-D, reproducible on any machine.  We use multiplicative-hash
uniform points on [-10, 10]^2 instead of Box-Muller Gaussians because
transcendental functions are not bit-portable between numpy and DuckDB's
libm; the distribution does not affect any correctness contract.
"""

from __future__ import annotations

import numpy as np

# Knuth multiplicative hash constants (public domain folklore).
_MULT_X = 2654435761
_MULT_Y = 2246822519
_ADD_Y = 3266489917
_MOD32 = 4294967296
_BUCKETS = 100000
_SCALE = 20.0  # points span [-10, 10]^2
_SHIFT = 10.0


def derive_xy(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized doc_id (int64) -> (x: float32, y: float32).

    Exact-integer hash to a bucket in [0, 100000), then an exact float64
    affine map to [-10, 10), rounded once to float32.  Mirrors xy_sql().
    """
    ids = np.asarray(doc_id, dtype=np.int64)
    u = (ids * np.int64(_MULT_X)) % np.int64(_MOD32) % np.int64(_BUCKETS)
    v = (ids * np.int64(_MULT_Y) + np.int64(_ADD_Y)) % np.int64(_MOD32) % np.int64(_BUCKETS)
    x = (u.astype(np.float64) / float(_BUCKETS) * _SCALE - _SHIFT).astype(np.float32)
    y = (v.astype(np.float64) / float(_BUCKETS) * _SCALE - _SHIFT).astype(np.float32)
    return x, y


def xy_sql(id_expr: str = "doc_id") -> tuple[str, str]:
    """SQL expressions for (x, y) bit-identical to derive_xy (DuckDB)."""
    x = (
        f"CAST(({id_expr} * {_MULT_X}) % {_MOD32} % {_BUCKETS}"
        f" / {_BUCKETS}.0 * {_SCALE} - {_SHIFT} AS REAL)"
    )
    y = (
        f"CAST(({id_expr} * {_MULT_Y} + {_ADD_Y}) % {_MOD32} % {_BUCKETS}"
        f" / {_BUCKETS}.0 * {_SCALE} - {_SHIFT} AS REAL)"
    )
    return x, y


def pts_cte(table: str = "documents") -> str:
    """`pts` CTE body: (doc_id, x REAL, y REAL) from a documents view."""
    xs, ys = xy_sql("doc_id")
    return f"SELECT doc_id, {xs} AS x, {ys} AS y FROM {table}"


def dist_sql(ax: str, ay: str, bx: str, by: str) -> str:
    """SQL float64 Euclidean distance, op-order-identical to pair_dists().

    Same formula as the reference metric (double accumulation over float32
    coords, sqrt at the end — /root/reference/src/Point.cpp:27-38), except the
    coordinate subtraction is done in float64 (exact for our value range) so
    numpy and DuckDB agree bitwise.
    """
    dx = f"(CAST({ax} AS DOUBLE)-CAST({bx} AS DOUBLE))"
    dy = f"(CAST({ay} AS DOUBLE)-CAST({by} AS DOUBLE))"
    return f"sqrt({dx}*{dx}+{dy}*{dy})"


def pair_dists(ax, ay, bx, by) -> np.ndarray:
    """Vectorized float64 distances over float32 coords; mirrors dist_sql."""
    dx = ax.astype(np.float64) - bx.astype(np.float64)
    dy = ay.astype(np.float64) - by.astype(np.float64)
    return np.sqrt(dx * dx + dy * dy)
