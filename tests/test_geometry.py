"""Bit-exactness of the numpy geometry derivation vs its DuckDB SQL mirror —
the property the driver's value-hash correctness gate relies on."""

import duckdb
import numpy as np

from covertile import geometry


def test_xy_parity_with_duckdb():
    con = duckdb.connect()
    xs, ys = geometry.xy_sql("i")
    t = con.execute(
        f"SELECT {xs} AS x, {ys} AS y FROM range(20000) t(i)").arrow()
    x_np, y_np = geometry.derive_xy(np.arange(20000, dtype=np.int64))
    assert np.array_equal(t["x"].to_numpy().view(np.int32), x_np.view(np.int32))
    assert np.array_equal(t["y"].to_numpy().view(np.int32), y_np.view(np.int32))


def test_dist_parity_with_duckdb():
    con = duckdb.connect()
    d_expr = geometry.dist_sql("a.x", "a.y", "b.x", "b.y")
    sql = f"""
    WITH pts AS ({geometry.pts_cte('range(300) t(doc_id)')})
    SELECT {d_expr} AS d FROM pts a, pts b ORDER BY a.doc_id, b.doc_id
    """
    d_db = con.execute(sql).arrow()["d"].to_numpy()
    x, y = geometry.derive_xy(np.arange(300, dtype=np.int64))
    i, j = np.meshgrid(np.arange(300), np.arange(300), indexing="ij")
    d_np = geometry.pair_dists(x[i.ravel()], y[i.ravel()],
                               x[j.ravel()], y[j.ravel()])
    assert np.array_equal(d_db.view(np.int64), d_np.view(np.int64))


def test_range_and_determinism():
    x, y = geometry.derive_xy(np.arange(100000, dtype=np.int64))
    assert x.dtype == np.float32 and y.dtype == np.float32
    assert (-10 <= x).all() and (x < 10).all()
    x2, _ = geometry.derive_xy(np.arange(100000, dtype=np.int64))
    assert np.array_equal(x, x2)
