"""Triangle counting: hand-built known answers + DuckDB oracle."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _counts(edges):
    """Brute-force per-vertex triangle counts from undirected pairs."""
    es = {tuple(sorted(e)) for e in edges}
    verts = sorted({x for e in es for x in e})
    out = {}
    for i, u in enumerate(verts):
        for v in verts[i + 1:]:
            for w in verts:
                if w <= v:
                    continue
                if {(u, v), (v, w) if v < w else (w, v),
                        (u, w)} <= es:
                    for x in (u, v, w):
                        out[x] = out.get(x, 0) + 1
    return out


def test_triangle_counts_hand_graph(ray_session):
    """K4 plus a pendant edge plus an isolated edge: known counts, and
    the directed/duplicate-direction input contract (src < dst kept)."""
    import ray.data as rd
    from covertile.graphops import triangle_counts

    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
           (4, 5),                                          # pendant
           (10, 11)]                                        # isolated
    src = [u for u, v in und]
    dst = [v for u, v in und]
    tbl = pa.table({"src_id": pa.array(src + dst, pa.int64()),
                    "dst_id": pa.array(dst + src, pa.int64())})
    got = (triangle_counts(rd.from_arrow(tbl).repartition(3))
           .to_pandas().set_index("point_id")["n_triangles"].to_dict())
    assert got == _counts(und)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}  # K4 corners only


def test_triangle_counts_empty_and_triangle_free(ray_session):
    import ray.data as rd
    from covertile.graphops import triangle_counts

    empty = pa.table({"src_id": pa.array([], pa.int64()),
                      "dst_id": pa.array([], pa.int64())})
    assert triangle_counts(rd.from_arrow(empty)).count() == 0
    path = pa.table({"src_id": pa.array([1, 2, 3], pa.int64()),
                     "dst_id": pa.array([2, 3, 4], pa.int64())})
    assert triangle_counts(rd.from_arrow(path)).count() == 0


def test_triangle_counts_matches_oracle(ray_session):
    """Driver-surface query vs the 3-way self-join SQL at sf0.001."""
    from covertile import api

    got = (api.q_triangle_counts(SF).to_pandas()
           .reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(api.sql_triangle_counts()).df()
    assert len(got) == len(want)
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c
    assert got["n_triangles"].sum() > 0, "vacuous fixture"


def test_spatial_components_matches_oracle(ray_session):
    """Epsilon-graph components through the shared dup_components
    machinery vs the recursive-CTE closure at sf0.001."""
    from covertile import api

    got = (api.q_spatial_components(SF).to_pandas()
           .reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(api.sql_spatial_components()).df()
    assert len(got) == len(want)
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c
    assert (got["component_id"] != got["point_id"]).any(), "vacuous"


def test_degree_histogram_hand_graph(ray_session):
    """Path graph 1-2-3 (+ a self-loop to ignore): degrees 1,2,1 ->
    histogram {1: 2, 2: 1}; invariant sum(degree*n) = 2|E|."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.graphops import degree_histogram

    tbl = pa.table({
        "src_id": pa.array([1, 2, 2, 3, 3], pa.int64()),
        "dst_id": pa.array([2, 1, 3, 2, 3], pa.int64()),  # 3-3 self-loop
    })
    got = (degree_histogram(rd.from_arrow(tbl).repartition(3))
           .to_pandas().set_index("degree")["n_vertices"].to_dict())
    assert got == {1: 2, 2: 1}


def test_degree_histogram_matches_oracle(ray_session):
    """Driver-surface query vs the grouped cross-join SQL at sf0.001."""
    from covertile import api

    got = (api.q_degree_histogram(SF).to_pandas()
           .reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(api.sql_degree_histogram()).df()
    assert len(got) == len(want)
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c
    assert got["n_vertices"].sum() > 0, "vacuous fixture"
