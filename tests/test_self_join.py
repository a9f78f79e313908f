"""Self-join fast paths must equal the generic routed paths exactly."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd
    from covertile.pipeline import build_index, derive_points

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    res = 3
    pts = derive_points(docs, res)
    ck = str(tmp_path_factory.mktemp("selfjoin") / "ck")
    idx = build_index(pts, ck, res, target_points=64, min_partitions=4)
    return idx, pts


def _sorted_df(ds, cols):
    return (ds.to_pandas().sort_values(cols).reset_index(drop=True))


def test_epsilon_self_equals_routed(built):
    from covertile.queries import epsilon_graph, epsilon_graph_self

    idx, pts = built
    a = _sorted_df(epsilon_graph(idx, pts, 0.5), ["src_id", "dst_id"])
    b = _sorted_df(epsilon_graph_self(idx, 0.5), ["src_id", "dst_id"])
    assert len(a) == len(b)
    for c in ["src_id", "dst_id"]:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy())
    assert np.array_equal(a["dist"].to_numpy().view(np.int64),
                          b["dist"].to_numpy().view(np.int64))


def test_knn_self_equals_routed(built):
    from covertile.queries import knn_join

    idx, pts = built
    a = _sorted_df(knn_join(idx, pts, 8, mode="groups"),
                   ["query_id", "rank"])
    b = _sorted_df(knn_join(idx, pts, 8, mode="self"),
                   ["query_id", "rank"])
    assert len(a) == len(b)
    for c in ["query_id", "rank", "neighbor_id"]:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy())
    assert np.array_equal(a["dist"].to_numpy().view(np.int64),
                          b["dist"].to_numpy().view(np.int64))


def test_epsilon_actors_equals_groups(built):
    from covertile.queries import epsilon_graph

    idx, pts = built
    a = _sorted_df(epsilon_graph(idx, pts, 0.5, mode="groups"),
                   ["src_id", "dst_id"])
    b = _sorted_df(epsilon_graph(idx, pts, 0.5, mode="actors",
                                 concurrency=(1, 2)),
                   ["src_id", "dst_id"])
    assert len(a) == len(b)
    for c in ["src_id", "dst_id"]:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy())
    assert np.array_equal(a["dist"].to_numpy().view(np.int64),
                          b["dist"].to_numpy().view(np.int64))


def test_knn_actors_equals_groups(built):
    from covertile.queries import knn_join

    idx, pts = built
    a = _sorted_df(knn_join(idx, pts, 8, mode="groups"),
                   ["query_id", "rank"])
    b = _sorted_df(knn_join(idx, pts, 8, mode="actors",
                            concurrency=(1, 2)),
                   ["query_id", "rank"])
    assert len(a) == len(b)
    for c in ["query_id", "rank", "neighbor_id"]:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy())
    assert np.array_equal(a["dist"].to_numpy().view(np.int64),
                          b["dist"].to_numpy().view(np.int64))


def test_knn_spill_paths_identical(built):
    """spill=True (parquet round trip) and spill=False (object-store
    blocks) must produce bitwise-identical results."""
    import numpy as np
    from covertile.queries import knn_join

    idx, pts = built
    a = _sorted_df(knn_join(idx, pts, 8, spill=True),
                   ["query_id", "rank"])
    b = _sorted_df(knn_join(idx, pts, 8, spill=False),
                   ["query_id", "rank"])
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.array_equal(av.view(np.int64), bv.view(np.int64)), c
        else:
            assert np.array_equal(av, bv), c
