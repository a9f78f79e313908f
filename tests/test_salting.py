"""Skew handling: a hot cell (many duplicate coordinates) must be salted
into multiple partitions and still answer queries exactly."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def hot_index(ray_session, tmp_path_factory):
    """300 points in one tiny spot (one cell) + 200 spread out."""
    import pyarrow as pa
    import ray.data as rd
    from covertile import cells
    from covertile.pipeline import build_index, compute_plan

    rng = np.random.default_rng(11)
    hot_xy = np.full((300, 2), 1.2345, np.float32)  # duplicates, one cell
    cold_xy = (rng.random((200, 2)).astype(np.float32) * 16 - 8)
    xy = np.concatenate([hot_xy, cold_xy])
    ids = np.arange(len(xy), dtype=np.int64)
    res = 4
    t = pa.table({
        "doc_id": ids,
        "x": xy[:, 0], "y": xy[:, 1],
        "cell": cells.cell_of(xy[:, 0], xy[:, 1], res).astype(np.int64),
    })
    pts = rd.from_arrow(t)
    ck = str(tmp_path_factory.mktemp("salt") / "ck")
    idx = build_index(pts, ck, res, target_points=64, min_partitions=2)
    return idx, pts, xy, ids


def test_hot_cell_is_salted(hot_index):
    idx, _, xy, _ = hot_index
    plan = idx.plan
    assert plan.n_salts.max() >= 2, "hot cell was not salted"
    # the duplicates' cell fans out to all its salts
    from covertile import cells
    hot_cell = cells.cell_of(xy[:1, 0], xy[:1, 1], plan.resolution)
    rep, pids = plan.pids_of_cells(hot_cell)
    assert len(pids) == plan.n_salts.max()
    assert len(np.unique(pids)) == len(pids)


def test_salted_epsilon_exact(hot_index):
    """All 300 duplicates are mutual neighbors at any radius; results must
    contain every (dup, dup) pair exactly once despite the salt split."""
    from covertile.covertree import brute_force_radius
    from covertile.queries import epsilon_graph

    idx, pts, xy, ids = hot_index
    r = 0.75
    got = (epsilon_graph(idx, pts, r).to_pandas()
           .sort_values(["src_id", "dst_id"]).reset_index(drop=True))
    qi, pi, di = brute_force_radius(xy, xy, r)
    order = np.lexsort((pi, qi))
    assert len(got) == len(qi)
    assert np.array_equal(got["src_id"].to_numpy(), ids[qi[order]])
    assert np.array_equal(got["dst_id"].to_numpy(), ids[pi[order]])
    assert np.array_equal(got["dist"].to_numpy().view(np.int64),
                          di[order].view(np.int64))
    # sanity: the duplicate block contributes 300*300 self-pairs
    dup = got[(got["src_id"] < 300) & (got["dst_id"] < 300)]
    assert len(dup) == 300 * 300


def test_salted_knn_exact(hot_index):
    """kNN among duplicates: k nearest of a duplicate are other duplicates
    at distance 0, tie-broken by doc id — across salt partitions."""
    from covertile.covertree import brute_force_knn
    from covertile.queries import knn_join

    idx, pts, xy, ids = hot_index
    k = 5
    got = (knn_join(idx, pts, k).to_pandas()
           .sort_values(["query_id", "rank"]).reset_index(drop=True))
    qi, pi, di = brute_force_knn(xy, xy, k, exclude_pt=np.arange(len(xy)))
    assert len(got) == len(qi)
    assert np.array_equal(got["query_id"].to_numpy(), ids[qi])
    assert np.array_equal(got["neighbor_id"].to_numpy(), ids[pi])
    assert np.array_equal(got["dist"].to_numpy().view(np.int64),
                          di.view(np.int64))
    # duplicate queries: neighbors are the k smallest OTHER duplicate ids
    q0 = got[got["query_id"] == 0]
    assert q0["neighbor_id"].tolist() == [1, 2, 3, 4, 5]
    assert (q0["dist"] == 0).all()


def test_salted_self_modes_exact(hot_index):
    """The shuffle-free self-join paths must stay exact when duplicates
    are split across salt partitions (each salt holds a share of the hot
    cell; phase A answers locally, the cross-salt pairs ride the boundary
    route)."""
    from covertile.covertree import brute_force_knn, brute_force_radius
    from covertile.queries import epsilon_graph_self, knn_join

    idx, pts, xy, ids = hot_index
    got = (epsilon_graph_self(idx, 0.75).to_pandas()
           .sort_values(["src_id", "dst_id"]).reset_index(drop=True))
    qi, pi, di = brute_force_radius(xy, xy, 0.75)
    order = np.lexsort((pi, qi))
    assert len(got) == len(qi)
    assert np.array_equal(got["src_id"].to_numpy(), ids[qi[order]])
    assert np.array_equal(got["dst_id"].to_numpy(), ids[pi[order]])

    k = 5
    got_k = (knn_join(idx, pts, k, mode="self").to_pandas()
             .sort_values(["query_id", "rank"]).reset_index(drop=True))
    bq, bp, bd = brute_force_knn(xy, xy, k, exclude_pt=np.arange(len(xy)))
    assert len(got_k) == len(bq)
    assert np.array_equal(got_k["query_id"].to_numpy(), ids[bq])
    assert np.array_equal(got_k["neighbor_id"].to_numpy(), ids[bp])
    assert np.array_equal(got_k["dist"].to_numpy().view(np.int64),
                          bd.view(np.int64))
