"""Cover-tree oracle tests — the reference's own correctness contract
(exact neighbor-set equality vs O(n^2) brute force,
/root/reference/programs/epsilon_graph.cpp:109-163), plus invariants."""

import numpy as np
import pytest

from covertile.covertree import (
    CoverTree,
    brute_force_knn,
    brute_force_radius,
)


def make_points(n, seed=5, dup_frac=0.0):
    rng = np.random.default_rng(seed)
    xy = rng.normal(0.0, np.sqrt(10.0), size=(n, 2)).astype(np.float32)
    if dup_frac > 0:
        ndup = int(n * dup_frac)
        src = rng.integers(0, n, ndup)
        dst = rng.integers(0, n, ndup)
        xy[dst] = xy[src]
    return xy


def canon(qi, pi, di):
    order = np.lexsort((pi, qi))
    return qi[order], pi[order], di[order]


@pytest.mark.parametrize("n,seed,r", [
    (1000, 5, 0.15), (1000, 5, 0.5), (1000, 7, 1.0),
    (5000, 5, 0.15), (5000, 11, 0.5),
])
def test_epsilon_graph_matches_brute_force(n, seed, r):
    xy = make_points(n, seed)
    tree = CoverTree(xy).build()
    qi, pi, di = canon(*tree.radius_query_batch(xy, np.full(n, r)))
    bq, bp, bd = canon(*brute_force_radius(xy, xy, r))
    assert np.array_equal(qi, bq)
    assert np.array_equal(pi, bp)
    assert np.array_equal(di.view(np.int64), bd.view(np.int64))  # bitwise


def test_duplicates_and_leaf_chains():
    # 5% duplicated coordinate pairs exercises the leaf-chain path
    # (ref src/CoverTree.cpp:157-160,181-213): all duplicate ids returned
    xy = make_points(2000, seed=3, dup_frac=0.05)
    tree = CoverTree(xy).build()
    qi, pi, di = canon(*tree.radius_query_batch(xy, np.full(len(xy), 0.3)))
    bq, bp, bd = canon(*brute_force_radius(xy, xy, 0.3))
    assert np.array_equal(qi, bq) and np.array_equal(pi, bp)


def test_all_identical_points():
    xy = np.ones((50, 2), np.float32)
    tree = CoverTree(xy).build()
    qi, pi, _ = tree.radius_query_batch(xy[:3], np.full(3, 0.1))
    assert len(qi) == 150  # every query sees all 50 duplicates


def test_single_point():
    xy = np.zeros((1, 2), np.float32)
    tree = CoverTree(xy).build()
    qi, pi, di = tree.radius_query_batch(xy, np.array([1.0]))
    assert list(pi) == [0] and di[0] == 0.0


def test_self_loop_included():
    xy = make_points(100, 1)
    tree = CoverTree(xy).build()
    qi, pi, di = tree.radius_query_batch(xy, np.full(100, 1e-12))
    # every point finds at least itself at distance 0 (closed ball)
    assert set(zip(qi.tolist(), pi.tolist())) >= {(i, i) for i in range(100)}


def test_nesting_invariant():
    xy = make_points(1000, 5)
    tree = CoverTree(xy).build()
    # ~2.2 vertices/point on Gaussian data (SURVEY §1.1); strictly > n
    assert tree.num_vertices > tree.n
    # root is point 0 at level 0 (ref src/CoverTree.cpp:64)
    assert tree.pt[0] == 0 and tree.level[0] == 0


def test_covering_invariant():
    xy = make_points(2000, 9)
    t = CoverTree(xy).build()
    # every child vertex point lies within parent's ball radius
    for v in range(t.num_vertices):
        s, e = t.child_off[v], t.child_off[v + 1]
        if s == e:
            continue
        kids = t.child_ids[s:e]
        d = np.sqrt(
            ((t._vxy[kids].astype(np.float64)
              - t._vxy[v].astype(np.float64)) ** 2).sum(1))
        assert (d <= t._ball[v] + 1e-12).all()


@pytest.mark.parametrize("n,seed,k", [(1000, 5, 1), (1000, 5, 8), (3000, 2, 16)])
def test_knn_matches_brute_force(n, seed, k):
    xy = make_points(n, seed)
    tree = CoverTree(xy).build()
    own = np.arange(n, dtype=np.int64)
    qi, pi, di, kth = tree.knn_batch(xy, k, exclude_pt=own)
    bq, bp, bd = brute_force_knn(xy, xy, k, exclude_pt=own)
    order = np.lexsort((bp, bd, bq))
    qi2, pi2, di2 = canon(*(qi, pi, di))[:3]
    # compare as sorted (query, dist, id) triples
    a = np.lexsort((pi, di, qi))
    assert np.array_equal(qi[a], bq[order])
    assert np.array_equal(pi[a], bp[order])
    assert np.array_equal(di[a].view(np.int64), bd[order].view(np.int64))
    # kth dist equals the max reported dist per query
    for q in (0, n // 2, n - 1):
        assert kth[q] == di[a][qi[a] == q].max()


def test_knn_small_partition_kth_is_inf():
    xy = make_points(5, 1)
    tree = CoverTree(xy).build()
    qi, pi, di, kth = tree.knn_batch(xy, 10, exclude_pt=np.arange(5))
    assert np.isinf(kth).all()
    assert len(qi) == 5 * 4  # all others returned


def test_serialization_roundtrip():
    xy = make_points(500, 4)
    t = CoverTree(xy).build()
    t2 = CoverTree.from_state(t.to_state())
    qi, pi, di = canon(*t.radius_query_batch(xy[:50], np.full(50, 0.4)))
    qj, pj, dj = canon(*t2.radius_query_batch(xy[:50], np.full(50, 0.4)))
    assert np.array_equal(qi, qj) and np.array_equal(pi, pj)
    assert np.array_equal(di, dj)


# ------------------------------------------------------------- general-d

def make_points_d(n, d, seed=5, clusters=8):
    """Clustered d-dim float32 points (embedding-like: cover trees in
    high d only pay off when data has structure)."""
    rng = np.random.default_rng(seed)
    cent = rng.normal(0.0, 4.0, size=(clusters, d))
    asg = rng.integers(0, clusters, n)
    return (cent[asg] + rng.normal(0.0, 0.5, size=(n, d))).astype(np.float32)


@pytest.mark.parametrize("d,n,r", [
    (1, 2000, 0.4), (3, 2000, 0.9), (8, 2000, 1.8), (16, 1000, 2.6),
])
def test_epsilon_graph_matches_brute_force_ddim(d, n, r):
    xy = make_points_d(n, d)
    tree = CoverTree(xy).build()
    qi, pi, di = canon(*tree.radius_query_batch(xy, np.full(n, r)))
    bq, bp, bd = canon(*brute_force_radius(xy, xy, r))
    assert np.array_equal(qi, bq)
    assert np.array_equal(pi, bp)
    # bitwise distance parity: both paths accumulate float64 in column order
    assert np.array_equal(di.view(np.int64), bd.view(np.int64))
    assert len(qi) >= n  # at least the self-loops


@pytest.mark.parametrize("d,k", [(3, 4), (8, 8), (16, 5)])
def test_knn_matches_brute_force_ddim(d, k):
    n = 1500
    xy = make_points_d(n, d, seed=11)
    tree = CoverTree(xy).build()
    excl = np.arange(n, dtype=np.int64)
    qk, pk, dk, kth = tree.knn_batch(xy, k, exclude_pt=excl)
    bq, bp, bd = brute_force_knn(xy, xy, k, exclude_pt=excl)
    a = np.lexsort((pk, dk, qk))
    b = np.lexsort((bp, bd, bq))
    assert np.array_equal(qk[a], bq[b])
    assert np.array_equal(pk[a], bp[b])
    assert np.array_equal(dk[a].view(np.int64), bd[b].view(np.int64))
    assert np.all(np.isfinite(kth))


def test_ddim_duplicates_and_roundtrip():
    d = 8
    xy = make_points_d(400, d, seed=3)
    xy[50:100] = xy[0]  # heavy duplicates exercise leaf chains at d=8
    tree = CoverTree(xy).build()
    st = tree.to_state()
    tree2 = CoverTree.from_state(st)
    assert tree2.dim == d
    r = np.full(len(xy), 0.7)
    a = canon(*tree.radius_query_batch(xy, r))
    b = canon(*tree2.radius_query_batch(xy, r))
    for u, v in zip(a, b):
        assert np.array_equal(u, v)
