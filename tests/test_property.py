"""Property-based tests: the reference's 'any seed should pass' contract
(randomized Gaussian inputs, programs/epsilon_graph.cpp:43-57) explored with
hypothesis instead of a handful of fixed seeds.  Pure-numpy (no Ray)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from covertile.covertree import (
    CoverTree, brute_force_knn, brute_force_radius,
)


def make_points(n, seed, dup_frac, spread):
    rng = np.random.default_rng(seed)
    xy = rng.normal(0.0, spread, size=(n, 2)).astype(np.float32)
    if dup_frac > 0:
        ndup = max(1, int(n * dup_frac))
        xy[rng.integers(0, n, ndup)] = xy[rng.integers(0, n, ndup)]
    return xy


def canon(qi, pi, di):
    order = np.lexsort((pi, qi))
    return qi[order], pi[order], di[order]


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(2, 400),
    seed=st.integers(0, 2**31),
    r=st.floats(0.01, 3.0),
    base=st.sampled_from([1.5, 2.0, 3.0]),
    dup_frac=st.sampled_from([0.0, 0.1]),
    spread=st.sampled_from([0.1, 1.0, 5.0]),
)
def test_radius_query_any_seed(n, seed, r, base, dup_frac, spread):
    xy = make_points(n, seed, dup_frac, spread)
    tree = CoverTree(xy, base=base).build()
    qi, pi, di = canon(*tree.radius_query_batch(xy, np.full(n, r)))
    bq, bp, bd = canon(*brute_force_radius(xy, xy, r))
    assert np.array_equal(qi, bq)
    assert np.array_equal(pi, bp)
    assert np.array_equal(di.view(np.int64), bd.view(np.int64))


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(3, 300),
    seed=st.integers(0, 2**31),
    k=st.integers(1, 12),
    spread=st.sampled_from([0.2, 2.0]),
)
def test_knn_any_seed(n, seed, k, spread):
    xy = make_points(n, seed, 0.0, spread)
    tree = CoverTree(xy).build()
    own = np.arange(n, dtype=np.int64)
    qi, pi, di, _ = tree.knn_batch(xy, k, exclude_pt=own)
    bq, bp, bd = brute_force_knn(xy, xy, k, exclude_pt=own)
    a = np.lexsort((pi, di, qi))
    b = np.lexsort((bp, bd, bq))
    assert np.array_equal(qi[a], bq[b])
    assert np.array_equal(pi[a], bp[b])
    assert np.array_equal(di[a].view(np.int64), bd[b].view(np.int64))


@settings(max_examples=15, deadline=None)
@given(n=st.integers(10, 500), seed=st.integers(0, 2**31))
def test_separation_invariant(n, seed):
    """Sibling non-terminal vertices at level l+1 are pairwise farther apart
    than max_radius * base^-(l+1) (derived from the split rule,
    reference src/CoverTree.cpp:151-171,215-277)."""
    xy = make_points(n, seed, 0.0, 2.0)
    t = CoverTree(xy).build()
    for v in range(t.num_vertices):
        s, e = t.child_off[v], t.child_off[v + 1]
        kids = t.child_ids[s:e]
        kids = kids[~t.terminal[kids]]  # leaf-event children are exempt
        if len(kids) < 2:
            continue
        pts = t._vxy[kids].astype(np.float64)
        d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
        iu = np.triu_indices(len(kids), 1)
        sep = t.max_radius * t.base ** -(float(t.level[v]) + 1.0)
        assert (np.sqrt(d2[iu]) > sep * (1 - 1e-9)).all()


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 200),
    seed=st.integers(0, 2**31),
    r=st.floats(0.0, 0.5),
)
def test_zero_and_tiny_radius(n, seed, r):
    """r=0 returns exactly the coincident-point pairs (closed ball)."""
    xy = make_points(n, seed, 0.2, 0.5)
    tree = CoverTree(xy).build()
    qi, pi, di = canon(*tree.radius_query_batch(xy, np.full(n, r)))
    bq, bp, bd = canon(*brute_force_radius(xy, xy, r))
    assert np.array_equal(qi, bq) and np.array_equal(pi, bp)


# ---------------------------------------------------------------- textops
# Pure-numpy internals of the dedup rewrite (coarse-bucket pair generation
# and byte-packed shingle ids) vs brute-force references.

from itertools import combinations

import pyarrow as pa

from covertile.textops import SHINGLE_K, _run_pairs, shingle_batch


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(0, 300),
    nkeys=st.integers(1, 20),
    nids=st.integers(1, 30),
    seed=st.integers(0, 2**31),
)
def test_run_pairs_matches_bruteforce(n, nkeys, nids, seed):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, nkeys, n)
    ids = rng.integers(0, nids, n)
    id_s, sel, ai, bi = _run_pairs(keys, ids)
    got = set(zip(id_s[ai].tolist(), id_s[bi].tolist()))
    want = set()
    for k in np.unique(keys):
        for a, b in combinations(sorted(set(ids[keys == k].tolist())), 2):
            want.add((a, b))
    assert got == want
    # ordering contract relied on by callers: a < b always
    assert np.all(id_s[ai] < id_s[bi])
    # sel indexes the input arrays consistently (payload gather contract)
    assert np.array_equal(ids[sel], id_s)


def ref_shingle_sets(texts, k):
    return [
        {t[i:i + k].encode() for i in range(max(0, len(t) - k + 1))}
        for t in texts
    ]


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(0, 40),
    seed=st.integers(0, 2**31),
    k=st.sampled_from([2, SHINGLE_K]),
    maxlen=st.integers(0, 60),
)
def test_shingle_batch_matches_char_reference(n, seed, k, maxlen):
    """Byte-packed shingle ids: same per-doc set SIZES and the same
    pairwise intersection sizes as literal k-gram substring sets (the
    quantities Jaccard is computed from), on ASCII text."""
    rng = np.random.default_rng(seed)
    alphabet = np.array(list("abcXYZ 019-"))
    texts = ["".join(rng.choice(alphabet, rng.integers(0, maxlen + 1)))
             for _ in range(n)]
    batch = pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": pa.array(texts, pa.string()),
    })
    ids, sets = shingle_batch(batch, k)
    ref = ref_shingle_sets(texts, k)
    assert len(sets) == n
    for i in range(n):
        assert len(sets[i]) == len(ref[i])
        # uniqueness of the packed id within a doc
        assert len(np.unique(sets[i])) == len(sets[i])
    for i in range(min(n, 10)):
        for j in range(i + 1, min(n, 10)):
            inter_got = len(np.intersect1d(sets[i], sets[j]))
            assert inter_got == len(ref[i] & ref[j])


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(3, 250),
    d=st.integers(3, 8),
    seed=st.integers(0, 2**31),
    r=st.floats(0.05, 2.0),
    k=st.integers(1, 8),
)
def test_ddim_tree_any_seed(n, d, seed, r, k):
    """The d-dimensional generalization must hold the same bitwise
    brute-force contracts as the 2-D tree, at any seed/dim/base point."""
    rng = np.random.default_rng(seed)
    m = rng.normal(0.0, 1.0, size=(n, d)).astype(np.float32)
    m[rng.integers(0, n)] = m[rng.integers(0, n)]  # a duplicate row
    tree = CoverTree(m).build()
    qi, pi, di = canon(*tree.radius_query_batch(m, np.full(n, r)))
    bq, bp, bd = canon(*brute_force_radius(m, m, r))
    assert np.array_equal(qi, bq) and np.array_equal(pi, bp)
    assert np.array_equal(di.view(np.int64), bd.view(np.int64))
    own = np.arange(n, dtype=np.int64)
    qi, pi, di, _ = tree.knn_batch(m, min(k, n - 1), exclude_pt=own)
    bq, bp, bd = brute_force_knn(m, m, min(k, n - 1), exclude_pt=own)
    a = np.lexsort((pi, di, qi))
    b = np.lexsort((bp, bd, bq))
    assert np.array_equal(qi[a], bq[b]) and np.array_equal(pi[a], bp[b])
    assert np.array_equal(di[a].view(np.int64), bd[b].view(np.int64))
