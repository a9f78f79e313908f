"""Two-phase exact histogram quantiles (covertile/qstats.py) vs brute."""

import numpy as np
import pyarrow as pa
import pytest


def _brute(values, counts, qs):
    order = np.argsort(values)
    v, c = values[order], counts[order]
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0
    out = {}
    for q in qs:
        k = max(int(np.ceil(q / 100.0 * n)), 1)
        out[q] = int(v[np.searchsorted(cum, k, side="left")])
    return n, out, int(v[-1]) if n else None


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("coarse_bits", [3, 12])
def test_histogram_quantiles_matches_brute(ray_session, seed, coarse_bits):
    """Random multi-block partial histograms (duplicate values across
    blocks, counts > 1, values straddling coarse-bucket boundaries):
    the two-phase result must equal the single-array brute merge for
    ANY coarse bucket width."""
    import ray.data as rd
    from covertile.qstats import histogram_quantiles

    rng = np.random.default_rng(seed)
    qs = (25, 50, 90, 99)
    # values concentrated near coarse boundaries (k*2^cb +/- 1)
    base = rng.integers(0, 50, size=400) * (1 << coarse_bits)
    vals = (base + rng.integers(-1, 2, size=400)).clip(0)
    cnts = rng.integers(1, 7, size=400).astype(np.int64)
    blocks = np.array_split(np.arange(400), 7)
    ds = rd.from_arrow_refs([__import__("ray").put(pa.table({
        "v": vals[b].astype(np.int64), "c": cnts[b]})) for b in blocks])
    got = histogram_quantiles(ds.materialize(), qs,
                              coarse_bits=coarse_bits)
    # brute merge over the concatenated multiset
    uv, inv = np.unique(vals, return_inverse=True)
    uc = np.bincount(inv, weights=cnts, minlength=len(uv)).astype(np.int64)
    want = _brute(uv, uc, qs)
    assert got == want


def test_histogram_quantiles_empty(ray_session):
    import ray.data as rd
    from covertile.qstats import histogram_quantiles

    ds = rd.from_arrow(pa.table({"v": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())}))
    n, qv, mx = histogram_quantiles(ds.materialize(), (50, 99))
    assert n == 0 and mx is None and qv == {50: None, 99: None}


def test_histogram_quantiles_single_value(ray_session):
    import ray.data as rd
    from covertile.qstats import histogram_quantiles

    ds = rd.from_arrow(pa.table({"v": pa.array([7, 7], pa.int64()),
                                 "c": pa.array([3, 4], pa.int64())}))
    n, qv, mx = histogram_quantiles(ds.materialize(), (50,))
    assert (n, qv[50], mx) == (7, 7, 7)
