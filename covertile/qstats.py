"""Exact distributed quantiles over integer-valued histogram partials.

The engine's exact-quantile queries (group_quantiles, order value,
inter-arrival gaps) all reduce to the same primitive: a Dataset of
per-block (value, count) partial histogram rows whose GLOBAL merge
answers rank queries.  When the value domain is small that merge is one
domain-bounded groupby; when it can reach millions of distinct values
(gap seconds, price cents over billions of orders) a groupby +
repartition(1) merge pulls a multi-million-row histogram into ONE task
(measured 11.2s of a 5M-event inter-arrival run).

`histogram_quantiles` is the scale-correct two-phase form:

  A. per-block partials collapse to 2^coarse_bits-wide COARSE buckets
     (metadata-sized) and tree-combine on the driver; cumulative bucket
     counts locate each quantile's bucket + residual rank, plus the
     global max.
  B. a second map-only pass over the SAME materialized partials keeps
     only the <= |qs| target buckets (each contributes at most
     2^coarse_bits distinct values per block); the driver merges that
     sliver and reads the answers by index arithmetic.

Neither phase is an all-to-all: both are map passes over the (already
materialized) partials with driver-side metadata combines.  Semantics
are DuckDB quantile_disc: the 1-indexed sorted element at ceil(q·n)
(pinned in pytest by the group_quantiles precedent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def histogram_quantiles(hist_ds, qs, value_col: str = "v",
                        count_col: str = "c", coarse_bits: int = 12):
    """-> (n, {q_percent: value_int | None}, max_int | None).

    hist_ds: Dataset of per-block partial rows (value_col int64 >= 0,
    count_col int64) — the same value may appear in many rows; counts
    add.  The caller should pass a MATERIALIZED dataset (two passes)."""
    import ray

    CB = int(coarse_bits)

    def coarse_part(batch: pa.Table) -> pa.Table:
        g = batch[value_col].to_numpy()
        c = batch[count_col].to_numpy()
        cb, inv = np.unique(g >> CB, return_inverse=True)
        mx = np.zeros(len(cb), np.int64)
        np.maximum.at(mx, inv, g)
        return pa.table({
            "cb": cb,
            "c": np.bincount(inv, weights=c,
                             minlength=len(cb)).astype(np.int64),
            "mx": mx,
        })

    parts = [t for t in ray.get(
        hist_ds.map_batches(coarse_part,
                            batch_format="pyarrow").to_arrow_refs())
        if len(t)]
    if not parts:
        return 0, {int(q): None for q in qs}, None

    allp = pa.concat_tables(parts)
    ucb, inv = np.unique(allp["cb"].to_numpy(), return_inverse=True)
    cnt = np.bincount(inv, weights=allp["c"].to_numpy(),
                      minlength=len(ucb)).astype(np.int64)
    mx = np.zeros(len(ucb), np.int64)
    np.maximum.at(mx, inv, allp["mx"].to_numpy())
    cum = np.cumsum(cnt)
    n = int(cum[-1])
    if n == 0:
        return 0, {int(q): None for q in qs}, None

    targets: dict[int, int] = {}   # q -> residual rank inside its bucket
    tbuckets: dict[int, int] = {}  # q -> coarse bucket
    for q in qs:
        k = max(int(np.ceil(q / 100.0 * n)), 1)
        bi = int(np.searchsorted(cum, k, side="left"))
        tbuckets[int(q)] = int(ucb[bi])
        targets[int(q)] = k - (int(cum[bi - 1]) if bi else 0)
    need = np.unique(np.array(sorted(set(tbuckets.values())), np.int64))

    def target_part(batch: pa.Table) -> pa.Table:
        g = batch[value_col].to_numpy()
        keep = np.isin(g >> CB, need)
        return pa.table({"v": g[keep],
                         "c": batch[count_col].to_numpy()[keep]})

    tp = [t for t in ray.get(
        hist_ds.map_batches(target_part,
                            batch_format="pyarrow").to_arrow_refs())
        if len(t)]
    tt = pa.concat_tables(tp)
    ug, tinv = np.unique(tt["v"].to_numpy(), return_inverse=True)
    uc = np.bincount(tinv, weights=tt["c"].to_numpy(),
                     minlength=len(ug)).astype(np.int64)

    out: dict[int, int] = {}
    for q in qs:
        b = tbuckets[int(q)]
        m = (ug >> CB) == b
        bcum = np.cumsum(uc[m])
        out[int(q)] = int(ug[m][np.searchsorted(bcum, targets[int(q)],
                                                side="left")])
    return n, out, int(mx.max())
