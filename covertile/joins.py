"""Bucketed hash join for Dataset pairs (Arrow-native, nested-column safe).

The portable partitioned hash-join pattern: add `bucket = key % B` to both
sides, union, ONE shuffle on bucket, and merge matching buckets with a
vectorized searchsorted lookup inside map_groups.  Used where both sides
are large (e.g. re-attaching the spans payload to per-doc results) so
neither side is broadcast or collected to the driver.  Works with nested
list<struct> columns, which pandas merges would mangle.

Ray >= 2.46 also ships Dataset.join; this explicit form is kept because it
documents its shuffle key + bucket count and supports Arrow-only payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["hash_join_int_key"]


def hash_join_int_key(left_ds, right_ds, key: str, num_buckets: int = 32,
                      how: str = "inner"):
    """Equi-join two Datasets on an int64 key (unique on the right side).

    how: "inner" or "left" (left rows with no match get nulls).
    Output columns: all left columns then right columns minus the key.
    """
    assert how in ("inner", "left")
    left_cols = [c for c in left_ds.schema().names]
    right_cols = [c for c in right_ds.schema().names if c != key]

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy()
            t = t.append_column("__bucket", pa.array(k % num_buckets))
            return t.append_column("__side", pa.array(
                np.full(len(k), side, np.int8)))
        return f

    import pyarrow.compute as pc

    both = (left_ds.map_batches(tag(0), batch_format="pyarrow")
            .union(right_ds.map_batches(tag(1), batch_format="pyarrow")))

    def merge(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy()
        # union null-fills missing columns; select each side's real ones
        lt = group.filter(pa.array(side == 0)).select(left_cols)
        rt = group.filter(pa.array(side == 1)).select([key] + right_cols)
        lk = lt[key].to_numpy()
        rk = rt[key].to_numpy()
        order = np.argsort(rk, kind="stable")
        rk_s = rk[order]
        pos = np.searchsorted(rk_s, lk)
        pos_c = np.clip(pos, 0, max(0, len(rk_s) - 1))
        hit = (len(rk_s) > 0) & (rk_s[pos_c] == lk)
        ridx = order[pos_c]
        if how == "inner":
            lt = lt.filter(pa.array(hit))
            ridx = ridx[hit]
            out = lt
            for name in right_cols:
                out = out.append_column(
                    name, pc.take(rt[name], pa.array(ridx)))
            return out
        # left join: null right columns where no hit
        out = lt
        idx_arr = pa.array(np.where(hit, ridx, -1), pa.int64())
        idx_arr = pc.if_else(pc.greater_equal(idx_arr, 0), idx_arr,
                             pa.scalar(None, pa.int64()))
        for name in right_cols:
            out = out.append_column(name, pc.take(rt[name], idx_arr))
        return out

    return both.groupby("__bucket").map_groups(merge, batch_format="pyarrow")
