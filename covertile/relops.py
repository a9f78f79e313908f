"""Relational/warehouse pipelines over the TPC-H-shaped tables.

The reference engine is a metric index, but a data-processing engine that
replaces it at 100 TB also carries the classic analytical joins; these two
pipelines exercise the repo's join + aggregation machinery on the
relational tables (lineitem/orders/customer/nation) end to end:

* revenue_by_nation — lineitem ⋈ orders ⋈ customer ⋈ nation revenue
  rollup: per-block partial aggregation BEFORE each exchange (lineitem
  rows collapse to one row per orderkey per block), two declared bucketed
  hash joins (joins.hash_join_int_key) for the large sides, and the
  25-row nation dimension applied as a broadcast numpy lookup — never a
  shuffle.
* pricing_summary — TPC-H-Q1-shaped per-(returnflag, linestatus) rollup:
  pure partial aggregation, one metadata-sized groupby.

Money math is integer: prices/discounts carry 2 decimals, so
cents × (100 − discount_pct) is an exact int64; sums are
order-independent and the final float division is bitwise equal to the
SQL oracle regardless of Ray's combine-tree shape (same discipline as
eventops.tumbling_window).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .joins import hash_join_int_key, mat


def _cents(col) -> np.ndarray:
    return np.round(col.to_numpy() * 100.0).astype(np.int64)


def revenue_by_nation(li_ds, od_ds, cu_ds, nation_tbl: pa.Table):
    """-> (n_name, revenue) sorted; revenue = Σ price·(1−discount)."""
    import ray

    nk = nation_tbl["n_nationkey"].to_numpy().astype(np.int64)
    names = np.asarray(nation_tbl["n_name"], dtype=object)
    lut = np.full(int(nk.max()) + 1, "", dtype=object)
    lut[nk] = names
    lut_ref = ray.put(lut)  # 25 rows: broadcast, never shuffled

    def li_partial(batch: pa.Table) -> pa.Table:
        units = _cents(batch["l_extendedprice"]) * (
            100 - _cents(batch["l_discount"]))
        ok, inv = np.unique(batch["l_orderkey"].to_numpy(),
                            return_inverse=True)
        return pa.table({
            "o_orderkey": ok,
            "units": np.bincount(inv, weights=units).astype(np.int64),
        })

    j1 = hash_join_int_key(
        li_ds.map_batches(li_partial, batch_format="pyarrow"),
        od_ds, key="o_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("units", pa.int64())]))

    def rekey(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch["o_custkey"],
            "units": batch["units"],
        })

    j2 = hash_join_int_key(
        j1.map_batches(rekey, batch_format="pyarrow"),
        cu_ds, key="c_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("units", pa.int64())]))

    def nation_partial(batch: pa.Table) -> pa.Table:
        lut_ = ray.get(lut_ref)
        nkey = batch["c_nationkey"].to_numpy().astype(np.int64)
        uk, inv = np.unique(nkey, return_inverse=True)
        return pa.table({
            "n_name": pa.array(lut_[uk], pa.string()),
            "units": np.bincount(
                inv, weights=batch["units"].to_numpy()).astype(np.int64),
        })

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": batch["n_name"],
            "revenue": batch["sum(units)"].to_numpy().astype(np.float64)
                       / 10000.0,
        })

    return (mat(j2.map_batches(nation_partial, batch_format="pyarrow"))
            .groupby("n_name").sum("units")
            .map_batches(finalize, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort("n_name"))


def revenue_by_nation_sql() -> str:
    pc_ = "CAST(round(l_extendedprice * 100.0) AS BIGINT)"
    dc = "CAST(round(l_discount * 100.0) AS BIGINT)"
    return f"""
SELECT n_name,
       CAST(sum({pc_} * (100 - {dc})) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def pricing_summary(li_ds):
    """-> per (l_returnflag, l_linestatus): count, exact sums and exact-
    ratio averages — the TPC-H Q1 shape as partial aggregation."""
    def partial(batch: pa.Table) -> pa.Table:
        rf = np.asarray(batch["l_returnflag"], dtype=object)
        ls = np.asarray(batch["l_linestatus"], dtype=object)
        key = np.char.add(rf.astype(str), ls.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        qty = _cents(batch["l_quantity"])
        price = _cents(batch["l_extendedprice"])
        disc_units = price * (100 - _cents(batch["l_discount"]))

        def seg(v):
            return np.bincount(inv, weights=v).astype(np.int64)

        return pa.table({
            "l_returnflag": pa.array([k[0] for k in uk], pa.string()),
            "l_linestatus": pa.array([k[1] for k in uk], pa.string()),
            "n": np.bincount(inv, minlength=len(uk)).astype(np.int64),
            "qty_c": seg(qty),
            "price_c": seg(price),
            "disc_u": seg(disc_units),
        })

    agg = (mat(li_ds.map_batches(partial, batch_format="pyarrow"))
           .groupby(["l_returnflag", "l_linestatus"])
           .sum(["n", "qty_c", "price_c", "disc_u"]))

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["sum(n)"].to_numpy().astype(np.float64)
        qty = batch["sum(qty_c)"].to_numpy().astype(np.float64) / 100.0
        price = batch["sum(price_c)"].to_numpy().astype(np.float64) / 100.0
        disc = batch["sum(disc_u)"].to_numpy().astype(np.float64) / 10000.0
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "count_order": batch["sum(n)"],
            "sum_qty": qty,
            "sum_base_price": price,
            "sum_disc_price": disc,
            "avg_qty": qty / n,
            "avg_price": price / n,
        })

    return (agg.map_batches(finalize, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort(["l_returnflag", "l_linestatus"]))


def pricing_summary_sql() -> str:
    q = "CAST(round(l_quantity * 100.0) AS BIGINT)"
    p = "CAST(round(l_extendedprice * 100.0) AS BIGINT)"
    d = "CAST(round(l_discount * 100.0) AS BIGINT)"
    return f"""
SELECT l_returnflag, l_linestatus,
       count(*) AS count_order,
       CAST(sum({q}) AS DOUBLE) / 100.0 AS sum_qty,
       CAST(sum({p}) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(sum({p} * (100 - {d})) AS DOUBLE) / 10000.0 AS sum_disc_price,
       (CAST(sum({q}) AS DOUBLE) / 100.0) / count(*) AS avg_qty,
       (CAST(sum({p}) AS DOUBLE) / 100.0) / count(*) AS avg_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


Q5_REGION = "ASIA"
Q5_DATE_LO = "1995-01-01"
Q5_DATE_HI = "1997-01-01"


def local_supplier_volume(li_ds, od_ds, cu_ds, su_ds, nation_tbl: pa.Table,
                          region_tbl: pa.Table, region: str = Q5_REGION,
                          date_lo: str = Q5_DATE_LO,
                          date_hi: str = Q5_DATE_HI):
    """TPC-H-Q5-shaped rollup: revenue per nation from lineitems whose
    CUSTOMER and SUPPLIER share a nation inside one region, for a date
    window.  Six tables: three bucketed hash joins for the large sides
    (orders date-filtered before its join), the nation⋈region dimension
    (≤25 rows) applied as a broadcast lookup at partial-aggregation time.
    Same integer-cents money math as revenue_by_nation."""
    import ray

    rk = {int(k): str(n) for k, n in zip(
        region_tbl["r_regionkey"].to_numpy(),
        np.asarray(region_tbl["r_name"], dtype=object))}
    nk = nation_tbl["n_nationkey"].to_numpy().astype(np.int64)
    names = np.asarray(nation_tbl["n_name"], dtype=object)
    nreg = nation_tbl["n_regionkey"].to_numpy().astype(np.int64)
    keep_nation = np.array([rk[int(r)] == region for r in nreg])
    lut = np.full(int(nk.max()) + 1, "", dtype=object)
    lut[nk[keep_nation]] = names[keep_nation]  # "" = nation outside region
    lut_ref = ray.put(lut)

    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)

    def od_filter(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].to_numpy().astype(
            "datetime64[us]").view(np.int64)
        m = (ts >= lo) & (ts < hi)
        return pa.table({"o_orderkey": batch["o_orderkey"].to_numpy()[m],
                         "o_custkey": batch["o_custkey"].to_numpy()[m]})

    def li_proj(batch: pa.Table) -> pa.Table:
        units = _cents(batch["l_extendedprice"]) * (
            100 - _cents(batch["l_discount"]))
        return pa.table({"o_orderkey": batch["l_orderkey"],
                         "s_suppkey": batch["l_suppkey"],
                         "units": units})

    j1 = hash_join_int_key(
        li_ds.map_batches(li_proj, batch_format="pyarrow"),
        od_ds.map_batches(od_filter, batch_format="pyarrow"),
        key="o_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("s_suppkey", pa.int64()),
                               ("units", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]))

    def rekey_cust(batch: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": batch["o_custkey"],
                         "s_suppkey": batch["s_suppkey"],
                         "units": batch["units"]})

    j2 = hash_join_int_key(
        j1.map_batches(rekey_cust, batch_format="pyarrow"),
        cu_ds, key="c_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("s_suppkey", pa.int64()),
                               ("units", pa.int64())]))

    def rekey_supp(batch: pa.Table) -> pa.Table:
        return pa.table({"s_suppkey": batch["s_suppkey"],
                         "units": batch["units"],
                         "c_nationkey": batch["c_nationkey"]})

    j3 = hash_join_int_key(
        j2.map_batches(rekey_supp, batch_format="pyarrow"),
        su_ds, key="s_suppkey",
        left_schema=pa.schema([("s_suppkey", pa.int64()),
                               ("units", pa.int64()),
                               ("c_nationkey", pa.int32())]))

    def nation_partial(batch: pa.Table) -> pa.Table:
        lut_ = ray.get(lut_ref)
        cn = batch["c_nationkey"].to_numpy().astype(np.int64)
        sn = batch["s_nationkey"].to_numpy().astype(np.int64)
        m = cn == sn
        cn = cn[m]
        units = batch["units"].to_numpy()[m]
        name = lut_[cn]
        keep = name != ""
        uk, inv = np.unique(name[keep], return_inverse=True)
        return pa.table({
            "n_name": pa.array(uk, pa.string()),
            "units": np.bincount(
                inv, weights=units[keep]).astype(np.int64),
        })

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": batch["n_name"],
            "revenue": batch["sum(units)"].to_numpy().astype(np.float64)
                       / 10000.0,
        })

    return (mat(j3.map_batches(nation_partial, batch_format="pyarrow"))
            .groupby("n_name").sum("units")
            .map_batches(finalize, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort("n_name"))


def local_supplier_volume_sql(region: str = Q5_REGION,
                              date_lo: str = Q5_DATE_LO,
                              date_hi: str = Q5_DATE_HI) -> str:
    pc_ = "CAST(round(l_extendedprice * 100.0) AS BIGINT)"
    dc = "CAST(round(l_discount * 100.0) AS BIGINT)"
    return f"""
SELECT n_name,
       CAST(sum({pc_} * (100 - {dc})) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = '{region}'
  AND o_orderdate >= TIMESTAMP '{date_lo}'
  AND o_orderdate < TIMESTAMP '{date_hi}'
GROUP BY n_name ORDER BY n_name
"""


IDLE_BUCKETS = 64
IDLE_CUTOFF = "2000-01-01"


def idle_customers(cu_ds, od_ds, cutoff: str = IDLE_CUTOFF,
                   nbuckets: int = IDLE_BUCKETS):
    """TPC-H-Q22-shaped ANTI-JOIN rollup: customers with NO order on or
    after `cutoff` ("recently idle"), counted per market segment with
    their cents-exact account-balance total -> (c_mktsegment,
    n_customers, total_acctbal), sorted.  (The unfiltered variant is
    empty on the synthetic tables — every customer has orders — so the
    date predicate both makes the result non-trivial and demonstrates
    filter-below-anti-join pushdown.)

    Anti-join is a join class the Dataset API lacks.  Shape: the date
    filter and a DISTINCT o_custkey collapse run per block BEFORE the
    exchange (order-count-independent), both sides bucket by
    hash(custkey) in ONE declared shuffle, and each bucket filters its
    customers against the bucket's order-key set via np.isin.  The
    per-segment rollup then follows the metadata-sized tree-combine
    discipline (eventops.tumbling_window): segment cardinality is tiny,
    so no ray groupby is paid."""
    import pyarrow.compute as pc

    PHI = np.uint64(0x9E3779B97F4A7C15)
    cut_us = np.datetime64(cutoff, "us").astype(np.int64)

    def bk_of(keys: np.ndarray) -> np.ndarray:
        return ((keys.astype(np.uint64) * PHI) >> np.uint64(40)
                ).astype(np.int64) % np.int64(nbuckets)

    def cust_route(batch: pa.Table) -> pa.Table:
        key = batch["c_custkey"].to_numpy()
        return pa.table({
            "bk": bk_of(key), "key": key,
            "side": np.zeros(len(key), np.int8),
            "seg": batch["c_mktsegment"],
            "cents": _cents(batch["c_acctbal"]),
        })

    def ord_route(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].to_numpy().astype(
            "datetime64[us]").view(np.int64)
        key = np.unique(batch["o_custkey"].to_numpy()[ts >= cut_us])
        return pa.table({
            "bk": bk_of(key), "key": key,
            "side": np.ones(len(key), np.int8),
            "seg": pa.array([""] * len(key), pa.string()),
            "cents": np.zeros(len(key), np.int64),
        })

    def anti(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy()
        key = group["key"].to_numpy()
        cust = side == 0
        okeys = np.unique(key[~cust])
        keep = cust & ~np.isin(key, okeys)
        seg = np.asarray(group["seg"], dtype=object)[keep]
        cents = group["cents"].to_numpy()[keep]
        uk, inv = np.unique(seg, return_inverse=True)
        return pa.table({
            "seg": pa.array(uk, pa.string()),
            "n": np.bincount(inv, minlength=len(uk)).astype(np.int64),
            "cents": np.bincount(inv, weights=cents,
                                 minlength=len(uk)).astype(np.int64),
        })

    routed = (cu_ds.map_batches(cust_route, batch_format="pyarrow")
              .union(od_ds.map_batches(ord_route, batch_format="pyarrow")))

    def finalize(batch: pa.Table) -> pa.Table:
        seg = np.asarray(batch["seg"], dtype=object)
        uk, inv = np.unique(seg, return_inverse=True)
        n = np.bincount(inv, weights=batch["n"].to_numpy(),
                        minlength=len(uk)).astype(np.int64)
        cents = np.bincount(inv, weights=batch["cents"].to_numpy(),
                            minlength=len(uk)).astype(np.int64)
        return pa.table({
            "c_mktsegment": pa.array(uk, pa.string()),
            "n_customers": n,
            "total_acctbal": cents.astype(np.float64) / 100.0,
        })

    return (mat(routed).groupby("bk").map_groups(anti,
                                                 batch_format="pyarrow")
            .repartition(1)
            .map_batches(finalize, batch_format="pyarrow",
                         batch_size=None))


def idle_customers_sql(cutoff: str = IDLE_CUTOFF) -> str:
    cents = "CAST(round(c_acctbal * 100.0) AS BIGINT)"
    return f"""
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(CAST(sum({cents}) AS BIGINT) AS DOUBLE) / 100.0
         AS total_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= DATE '{cutoff}')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-07-01"
Q3_K = 10


def shipping_priority(li_ds, od_ds, cu_ds, segment: str = Q3_SEGMENT,
                      date: str = Q3_DATE, k: int = Q3_K):
    """TPC-H-Q3-shaped top-k: unshipped-revenue per order for one market
    segment -> (l_orderkey, revenue, o_orderdate_us, o_orderpriority),
    the k highest-revenue orders (ties by orderdate then orderkey).

    Shape: both date filters and the segment filter push below the
    joins (per-block, before anything moves); lineitem pre-aggregates
    revenue units per orderkey per block; two bucketed hash joins
    (orders, then segment-filtered customers used as a semi-join);
    per-orderkey merge via ONE groupby; then the top-k discipline — a
    per-block top-k partial under the total order (units DESC,
    orderdate ASC, orderkey ASC) so ≤ k rows per block reach the final
    single-task merge.  Money in integer units (cents x (100-disc)) so
    ordering and the final division are exact."""
    import pyarrow.compute as pc

    cut_us = np.datetime64(date, "us").astype(np.int64)

    def li_partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy().astype(
            "datetime64[us]").view(np.int64)
        keep = ship > cut_us
        units = (_cents(batch["l_extendedprice"]) * (
            100 - _cents(batch["l_discount"])))[keep]
        ok, inv = np.unique(batch["l_orderkey"].to_numpy()[keep],
                            return_inverse=True)
        return pa.table({
            "o_orderkey": ok,
            "units": np.bincount(inv, weights=units,
                                 minlength=len(ok)).astype(np.int64),
        })

    def od_filter(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].to_numpy().astype(
            "datetime64[us]").view(np.int64)
        keep = pa.array(ts < cut_us)
        sel = batch.filter(keep)
        return pa.table({
            "o_orderkey": sel["o_orderkey"],
            "o_custkey": sel["o_custkey"],
            "o_orderdate_us": ts[np.asarray(keep)],
            "o_orderpriority": sel["o_orderpriority"],
        })

    def cu_filter(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(batch["c_mktsegment"], segment))
        return pa.table({"c_custkey": sel["c_custkey"]})

    j1 = hash_join_int_key(
        li_ds.map_batches(li_partial, batch_format="pyarrow"),
        od_ds.map_batches(od_filter, batch_format="pyarrow"),
        key="o_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("units", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_orderdate_us", pa.int64()),
                                ("o_orderpriority", pa.string())]))

    def rekey(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch["o_custkey"],
            "o_orderkey": batch["o_orderkey"],
            "units": batch["units"],
            "o_orderdate_us": batch["o_orderdate_us"],
            "o_orderpriority": batch["o_orderpriority"],
        })

    j2 = hash_join_int_key(
        j1.map_batches(rekey, batch_format="pyarrow"),
        cu_ds.map_batches(cu_filter, batch_format="pyarrow"),
        key="c_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("o_orderkey", pa.int64()),
                               ("units", pa.int64()),
                               ("o_orderdate_us", pa.int64()),
                               ("o_orderpriority", pa.string())]),
        right_schema=pa.schema([("c_custkey", pa.int64())]))

    # per-orderkey merge of the per-block lineitem partials; orderdate /
    # priority are functionally dependent on the key, so they ride as
    # grouping columns
    agg = (mat(j2)
           .groupby(["o_orderkey", "o_orderdate_us", "o_orderpriority"])
           .sum("units"))

    def topk_part(batch: pa.Table) -> pa.Table:
        units = batch["sum(units)"].to_numpy()
        ok = batch["o_orderkey"].to_numpy()
        dt = batch["o_orderdate_us"].to_numpy()
        order = np.lexsort((ok, dt, -units))[:k]
        return pa.table({
            "l_orderkey": ok[order],
            "units": units[order],
            "o_orderdate_us": dt[order],
            "o_orderpriority": pc.take(batch["o_orderpriority"],
                                       pa.array(order)),
        })

    def merge(batch: pa.Table) -> pa.Table:
        units = batch["units"].to_numpy()
        ok = batch["l_orderkey"].to_numpy()
        dt = batch["o_orderdate_us"].to_numpy()
        order = np.lexsort((ok, dt, -units))[:k]
        return pa.table({
            "l_orderkey": ok[order],
            "revenue": units[order].astype(np.float64) / 10000.0,
            "o_orderdate_us": dt[order],
            "o_orderpriority": pc.take(batch["o_orderpriority"],
                                       pa.array(order)),
        })

    return (agg.map_batches(topk_part, batch_format="pyarrow")
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None))


def shipping_priority_sql(segment: str = Q3_SEGMENT,
                          date: str = Q3_DATE, k: int = Q3_K) -> str:
    p = "CAST(round(l_extendedprice * 100.0) AS BIGINT)"
    d = "CAST(round(l_discount * 100.0) AS BIGINT)"
    return f"""
SELECT l_orderkey,
       CAST(sum({p} * (100 - {d})) AS DOUBLE) / 10000.0 AS revenue,
       CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < DATE '{date}'
  AND l_shipdate > DATE '{date}'
GROUP BY l_orderkey, o_orderdate_us, o_orderpriority
ORDER BY revenue DESC, o_orderdate_us, l_orderkey
LIMIT {int(k)}
"""


# ------------------------------------------- returned-item report (Q10)

Q10_DATE_LO = "1996-01-01"
Q10_DATE_HI = "1996-04-01"
Q10_K = 20


def returned_item_report(li_ds, od_ds, cu_ds, nation_tbl: pa.Table,
                         date_lo: str = Q10_DATE_LO,
                         date_hi: str = Q10_DATE_HI, k: int = Q10_K):
    """TPC-H-Q10-shaped top-k: the k customers with the highest revenue
    from RETURNED items over one quarter -> (c_custkey, c_name, revenue,
    c_acctbal, n_name), ties under (revenue DESC, c_custkey ASC).

    Shape: the returnflag filter and quarter filter push below the
    joins; lineitem pre-aggregates units per orderkey per block; one
    bucketed hash join onto the filtered quarter's orders, a per-block
    custkey pre-aggregate, ONE per-customer groupby, then a second hash
    join attaching the customer attributes; nation is a 25-row broadcast
    lookup; the top-k discipline bounds the final single-task merge to
    <= k rows per block.  Money in integer units (cents x (100-disc)),
    so ordering and the terminal division are exact."""
    import ray

    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)
    nk = nation_tbl["n_nationkey"].to_numpy().astype(np.int64)
    names = np.asarray(nation_tbl["n_name"], dtype=object)
    lut = np.full(int(nk.max()) + 1, "", dtype=object)
    lut[nk] = names
    lut_ref = ray.put(lut)  # 25 rows: broadcast, never shuffled

    def li_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = np.asarray(pc.equal(batch["l_returnflag"], "R"))
        units = (_cents(batch["l_extendedprice"]) * (
            100 - _cents(batch["l_discount"])))[keep]
        ok, inv = np.unique(batch["l_orderkey"].to_numpy()[keep],
                            return_inverse=True)
        return pa.table({
            "o_orderkey": ok,
            "units": np.bincount(inv, weights=units,
                                 minlength=len(ok)).astype(np.int64),
        })

    def od_filter(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].to_numpy().astype(
            "datetime64[us]").view(np.int64)
        keep = pa.array((ts >= lo) & (ts < hi))
        sel = batch.filter(keep)
        return pa.table({"o_orderkey": sel["o_orderkey"],
                         "o_custkey": sel["o_custkey"]})

    j1 = hash_join_int_key(
        li_ds.map_batches(li_partial, batch_format="pyarrow"),
        od_ds.map_batches(od_filter, batch_format="pyarrow"),
        key="o_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("units", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]))

    def cust_partial(batch: pa.Table) -> pa.Table:
        ck, inv = np.unique(batch["o_custkey"].to_numpy(),
                            return_inverse=True)
        return pa.table({
            "c_custkey": ck,
            "units": np.bincount(
                inv, weights=batch["units"].to_numpy(),
                minlength=len(ck)).astype(np.int64),
        })

    agg = (j1.map_batches(cust_partial, batch_format="pyarrow")
           .groupby("c_custkey").sum("units"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": batch["c_custkey"],
                         "units": batch["sum(units)"]})

    j2 = hash_join_int_key(
        agg.map_batches(rename, batch_format="pyarrow"),
        cu_ds, key="c_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("units", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("c_name", pa.string()),
                                ("c_nationkey", pa.int32()),
                                ("c_acctbal", pa.float64())]))

    def topk_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        units = batch["units"].to_numpy()
        ck = batch["c_custkey"].to_numpy()
        order = np.lexsort((ck, -units))[:k]
        sel = pa.array(order)
        return pa.table({
            "c_custkey": ck[order],
            "c_name": pc.take(batch["c_name"], sel),
            "units": units[order],
            "c_acctbal": pc.take(batch["c_acctbal"], sel),
            "c_nationkey": pc.take(batch["c_nationkey"], sel),
        })

    def merge(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        lut_ = ray.get(lut_ref)
        units = batch["units"].to_numpy()
        ck = batch["c_custkey"].to_numpy()
        order = np.lexsort((ck, -units))[:k]
        nkey = batch["c_nationkey"].to_numpy().astype(np.int64)[order]
        sel = pa.array(order)
        return pa.table({
            "c_custkey": ck[order],
            "c_name": pc.take(batch["c_name"], sel),
            "revenue": units[order].astype(np.float64) / 10000.0,
            "c_acctbal": pc.take(batch["c_acctbal"], sel),
            "n_name": pa.array(lut_[nkey], pa.string()),
        })

    return (j2.map_batches(topk_part, batch_format="pyarrow")
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None))


def returned_item_report_sql(date_lo: str = Q10_DATE_LO,
                             date_hi: str = Q10_DATE_HI,
                             k: int = Q10_K) -> str:
    p = "CAST(round(l_extendedprice * 100.0) AS BIGINT)"
    d = "CAST(round(l_discount * 100.0) AS BIGINT)"
    return f"""
SELECT c_custkey, c_name,
       CAST(sum({p} * (100 - {d})) AS DOUBLE) / 10000.0 AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '{date_lo}'
  AND o_orderdate <  DATE '{date_hi}'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT {int(k)}
"""


# --------------------------------------------- promo revenue share (Q14)

Q14_DATE_LO = "1996-09-01"
Q14_DATE_HI = "1996-10-01"


def promo_revenue_share(li_ds, part_tbl: pa.Table,
                        date_lo: str = Q14_DATE_LO,
                        date_hi: str = Q14_DATE_HI):
    """TPC-H-Q14-shaped scalar: the percentage of one month's gross
    revenue that came from PROMO parts -> one row (promo_pct).

    Shape: part is the broadcast small side (a sorted promo-partkey
    array, membership via searchsorted — never a shuffle); lineitem
    collapses to TWO int64 partials per block (promo units, total
    units) below a single-row merge.  The one float expression
    100.0 * promo / total is evaluated in the identical order as the
    SQL oracle; empty selections yield SQL-NULL parity."""
    import pyarrow.compute as pc
    import ray

    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)
    pk = part_tbl["p_partkey"].to_numpy().astype(np.int64)
    promo = np.asarray(pc.equal(part_tbl["p_type"], "PROMO"))
    promo_keys = np.sort(pk[promo])
    keys_ref = ray.put(promo_keys)

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy().astype(
            "datetime64[us]").view(np.int64)
        keep = (ship >= lo) & (ship < hi)
        units = (_cents(batch["l_extendedprice"]) * (
            100 - _cents(batch["l_discount"])))[keep]
        pkeys = batch["l_partkey"].to_numpy().astype(np.int64)[keep]
        kv = ray.get(keys_ref)
        idx = np.searchsorted(kv, pkeys)
        idx_c = np.minimum(idx, max(len(kv) - 1, 0))
        is_promo = (kv[idx_c] == pkeys) if len(kv) else \
            np.zeros(len(pkeys), bool)
        return pa.table({
            "promo": pa.array([int(units[is_promo].sum())], pa.int64()),
            "total": pa.array([int(units.sum())], pa.int64()),
        })

    def merge(batch: pa.Table) -> pa.Table:
        p = int(batch["promo"].to_numpy().sum())
        t = int(batch["total"].to_numpy().sum())
        pct = (100.0 * float(p)) / float(t) if t else None
        return pa.table({"promo_pct": pa.array([pct], pa.float64())})

    return (li_ds.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None))


def promo_revenue_share_sql(date_lo: str = Q14_DATE_LO,
                            date_hi: str = Q14_DATE_HI) -> str:
    p = "CAST(round(l_extendedprice * 100.0) AS BIGINT)"
    d = "CAST(round(l_discount * 100.0) AS BIGINT)"
    u = f"{p} * (100 - {d})"
    return f"""
SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {u} ELSE 0 END)
                    AS DOUBLE)
       / CAST(sum({u}) AS DOUBLE) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '{date_lo}'
  AND l_shipdate <  DATE '{date_hi}'
"""


# --------------------------------------- order-priority counts (Q4)

Q4_LATE_DAYS = 90


def order_priority_counts(li_ds, od_ds, late_days: int = Q4_LATE_DAYS,
                          nbuckets: int = 64):
    """TPC-H-Q4-shaped EXISTS semi-join rollup: orders with at least one
    lineitem shipped more than `late_days` after the order date, counted
    per o_orderpriority -> (o_orderpriority, n_orders), sorted.

    The EXISTS predicate compares columns ACROSS the two tables
    (l_shipdate vs o_orderdate), so unlike idle_customers' anti-join the
    order row itself must reach the bucket.  Shape: lineitem collapses
    per block to one (orderkey, max shipdate) row — max is the complete
    sufficient statistic for any 'exists a lineitem later than X'
    predicate — both sides bucket by hash(orderkey) in ONE declared
    shuffle, each bucket resolves the semi-join with a searchsorted
    lookup, and the 5-row priority rollup follows the metadata-sized
    tree-combine discipline (idle_customers / eventops.tumbling_window)."""
    PHI = np.uint64(0x9E3779B97F4A7C15)
    late_us = np.int64(late_days) * np.int64(86_400_000_000)

    def bk_of(keys: np.ndarray) -> np.ndarray:
        return ((keys.astype(np.uint64) * PHI) >> np.uint64(40)
                ).astype(np.int64) % np.int64(nbuckets)

    def li_route(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy().astype(
            "datetime64[us]").view(np.int64)
        ok, inv = np.unique(batch["l_orderkey"].to_numpy(),
                            return_inverse=True)
        mx = np.full(len(ok), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, ship)
        return pa.table({
            "bk": bk_of(ok), "key": ok,
            "side": np.ones(len(ok), np.int8),
            "ship_us": mx,
            "odate_us": np.zeros(len(ok), np.int64),
            "prio": pa.array([""] * len(ok), pa.string()),
        })

    def od_route(batch: pa.Table) -> pa.Table:
        key = batch["o_orderkey"].to_numpy()
        return pa.table({
            "bk": bk_of(key), "key": key,
            "side": np.zeros(len(key), np.int8),
            "ship_us": np.zeros(len(key), np.int64),
            "odate_us": batch["o_orderdate"].to_numpy().astype(
                "datetime64[us]").view(np.int64),
            "prio": batch["o_orderpriority"],
        })

    def semi(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy()
        key = group["key"].to_numpy()
        li = side == 1
        lk, inv = np.unique(key[li], return_inverse=True)
        okey = key[~li]
        if len(lk) == 0 or len(okey) == 0:
            return pa.table({"prio": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        mx = np.full(len(lk), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, group["ship_us"].to_numpy()[li])
        pos = np.searchsorted(lk, okey)
        pos_ok = (pos < len(lk))
        pos_c = np.minimum(pos, len(lk) - 1)
        hit = pos_ok & (lk[pos_c] == okey) & (
            mx[pos_c] > group["odate_us"].to_numpy()[~li] + late_us)
        prio = np.asarray(group["prio"], dtype=object)[~li][hit]
        uk, inv2 = np.unique(prio, return_inverse=True)
        return pa.table({
            "prio": pa.array(uk, pa.string()),
            "n": np.bincount(inv2, minlength=len(uk)).astype(np.int64),
        })

    routed = (li_ds.map_batches(li_route, batch_format="pyarrow")
              .union(od_ds.map_batches(od_route, batch_format="pyarrow")))

    def finalize(batch: pa.Table) -> pa.Table:
        prio = np.asarray(batch["prio"], dtype=object)
        uk, inv = np.unique(prio, return_inverse=True)
        return pa.table({
            "o_orderpriority": pa.array(uk, pa.string()),
            "n_orders": np.bincount(
                inv, weights=batch["n"].to_numpy(),
                minlength=len(uk)).astype(np.int64),
        })

    return (routed.groupby("bk").map_groups(semi, batch_format="pyarrow")
            .repartition(1)
            .map_batches(finalize, batch_format="pyarrow",
                         batch_size=None))


def order_priority_counts_sql(late_days: int = Q4_LATE_DAYS) -> str:
    return f"""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
                                   + INTERVAL {int(late_days)} DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ------------------------------------- large-order customers (Q18)

Q18_QTY_THRESHOLD = 200
Q18_K = 100


def large_order_customers(li_ds, od_ds, cu_ds,
                          threshold: int = Q18_QTY_THRESHOLD,
                          k: int = Q18_K):
    """TPC-H-Q18-shaped HAVING + join-back: orders whose total lineitem
    quantity exceeds `threshold`, joined back to their customer ->
    (rank, c_custkey, c_name, o_orderkey, o_orderdate_us, o_totalprice,
    sum_qty), top-k by quantity (ties by orderkey).

    Shape: lineitem collapses per block to (orderkey, qty partial) —
    quantities are 2-decimal-exact so the partial is an int64 in
    quantity-cents; one bucketed hash join attaches the order row; the
    HAVING filter runs inside the join's merge output (per-orderkey
    groupby + threshold), and only the surviving candidate rows — rare
    by construction at any scale, that's what a tail threshold means —
    flow into a second bucketed join against customer and the top-k
    partial/merge discipline (shipping_priority)."""
    import pyarrow.compute as pc

    thr_units = np.int64(threshold) * np.int64(100)

    def li_partial(batch: pa.Table) -> pa.Table:
        qty = _cents(batch["l_quantity"])
        ok, inv = np.unique(batch["l_orderkey"].to_numpy(),
                            return_inverse=True)
        return pa.table({
            "o_orderkey": ok,
            "qty_units": np.bincount(inv, weights=qty,
                                     minlength=len(ok)).astype(np.int64),
        })

    def od_project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "o_orderdate_us": batch["o_orderdate"].to_numpy().astype(
                "datetime64[us]").view(np.int64),
            "o_totalprice_cents": _cents(batch["o_totalprice"]),
        })

    j1 = hash_join_int_key(
        li_ds.map_batches(li_partial, batch_format="pyarrow"),
        od_ds.map_batches(od_project, batch_format="pyarrow"),
        key="o_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("qty_units", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_orderdate_us", pa.int64()),
                                ("o_totalprice_cents", pa.int64())]))

    # per-orderkey merge of lineitem partials; order columns are
    # functionally dependent on the key so they ride as grouping columns
    agg = (j1.groupby(["o_orderkey", "o_custkey", "o_orderdate_us",
                       "o_totalprice_cents"]).sum("qty_units"))

    def having(batch: pa.Table) -> pa.Table:
        q = batch["sum(qty_units)"].to_numpy()
        keep = q > thr_units
        sel = batch.filter(pa.array(keep))
        # per-block top-k prune under the final total order: the merge
        # task never sees more than k rows per block
        qs = q[keep]
        order = np.lexsort((sel["o_orderkey"].to_numpy(), -qs))[:k]
        sel = sel.take(pa.array(order))
        return pa.table({
            "c_custkey": sel["o_custkey"],
            "o_orderkey": sel["o_orderkey"],
            "o_orderdate_us": sel["o_orderdate_us"],
            "o_totalprice_cents": sel["o_totalprice_cents"],
            "qty_units": sel["sum(qty_units)"],
        })

    def cu_project(batch: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": batch["c_custkey"],
                         "c_name": batch["c_name"]})

    j2 = hash_join_int_key(
        agg.map_batches(having, batch_format="pyarrow"),
        cu_ds.map_batches(cu_project, batch_format="pyarrow"),
        key="c_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("o_orderkey", pa.int64()),
                               ("o_orderdate_us", pa.int64()),
                               ("o_totalprice_cents", pa.int64()),
                               ("qty_units", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("c_name", pa.string())]))

    def merge(batch: pa.Table) -> pa.Table:
        q = batch["qty_units"].to_numpy()
        ok = batch["o_orderkey"].to_numpy()
        order = np.lexsort((ok, -q))[:k]
        sel = batch.take(pa.array(order))
        return pa.table({
            "rank": np.arange(1, len(order) + 1, dtype=np.int64),
            "c_custkey": sel["c_custkey"],
            "c_name": sel["c_name"],
            "o_orderkey": sel["o_orderkey"],
            "o_orderdate_us": sel["o_orderdate_us"],
            "o_totalprice": pc.divide(
                pc.cast(sel["o_totalprice_cents"], pa.float64()), 100.0),
            "sum_qty": pc.divide(
                pc.cast(sel["qty_units"], pa.float64()), 100.0),
        })

    return (j2.repartition(1)
            .map_batches(merge, batch_format="pyarrow", batch_size=None))


def large_order_customers_sql(threshold: int = Q18_QTY_THRESHOLD,
                              k: int = Q18_K) -> str:
    q = "CAST(round(l_quantity * 100.0) AS BIGINT)"
    return f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum({q}) AS BIGINT) AS qty_units
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(sum({q}) AS BIGINT) > {int(threshold)} * 100
)
SELECT CAST(row_number() OVER (ORDER BY big.qty_units DESC, o_orderkey)
            AS BIGINT) AS rank,
       c_custkey, c_name, o_orderkey,
       CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us,
       CAST(CAST(round(o_totalprice * 100.0) AS BIGINT) AS DOUBLE)
         / 100.0 AS o_totalprice,
       CAST(big.qty_units AS DOUBLE) / 100.0 AS sum_qty
FROM big JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY big.qty_units DESC, o_orderkey LIMIT {int(k)}
"""


# --------------------------------------------------- Q7-shaped trade matrix

Q7_DATE_LO = "1995-01-01"
Q7_DATE_HI = "1998-01-01"


def nation_trade_volume(li_ds, od_ds, cu_ds, su_ds, nation_tbl: pa.Table,
                        date_lo: str = Q7_DATE_LO,
                        date_hi: str = Q7_DATE_HI):
    """TPC-H-Q7-shaped trade matrix: revenue per (supplier nation,
    customer nation, shipdate year) inside a shipdate window -> rows
    (supp_nation, cust_nation, l_year, revenue) sorted.

    Shape: the shipdate filter runs at the lineitem scan (only matching
    rows enter any exchange); three bucketed hash joins attach the
    supplier nation, the order's customer, and the customer nation; the
    final rollup collapses per block to one row per (supp-nation,
    cust-nation, year) COMPOSITE int64 key — at most 25·25·|years| rows
    per block regardless of input size — before a metadata-sized
    groupby.  The 25-row nation name table is a broadcast lut.  Unlike
    the classic Q7 this keeps ALL nation pairs (a pair filter would
    leave the small-sf fixtures empty); the oracle mirrors that."""
    import ray

    nk = nation_tbl["n_nationkey"].to_numpy().astype(np.int64)
    names = np.asarray(nation_tbl["n_name"], dtype=object)
    lut = np.full(int(nk.max()) + 1, "", dtype=object)
    lut[nk] = names
    lut_ref = ray.put(lut)

    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)

    def li_proj(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].to_numpy().astype("datetime64[us]")
        ts = sd.view(np.int64)
        m = (ts >= lo) & (ts < hi)
        units = (_cents(batch["l_extendedprice"])
                 * (100 - _cents(batch["l_discount"])))[m]
        yr = sd[m].astype("datetime64[Y]").view(np.int64) + 1970
        return pa.table({
            "s_suppkey": batch["l_suppkey"].to_numpy()[m],
            "o_orderkey": batch["l_orderkey"].to_numpy()[m],
            "l_year": yr,
            "units": units,
        })

    li_schema = pa.schema([("s_suppkey", pa.int64()),
                           ("o_orderkey", pa.int64()),
                           ("l_year", pa.int64()),
                           ("units", pa.int64())])

    j1 = hash_join_int_key(
        li_ds.map_batches(li_proj, batch_format="pyarrow"),
        su_ds, key="s_suppkey", left_schema=li_schema,
        right_schema=pa.schema([("s_suppkey", pa.int64()),
                                ("s_nationkey", pa.int32())]))

    def rekey_order(batch: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "l_year": batch["l_year"],
                         "units": batch["units"],
                         "s_nationkey": batch["s_nationkey"]})

    mid_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("l_year", pa.int64()),
                            ("units", pa.int64()),
                            ("s_nationkey", pa.int32())])

    j2 = hash_join_int_key(
        j1.map_batches(rekey_order, batch_format="pyarrow"),
        od_ds, key="o_orderkey", left_schema=mid_schema,
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]))

    def rekey_cust(batch: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": batch["o_custkey"],
                         "l_year": batch["l_year"],
                         "units": batch["units"],
                         "s_nationkey": batch["s_nationkey"]})

    j3 = hash_join_int_key(
        j2.map_batches(rekey_cust, batch_format="pyarrow"),
        cu_ds, key="c_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("l_year", pa.int64()),
                               ("units", pa.int64()),
                               ("s_nationkey", pa.int32())]))

    def partial(batch: pa.Table) -> pa.Table:
        sn = batch["s_nationkey"].to_numpy().astype(np.int64)
        cn = batch["c_nationkey"].to_numpy().astype(np.int64)
        yr = batch["l_year"].to_numpy()
        gkey = (sn << 24) | (cn << 12) | yr  # natkeys < 4096, year < 4096
        uk, inv = np.unique(gkey, return_inverse=True)
        return pa.table({
            "gkey": uk,
            "units": np.bincount(
                inv, weights=batch["units"].to_numpy(),
                minlength=len(uk)).astype(np.int64),
        })

    def finalize(batch: pa.Table) -> pa.Table:
        lut_ = ray.get(lut_ref)
        gk = batch["gkey"].to_numpy()
        return pa.table({
            "supp_nation": pa.array(lut_[gk >> 24], pa.string()),
            "cust_nation": pa.array(lut_[(gk >> 12) & 0xFFF], pa.string()),
            "l_year": gk & 0xFFF,
            "revenue": batch["sum(units)"].to_numpy().astype(np.float64)
                       / 10000.0,
        })

    return (mat(j3.map_batches(partial, batch_format="pyarrow"))
            .groupby("gkey").sum("units")
            .map_batches(finalize, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort(["supp_nation", "cust_nation", "l_year"]))


def nation_trade_volume_sql(date_lo: str = Q7_DATE_LO,
                            date_hi: str = Q7_DATE_HI) -> str:
    pc_ = "CAST(round(l_extendedprice * 100.0) AS BIGINT)"
    dc = "CAST(round(l_discount * 100.0) AS BIGINT)"
    return f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum({pc_} * (100 - {dc})) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '{date_lo}'
  AND l_shipdate <  TIMESTAMP '{date_hi}'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------- Q8-shaped market share

Q8_NATION = "NATION_3"
Q8_REGION = "EUROPE"
Q8_DATE_LO = "1995-01-01"
Q8_DATE_HI = "1997-01-01"


def market_share(li_ds, od_ds, cu_ds, su_ds, nation_tbl: pa.Table,
                 region_tbl: pa.Table, nation: str = Q8_NATION,
                 region: str = Q8_REGION, date_lo: str = Q8_DATE_LO,
                 date_hi: str = Q8_DATE_HI):
    """TPC-H-Q8-shaped market share: among orders placed by customers in
    `region` inside an orderdate window, the share of revenue supplied
    by `nation`, per order year -> (o_year, mkt_share, total_revenue).

    Shape: orders are date-filtered before their join; the region
    membership of the 25 nations and the target nationkey are broadcast
    constants applied at partial-aggregation time; the final exchange
    carries at most |years| rows per block (two int64 sums per year —
    the share is a ratio of exact int64 sums, so the double division is
    bitwise equal to the oracle's)."""
    import ray

    rk = {int(k): str(n) for k, n in zip(
        region_tbl["r_regionkey"].to_numpy(),
        np.asarray(region_tbl["r_name"], dtype=object))}
    nk = nation_tbl["n_nationkey"].to_numpy().astype(np.int64)
    names = np.asarray(nation_tbl["n_name"], dtype=object)
    nreg = nation_tbl["n_regionkey"].to_numpy().astype(np.int64)
    in_region = np.zeros(int(nk.max()) + 1, bool)
    in_region[nk] = np.array([rk[int(r)] == region for r in nreg])
    target = int(nk[np.flatnonzero(names == nation)[0]])
    in_region_ref = ray.put(in_region)

    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)

    def od_filter(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].to_numpy().astype("datetime64[us]")
        ts = od.view(np.int64)
        m = (ts >= lo) & (ts < hi)
        return pa.table({
            "o_orderkey": batch["o_orderkey"].to_numpy()[m],
            "o_custkey": batch["o_custkey"].to_numpy()[m],
            "o_year": od[m].astype("datetime64[Y]").view(np.int64) + 1970,
        })

    def li_proj(batch: pa.Table) -> pa.Table:
        units = _cents(batch["l_extendedprice"]) * (
            100 - _cents(batch["l_discount"]))
        return pa.table({"s_suppkey": batch["l_suppkey"],
                         "o_orderkey": batch["l_orderkey"],
                         "units": units})

    j1 = hash_join_int_key(
        li_ds.map_batches(li_proj, batch_format="pyarrow"),
        su_ds, key="s_suppkey",
        left_schema=pa.schema([("s_suppkey", pa.int64()),
                               ("o_orderkey", pa.int64()),
                               ("units", pa.int64())]),
        right_schema=pa.schema([("s_suppkey", pa.int64()),
                                ("s_nationkey", pa.int32())]))

    def rekey_order(batch: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "units": batch["units"],
                         "s_nationkey": batch["s_nationkey"]})

    j2 = hash_join_int_key(
        j1.map_batches(rekey_order, batch_format="pyarrow"),
        od_ds.map_batches(od_filter, batch_format="pyarrow"),
        key="o_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("units", pa.int64()),
                               ("s_nationkey", pa.int32())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_year", pa.int64())]))

    def rekey_cust(batch: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": batch["o_custkey"],
                         "units": batch["units"],
                         "s_nationkey": batch["s_nationkey"],
                         "o_year": batch["o_year"]})

    j3 = hash_join_int_key(
        j2.map_batches(rekey_cust, batch_format="pyarrow"),
        cu_ds, key="c_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("units", pa.int64()),
                               ("s_nationkey", pa.int32()),
                               ("o_year", pa.int64())]))

    def partial(batch: pa.Table) -> pa.Table:
        keep_ = ray.get(in_region_ref)
        cn = batch["c_nationkey"].to_numpy().astype(np.int64)
        m = keep_[cn]
        yr = batch["o_year"].to_numpy()[m]
        units = batch["units"].to_numpy()[m]
        is_target = (batch["s_nationkey"].to_numpy().astype(
            np.int64)[m] == target)
        uy, inv = np.unique(yr, return_inverse=True)
        return pa.table({
            "o_year": uy,
            "tot_units": np.bincount(inv, weights=units,
                                     minlength=len(uy)).astype(np.int64),
            "nat_units": np.bincount(inv, weights=units * is_target,
                                     minlength=len(uy)).astype(np.int64),
        })

    def finalize(batch: pa.Table) -> pa.Table:
        tot = batch["sum(tot_units)"].to_numpy()
        nat = batch["sum(nat_units)"].to_numpy()
        return pa.table({
            "o_year": batch["o_year"],
            "mkt_share": nat.astype(np.float64) / tot.astype(np.float64),
            "total_revenue": tot.astype(np.float64) / 10000.0,
        })

    return (mat(j3.map_batches(partial, batch_format="pyarrow"))
            .groupby("o_year").sum(["tot_units", "nat_units"])
            .map_batches(finalize, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort("o_year"))


def market_share_sql(nation: str = Q8_NATION, region: str = Q8_REGION,
                     date_lo: str = Q8_DATE_LO,
                     date_hi: str = Q8_DATE_HI) -> str:
    pc_ = "CAST(round(l_extendedprice * 100.0) AS BIGINT)"
    dc = "CAST(round(l_discount * 100.0) AS BIGINT)"
    return f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN sn.n_name = '{nation}'
                     THEN {pc_} * (100 - {dc}) ELSE 0 END) AS DOUBLE)
         / CAST(sum({pc_} * (100 - {dc})) AS DOUBLE) AS mkt_share,
       CAST(sum({pc_} * (100 - {dc})) AS DOUBLE) / 10000.0
         AS total_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
WHERE r_name = '{region}'
  AND o_orderdate >= TIMESTAMP '{date_lo}'
  AND o_orderdate <  TIMESTAMP '{date_hi}'
GROUP BY o_year ORDER BY o_year
"""


# ---------------------------------------------------- Q15-shaped top supplier

Q15_DATE_LO = "1996-01-01"
Q15_DATE_HI = "1996-04-01"


def top_supplier(li_ds, su_ds, date_lo: str = Q15_DATE_LO,
                 date_hi: str = Q15_DATE_HI):
    """TPC-H-Q15-shaped argmax: the supplier(s) with the maximum revenue
    over a shipdate quarter -> (s_suppkey, s_name, total_revenue),
    sorted by suppkey (ALL max-achieving suppliers, as in the spec).

    Shape: the shipdate filter runs at the scan; each block collapses to
    (suppkey, units) partials via bincount; the groupby exchange is
    supplier-sized.  The global max is a driver-side scalar over that
    supplier-sized aggregate (metadata, not data); the surviving row(s)
    join supplier for the name."""
    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)

    def li_partial(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].to_numpy().astype(
            "datetime64[us]").view(np.int64)
        m = (ts >= lo) & (ts < hi)
        units = (_cents(batch["l_extendedprice"])
                 * (100 - _cents(batch["l_discount"])))[m]
        sk, inv = np.unique(batch["l_suppkey"].to_numpy()[m],
                            return_inverse=True)
        return pa.table({
            "s_suppkey": sk,
            "units": np.bincount(inv, weights=units,
                                 minlength=len(sk)).astype(np.int64),
        })

    rev = mat(mat(li_ds.map_batches(li_partial, batch_format="pyarrow"))
              .groupby("s_suppkey").sum("units"))
    best = rev.max("sum(units)")  # supplier-sized aggregate -> scalar
    if best is None:
        # empty shipdate window: 0 rows WITH the schema.  Returned as a
        # pyarrow.Table (allowed by the driver contract) because Ray
        # drops the schema of an empty Dataset through to_pandas().
        return pa.table({
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "total_revenue": pa.array([], pa.float64()),
        })

    def keep_max(batch: pa.Table) -> pa.Table:
        u = batch["units"].to_numpy()
        return batch.filter(pa.array(u == best))

    winners = rev.map_batches(
        lambda b: pa.table({"s_suppkey": b["s_suppkey"],
                            "units": b["sum(units)"]}),
        batch_format="pyarrow").map_batches(keep_max,
                                            batch_format="pyarrow")

    def su_project(batch: pa.Table) -> pa.Table:
        return pa.table({"s_suppkey": batch["s_suppkey"],
                         "s_name": batch["s_name"]})

    j = hash_join_int_key(
        winners,
        su_ds.map_batches(su_project, batch_format="pyarrow"),
        key="s_suppkey",
        left_schema=pa.schema([("s_suppkey", pa.int64()),
                               ("units", pa.int64())]),
        right_schema=pa.schema([("s_suppkey", pa.int64()),
                                ("s_name", pa.string())]))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "s_suppkey": batch["s_suppkey"],
            "s_name": batch["s_name"],
            "total_revenue": batch["units"].to_numpy().astype(np.float64)
                             / 10000.0,
        })

    return (j.map_batches(finalize, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort("s_suppkey"))


def top_supplier_sql(date_lo: str = Q15_DATE_LO,
                     date_hi: str = Q15_DATE_HI) -> str:
    pc_ = "CAST(round(l_extendedprice * 100.0) AS BIGINT)"
    dc = "CAST(round(l_discount * 100.0) AS BIGINT)"
    return f"""
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(sum({pc_} * (100 - {dc})) AS BIGINT) AS units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{date_lo}'
    AND l_shipdate <  TIMESTAMP '{date_hi}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(units AS DOUBLE) / 10000.0 AS total_revenue
FROM rev JOIN supplier USING (s_suppkey)
WHERE units = (SELECT max(units) FROM rev)
ORDER BY s_suppkey
"""


# ------------------------------------------- Q17-shaped small-quantity audit

Q17_BRAND = "Brand#11"


def small_qty_revenue(li_ds, part_ds, brand: str = Q17_BRAND):
    """TPC-H-Q17-shaped correlated-average filter: yearly-averaged
    revenue from lineitems of `brand` parts whose quantity is below 20%
    of that part's average quantity -> one row (avg_yearly; SQL-NULL
    when no row qualifies, mirroring the oracle's empty-sum).

    Shape: part is FILTERED to the brand before its join (the brand is
    a constant fraction of part — the join's right side never carries
    the full part table); the brand lineitem rows are materialized once
    and used twice (per-part stats, then the correlated filter) instead
    of re-scanning lineitem; the per-part average is carried as EXACT
    integers (sum, count) so the 20% predicate is the integer identity
    qty·5·cnt < sum_qty — bitwise-free of float division on both
    engine and oracle sides."""
    def part_filter(batch: pa.Table) -> pa.Table:
        m = np.asarray(batch["p_brand"], dtype=object) == brand
        return pa.table({"p_partkey": batch["p_partkey"].to_numpy()[m]})

    def li_proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": batch["l_partkey"],
            "qty": np.round(batch["l_quantity"].to_numpy()).astype(
                np.int64),
            "price_cents": _cents(batch["l_extendedprice"]),
        })

    brand_rows = mat(hash_join_int_key(
        li_ds.map_batches(li_proj, batch_format="pyarrow"),
        part_ds.map_batches(part_filter, batch_format="pyarrow"),
        key="p_partkey",
        left_schema=pa.schema([("p_partkey", pa.int64()),
                               ("qty", pa.int64()),
                               ("price_cents", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64())])))

    def stats_partial(batch: pa.Table) -> pa.Table:
        pk, inv = np.unique(batch["p_partkey"].to_numpy(),
                            return_inverse=True)
        return pa.table({
            "p_partkey": pk,
            "sumq": np.bincount(inv, weights=batch["qty"].to_numpy(),
                                minlength=len(pk)).astype(np.int64),
            "cnt": np.bincount(inv, minlength=len(pk)).astype(np.int64),
        })

    stats = (mat(brand_rows.map_batches(stats_partial,
                                        batch_format="pyarrow"))
             .groupby("p_partkey").sum(["sumq", "cnt"])
             .map_batches(lambda b: pa.table({
                 "p_partkey": b["p_partkey"],
                 "sumq": b["sum(sumq)"], "cnt": b["sum(cnt)"]}),
                 batch_format="pyarrow"))

    j2 = hash_join_int_key(
        brand_rows, stats, key="p_partkey",
        left_schema=pa.schema([("p_partkey", pa.int64()),
                               ("qty", pa.int64()),
                               ("price_cents", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("sumq", pa.int64()),
                                ("cnt", pa.int64())]))

    def eligible_partial(batch: pa.Table) -> pa.Table:
        q = batch["qty"].to_numpy()
        m = q * 5 * batch["cnt"].to_numpy() < batch["sumq"].to_numpy()
        return pa.table({
            "cents": pa.array([int(batch["price_cents"].to_numpy()[m]
                                   .sum())], pa.int64()),
            "n": pa.array([int(m.sum())], pa.int64()),
        })

    agg = (j2.map_batches(eligible_partial, batch_format="pyarrow")
           .sum(["cents", "n"]))  # driver-side scalar: two int64s
    # an all-empty join (brand with no lineitems) sums to None
    cents = agg["sum(cents)"] if agg else 0
    n = agg["sum(n)"] if agg else 0
    import ray
    return ray.data.from_arrow(pa.table({
        "avg_yearly": pa.array(
            [cents / 700.0 if n else None], pa.float64()),
    }))


def small_qty_revenue_sql(brand: str = Q17_BRAND) -> str:
    q = "CAST(round(l_quantity) AS BIGINT)"
    pc_ = "CAST(round(l_extendedprice * 100.0) AS BIGINT)"
    return f"""
WITH br AS (
  SELECT l_partkey, {q} AS qty, {pc_} AS cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{brand}'
), st AS (
  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sumq,
         CAST(count(*) AS BIGINT) AS cnt
  FROM br GROUP BY l_partkey
)
SELECT CAST(sum(cents) AS DOUBLE) / 700.0 AS avg_yearly
FROM br JOIN st USING (l_partkey)
WHERE qty * 5 * cnt < sumq
"""


# --------------------------------------------- Q19-shaped disjunctive revenue

Q19_BUCKETS = (  # (brand, max_size, qty_lo, qty_hi) - size is 1..max_size
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#5", 15, 20, 30),
)


def brand_bucket_revenue(li_ds, part_ds, buckets=Q19_BUCKETS):
    """TPC-H-Q19-shaped disjunctive-predicate revenue: per brand bucket,
    the revenue of lineitems whose part matches the bucket's brand+size
    range and whose quantity lies in the bucket's range ->
    (p_brand, revenue) sorted, only brands with matches (as GROUP BY).

    Shape: part is filtered to the bucket brands before its join; the
    size/quantity predicates run vectorized inside the join output; the
    final exchange carries at most |buckets| rows per block."""
    brands = [b for b, _, _, _ in buckets]
    brand_id = {b: i for i, b in enumerate(brands)}
    max_size = np.array([s for _, s, _, _ in buckets], np.int64)
    qty_lo = np.array([lo for _, _, lo, _ in buckets], np.int64)
    qty_hi = np.array([hi for _, _, _, hi in buckets], np.int64)

    def part_filter(batch: pa.Table) -> pa.Table:
        pb = np.asarray(batch["p_brand"], dtype=object)
        bid = np.array([brand_id.get(b, -1) for b in pb], np.int64)
        m = bid >= 0
        return pa.table({
            "p_partkey": batch["p_partkey"].to_numpy()[m],
            "bid": bid[m],
            "p_size": batch["p_size"].to_numpy()[m].astype(np.int64),
        })

    def li_proj(batch: pa.Table) -> pa.Table:
        units = _cents(batch["l_extendedprice"]) * (
            100 - _cents(batch["l_discount"]))
        return pa.table({
            "p_partkey": batch["l_partkey"],
            "qty": np.round(batch["l_quantity"].to_numpy()).astype(
                np.int64),
            "units": units,
        })

    j = hash_join_int_key(
        li_ds.map_batches(li_proj, batch_format="pyarrow"),
        part_ds.map_batches(part_filter, batch_format="pyarrow"),
        key="p_partkey",
        left_schema=pa.schema([("p_partkey", pa.int64()),
                               ("qty", pa.int64()),
                               ("units", pa.int64())]),
        right_schema=pa.schema([("p_partkey", pa.int64()),
                                ("bid", pa.int64()),
                                ("p_size", pa.int64())]))

    def partial(batch: pa.Table) -> pa.Table:
        bid = batch["bid"].to_numpy()
        q = batch["qty"].to_numpy()
        sz = batch["p_size"].to_numpy()
        m = ((sz >= 1) & (sz <= max_size[bid])
             & (q >= qty_lo[bid]) & (q <= qty_hi[bid]))
        ub, inv = np.unique(bid[m], return_inverse=True)
        return pa.table({
            "bid": ub,
            "units": np.bincount(
                inv, weights=batch["units"].to_numpy()[m],
                minlength=len(ub)).astype(np.int64),
        })

    def finalize(batch: pa.Table) -> pa.Table:
        names = np.array(brands, dtype=object)
        return pa.table({
            "p_brand": pa.array(names[batch["bid"].to_numpy()],
                                pa.string()),
            "revenue": batch["sum(units)"].to_numpy().astype(np.float64)
                       / 10000.0,
        })

    return (mat(j.map_batches(partial, batch_format="pyarrow"))
            .groupby("bid").sum("units")
            .map_batches(finalize, batch_format="pyarrow")
            .materialize()  # mat() rule: sort re-executes a lazy exchange
            .sort("p_brand"))


def brand_bucket_revenue_sql(buckets=Q19_BUCKETS) -> str:
    pc_ = "CAST(round(l_extendedprice * 100.0) AS BIGINT)"
    dc = "CAST(round(l_discount * 100.0) AS BIGINT)"
    q = "CAST(round(l_quantity) AS BIGINT)"
    ors = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {s} "
        f"AND {q} BETWEEN {lo} AND {hi})"
        for b, s, lo, hi in buckets)
    return f"""
SELECT p_brand,
       CAST(sum({pc_} * (100 - {dc})) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {ors}
GROUP BY p_brand ORDER BY p_brand
"""


# ------------------------------------- Q22-shaped global sales opportunity

def global_sales_opportunity(cu_ds, od_ds, cutoff: str = IDLE_CUTOFF,
                             nbuckets: int = IDLE_BUCKETS):
    """TPC-H-Q22-shaped scalar-subquery + anti-join: customers whose
    account balance exceeds the global average of POSITIVE balances and
    who placed no order on/after `cutoff` -> (c_mktsegment,
    n_customers, total_acctbal), sorted.

    Shape: the scalar subquery is ONE metadata-sized pass over customer
    (per-block (sum, count) partials of positive balance cents,
    tree-combined to two int64s on the driver) and the "above average"
    predicate is the integer identity cents·count > sum — no float
    division on either side, so engine and oracle agree bitwise.  The
    predicate then prunes customers BEFORE the idle_customers-style
    bucketed anti-join (both sides hash once on custkey; per-bucket
    np.isin)."""
    PHI = np.uint64(0x9E3779B97F4A7C15)
    cut_us = np.datetime64(cutoff, "us").astype(np.int64)

    def pos_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["c_acctbal"])
        m = cents > 0
        return pa.table({"s": pa.array([int(cents[m].sum())], pa.int64()),
                         "c": pa.array([int(m.sum())], pa.int64())})

    agg = cu_ds.map_batches(pos_partial, batch_format="pyarrow").sum(
        ["s", "c"])
    pos_sum = int(agg["sum(s)"]) if agg else 0
    pos_cnt = int(agg["sum(c)"]) if agg else 0

    def bk_of(keys: np.ndarray) -> np.ndarray:
        return ((keys.astype(np.uint64) * PHI) >> np.uint64(40)
                ).astype(np.int64) % np.int64(nbuckets)

    def cust_route(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["c_acctbal"])
        m = cents * pos_cnt > pos_sum  # c_acctbal > avg(positive)
        key = batch["c_custkey"].to_numpy()[m]
        return pa.table({
            "bk": bk_of(key), "key": key,
            "side": np.zeros(len(key), np.int8),
            "seg": batch.filter(pa.array(m))["c_mktsegment"],
            "cents": cents[m],
        })

    def ord_route(batch: pa.Table) -> pa.Table:
        ts = batch["o_orderdate"].to_numpy().astype(
            "datetime64[us]").view(np.int64)
        key = np.unique(batch["o_custkey"].to_numpy()[ts >= cut_us])
        return pa.table({
            "bk": bk_of(key), "key": key,
            "side": np.ones(len(key), np.int8),
            "seg": pa.array([""] * len(key), pa.string()),
            "cents": np.zeros(len(key), np.int64),
        })

    def anti(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy()
        key = group["key"].to_numpy()
        cust = side == 0
        okeys = np.unique(key[~cust])
        keep = cust & ~np.isin(key, okeys)
        seg = np.asarray(group["seg"], dtype=object)[keep]
        cents = group["cents"].to_numpy()[keep]
        uk, inv = np.unique(seg, return_inverse=True)
        return pa.table({
            "seg": pa.array(uk, pa.string()),
            "n": np.bincount(inv, minlength=len(uk)).astype(np.int64),
            "cents": np.bincount(inv, weights=cents,
                                 minlength=len(uk)).astype(np.int64),
        })

    routed = (cu_ds.map_batches(cust_route, batch_format="pyarrow")
              .union(od_ds.map_batches(ord_route, batch_format="pyarrow")))

    def finalize(batch: pa.Table) -> pa.Table:
        seg = np.asarray(batch["seg"], dtype=object)
        uk, inv = np.unique(seg, return_inverse=True)
        n = np.bincount(inv, weights=batch["n"].to_numpy(),
                        minlength=len(uk)).astype(np.int64)
        cents = np.bincount(inv, weights=batch["cents"].to_numpy(),
                            minlength=len(uk)).astype(np.int64)
        return pa.table({
            "c_mktsegment": pa.array(uk, pa.string()),
            "n_customers": n,
            "total_acctbal": cents.astype(np.float64) / 100.0,
        })

    return (mat(routed).groupby("bk").map_groups(anti,
                                                 batch_format="pyarrow")
            .repartition(1)
            .map_batches(finalize, batch_format="pyarrow",
                         batch_size=None))


def global_sales_opportunity_sql(cutoff: str = IDLE_CUTOFF) -> str:
    cents = "CAST(round(c_acctbal * 100.0) AS BIGINT)"
    return f"""
WITH pos AS (
  SELECT CAST(sum({cents}) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS c
  FROM customer WHERE {cents} > 0
)
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(CAST(sum({cents}) AS BIGINT) AS DOUBLE) / 100.0
         AS total_acctbal
FROM customer cu, pos
WHERE {cents} * pos.c > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = cu.c_custkey
                    AND o.o_orderdate >= DATE '{cutoff}')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --------------------------------------------- order-value exact quantiles

OV_QS = (25, 50, 75, 90, 99)  # percent -> p25..p99 columns


def order_value_quantiles(od_ds):
    """-> ONE row (n_orders, p25..p99, max_price): exact global
    quantiles of o_totalprice — the order-value distribution profile.

    The qstats two-phase scheme (see covertile/qstats.py): per-block
    (cents, count) histogram partials, coarse-bucket metadata combine to
    locate each quantile's bucket, then a target-bucket-only second
    pass — the cents domain reaches millions of distinct values over
    billions of orders, so a full-histogram groupby+repartition(1)
    merge would funnel it into one task.  Prices carry 2 decimals so
    the cents domain is integer and the quantiles are exact (DuckDB
    quantile_disc semantics); the final /100.0 double is bitwise."""
    import ray.data as _rd

    from .qstats import histogram_quantiles

    def part(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["o_totalprice"])
        uv, cnt = np.unique(cents, return_counts=True)
        return pa.table({"cents": uv, "c": cnt.astype(np.int64)})

    hist = mat(od_ds.map_batches(part, batch_format="pyarrow"))
    n, qv, mx = histogram_quantiles(hist, OV_QS, value_col="cents")
    cols = {"n_orders": pa.array([n], pa.int64())}
    for q in OV_QS:
        cols[f"p{q}"] = pa.array(
            [qv[q] / 100.0 if qv[q] is not None else None], pa.float64())
    cols["max_price"] = pa.array(
        [mx / 100.0 if mx is not None else None], pa.float64())
    return _rd.from_arrow(pa.table(cols))


def order_value_quantiles_sql() -> str:
    cents = "CAST(round(o_totalprice * 100.0) AS BIGINT)"
    qcols = ",\n       ".join(
        f"CAST(quantile_disc({cents}, {q / 100.0}) AS DOUBLE) / 100.0"
        f" AS p{q}" for q in OV_QS)
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       {qcols},
       CAST(max({cents}) AS DOUBLE) / 100.0 AS max_price
FROM orders
"""


# --------------------------------------------- Q6-shaped revenue forecast

Q6_DATE_LO = "1996-01-01"
Q6_DATE_HI = "1997-01-01"
Q6_DISCOUNT = 6      # percent, +/- 1
Q6_QTY_MAX = 24


def forecast_revenue_change(li_ds, date_lo: str = Q6_DATE_LO,
                            date_hi: str = Q6_DATE_HI,
                            discount_pct: int = Q6_DISCOUNT,
                            qty_max: int = Q6_QTY_MAX):
    """TPC-H-Q6-shaped selective scan-aggregate: the revenue that would
    be recovered by eliminating small discounts — sum(price * discount)
    over a shipdate year, discount within +/-1pct of `discount_pct`,
    quantity < qty_max -> ONE row (revenue; SQL-NULL on empty).

    The simplest possible distributed shape and deliberately kept that
    way: predicates and the cents product run inside the scan's
    map_batches, each block collapses to one int64, and the only
    cross-task traffic is the driver-side scalar sum.  No exchange at
    all — the operator that shows the engine's floor overhead."""
    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)
    dlo = np.int64(discount_pct - 1)
    dhi = np.int64(discount_pct + 1)
    qmax = np.int64(qty_max)

    def part(batch: pa.Table) -> pa.Table:
        ts = batch["l_shipdate"].to_numpy().astype(
            "datetime64[us]").view(np.int64)
        dc = _cents(batch["l_discount"])  # discount pct = cents value
        qty = np.round(batch["l_quantity"].to_numpy()).astype(np.int64)
        m = ((ts >= lo) & (ts < hi) & (dc >= dlo) & (dc <= dhi)
             & (qty < qmax))
        units = _cents(batch["l_extendedprice"])[m] * dc[m]
        return pa.table({"units": pa.array([int(units.sum())], pa.int64()),
                         "n": pa.array([int(m.sum())], pa.int64())})

    agg = li_ds.map_batches(part, batch_format="pyarrow").sum(
        ["units", "n"])
    units = agg["sum(units)"] if agg else 0
    n = agg["sum(n)"] if agg else 0
    import ray
    return ray.data.from_arrow(pa.table({
        "revenue": pa.array([units / 10000.0 if n else None],
                            pa.float64()),
    }))


def forecast_revenue_change_sql(date_lo: str = Q6_DATE_LO,
                                date_hi: str = Q6_DATE_HI,
                                discount_pct: int = Q6_DISCOUNT,
                                qty_max: int = Q6_QTY_MAX) -> str:
    pc_ = "CAST(round(l_extendedprice * 100.0) AS BIGINT)"
    dc = "CAST(round(l_discount * 100.0) AS BIGINT)"
    return f"""
SELECT CAST(sum({pc_} * {dc}) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{date_lo}'
  AND l_shipdate <  TIMESTAMP '{date_hi}'
  AND {dc} BETWEEN {int(discount_pct) - 1} AND {int(discount_pct) + 1}
  AND CAST(round(l_quantity) AS BIGINT) < {int(qty_max)}
"""


# ------------------------------------- Q13-shaped order-count distribution

def customer_order_distribution(cu_ds, od_ds,
                                nbuckets: int = IDLE_BUCKETS):
    """TPC-H-Q13-shaped two-level aggregate: the distribution of
    customers by their order count (including zero-order customers) ->
    (c_count, custdist) sorted by custdist DESC, c_count DESC.

    Shape: orders collapse per block to (custkey, n) partials; ONE
    custkey-hash exchange joins them with the customer keys (the
    left-join's null side = zero-order customers, found per bucket via
    np.isin); per-bucket (order-count, n-customers) histogram partials
    tree-combine in a metadata-sized repartition(1) — the count domain
    is tiny (max orders per customer), the classic histogram-of-counts
    rollup."""
    PHI = np.uint64(0x9E3779B97F4A7C15)

    def bk_of(keys: np.ndarray) -> np.ndarray:
        return ((keys.astype(np.uint64) * PHI) >> np.uint64(40)
                ).astype(np.int64) % np.int64(nbuckets)

    def cust_route(batch: pa.Table) -> pa.Table:
        key = batch["c_custkey"].to_numpy()
        return pa.table({"bk": bk_of(key), "key": key,
                         "n": np.zeros(len(key), np.int64),
                         "side": np.zeros(len(key), np.int8)})

    def ord_route(batch: pa.Table) -> pa.Table:
        key, inv = np.unique(batch["o_custkey"].to_numpy(),
                             return_inverse=True)
        return pa.table({
            "bk": bk_of(key), "key": key,
            "n": np.bincount(inv, minlength=len(key)).astype(np.int64),
            "side": np.ones(len(key), np.int8),
        })

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy()
        key = group["key"].to_numpy()
        n = group["n"].to_numpy()
        cust = side == 0
        ckeys = key[cust]
        okeys = key[~cust]
        on = n[~cust]
        # merge order partials per custkey (several blocks may emit the
        # same custkey), then attach to customers; missing -> 0
        uk, oinv = np.unique(okeys, return_inverse=True)
        tot = np.bincount(oinv, weights=on,
                          minlength=len(uk)).astype(np.int64)
        pos = np.searchsorted(uk, ckeys)
        pos_c = np.clip(pos, 0, max(0, len(uk) - 1))
        hit = (len(uk) > 0) & (uk[pos_c] == ckeys)
        cnt = np.where(hit, tot[pos_c], 0)
        ucnt, cinv = np.unique(cnt, return_inverse=True)
        return pa.table({
            "c_count": ucnt,
            "custdist": np.bincount(
                cinv, minlength=len(ucnt)).astype(np.int64),
        })

    routed = (cu_ds.map_batches(cust_route, batch_format="pyarrow")
              .union(od_ds.map_batches(ord_route, batch_format="pyarrow")))

    def finalize(batch: pa.Table) -> pa.Table:
        cc = batch["c_count"].to_numpy()
        ucc, inv = np.unique(cc, return_inverse=True)
        dist = np.bincount(inv, weights=batch["custdist"].to_numpy(),
                           minlength=len(ucc)).astype(np.int64)
        order = np.lexsort((-ucc, -dist))
        return pa.table({"c_count": ucc[order], "custdist": dist[order]})

    return (mat(routed).groupby("bk").map_groups(per_bucket,
                                                 batch_format="pyarrow")
            .repartition(1)
            .map_batches(finalize, batch_format="pyarrow",
                         batch_size=None))


def customer_order_distribution_sql() -> str:
    return """
WITH oc AS (
  SELECT c_custkey,
         CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM oc GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""
