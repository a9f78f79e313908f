"""Relational/warehouse pipelines vs oracle (TPC-H-shaped tables)."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "nation", "supplier",
              "region", "part"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", ["revenue_by_nation", "pricing_summary",
                                  "local_supplier_volume"])
def test_rel_query_matches_oracle(ray_session, con, name):
    from covertile import api_rel
    got = api_rel.QUERIES[name](SF).to_pandas().reset_index(drop=True)
    want = con.execute(api_rel.ORACLES[name]()).df()
    assert len(got) == len(want), (len(got), len(want))
    assert list(got.columns) == list(want.columns)
    for c_ in got.columns:
        a, b = got[c_].to_numpy(), want[c_].to_numpy()
        if a.dtype.kind == "f":
            assert np.array_equal(a.view(np.int64), b.view(np.int64)), c_
        else:
            assert np.array_equal(a, b), c_


def test_idle_customers_matches_oracle(ray_session, con):
    """Anti-join rollup: customers with no orders, per segment."""
    from covertile import api_rel
    got = (api_rel.QUERIES["idle_customers"](SF)
           .to_pandas().reset_index(drop=True))
    want = con.execute(api_rel.ORACLES["idle_customers"]()).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        assert str(a.dtype) == str(b.dtype), c
        if a.dtype.kind == "f":
            assert np.array_equal(a.view(np.int64), b.view(np.int64)), c
        else:
            assert np.array_equal(a, b), c
    assert got["n_customers"].sum() > 0  # the sf tables do have idle customers


def test_shipping_priority_matches_oracle(ray_session, con):
    """Q3-shaped top-k: filters below joins, per-block top-k partials."""
    from covertile import api_rel
    got = (api_rel.QUERIES["shipping_priority"](SF)
           .to_pandas().reset_index(drop=True))
    want = con.execute(api_rel.ORACLES["shipping_priority"]()).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        assert str(a.dtype) == str(b.dtype), c
        if a.dtype.kind == "f":
            assert np.array_equal(a.view(np.int64), b.view(np.int64)), c
        else:
            assert np.array_equal(a, b), c
    # descending revenue with deterministic tie-break
    r = got["revenue"].to_numpy()
    assert (r[:-1] >= r[1:]).all()


def test_hash_join_right_subset_columns_empty_bucket(ray_session):
    """Regression: when the right side's columns are a subset of the
    left's, a bucket holding only left rows used to crash (side
    detection by column presence saw both sides as present and indexed
    an empty array)."""
    import pyarrow as pa
    import ray.data as rd
    from covertile.joins import hash_join_int_key

    left = pa.table({"k": pa.array([1, 2, 33], pa.int64()),
                     "v": pa.array([10, 20, 30], pa.int64())})
    right = pa.table({"k": pa.array([2], pa.int64())})  # cols ⊂ left cols
    out = hash_join_int_key(rd.from_arrow(left), rd.from_arrow(right),
                            key="k", num_buckets=4).to_pandas()
    assert out["k"].tolist() == [2] and out["v"].tolist() == [20]
    out_l = (hash_join_int_key(rd.from_arrow(left), rd.from_arrow(right),
                               key="k", num_buckets=4, how="left")
             .to_pandas().sort_values("k"))
    assert len(out_l) == 3


def test_hash_join_stale_declared_schema_fails_loudly(ray_session):
    """ADVICE r04: a caller-declared schema that does not match the real
    blocks must fail deterministically on the first non-empty bucket,
    not only when a bucket happens to be empty."""
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from covertile.joins import hash_join_int_key

    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "v": pa.array(["a", "b"], pa.string())})
    right = pa.table({"k": pa.array([1, 2], pa.int64()),
                      "w": pa.array([7, 8], pa.int64())})
    stale = pa.schema([("k", pa.int64()), ("v", pa.int32())])  # v drifted
    out = hash_join_int_key(rd.from_arrow(left), rd.from_arrow(right),
                            key="k", num_buckets=2, left_schema=stale)
    with pytest.raises(Exception, match="declared left type"):
        out.materialize()
    # correct declarations still pass (and keep the plan lazy)
    ok = hash_join_int_key(
        rd.from_arrow(left), rd.from_arrow(right), key="k", num_buckets=2,
        left_schema=left.schema, right_schema=right.schema)
    assert len(ok.to_pandas()) == 2


@pytest.mark.parametrize("name", ["returned_item_report",
                                  "promo_revenue_share",
                                  "order_priority_counts",
                                  "large_order_customers",
                                  "nation_trade_volume",
                                  "market_share",
                                  "top_supplier",
                                  "brand_bucket_revenue",
                                  "small_qty_revenue",
                                  "global_sales_opportunity",
                                  "order_value_quantiles",
                                  "forecast_revenue_change",
                                  "customer_order_distribution"])
def test_new_rel_query_matches_oracle(ray_session, con, name):
    from covertile import api_rel
    got = api_rel.QUERIES[name](SF).to_pandas().reset_index(drop=True)
    want = con.execute(api_rel.ORACLES[name]()).df()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        assert str(a.dtype) == str(b.dtype), (c, a.dtype, b.dtype)
        if a.dtype.kind == "f":
            assert np.array_equal(a.view(np.int64), b.view(np.int64)), c
        else:
            assert np.array_equal(a, b), c


def test_order_priority_counts_empty_bucket(ray_session):
    """A hash bucket holding orders but no lineitems (or vice versa)
    must resolve to zero matches, not an index error."""
    import pyarrow as pa
    import ray.data as rd
    from covertile import relops

    li = pa.table({
        "l_orderkey": pa.array([1], pa.int64()),
        "l_shipdate": pa.array([np.datetime64("1995-06-01", "us")]),
    })
    od = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        "o_orderdate": pa.array(
            [np.datetime64("1995-01-01", "us")] * 8),
        "o_orderpriority": pa.array(["1-URGENT"] * 8, pa.string()),
    })
    got = relops.order_priority_counts(
        rd.from_arrow(li), rd.from_arrow(od)).to_pandas()
    assert got["n_orders"].sum() == 1  # only order 1 has a late lineitem


def test_small_qty_revenue_empty_brand_is_null(ray_session):
    """A brand with no qualifying lineitems must yield SQL-NULL (the
    oracle's empty-sum), not 0 or NaN-from-zero-division."""
    import pandas as pd
    from covertile import relops
    from covertile.sources import read_table
    got = relops.small_qty_revenue(
        read_table(SF, "lineitem",
                   ("l_partkey", "l_quantity", "l_extendedprice")),
        read_table(SF, "part", ("p_partkey", "p_brand")),
        brand="Brand#NO_SUCH").to_pandas()
    assert len(got) == 1
    assert pd.isna(got["avg_yearly"].iloc[0])


def test_top_supplier_keeps_all_max_ties(ray_session):
    """Two suppliers tied at the max revenue must BOTH be returned
    (Q15 spec semantics), in suppkey order."""
    import pyarrow as pa
    import ray.data as rd
    from covertile import relops
    li = pa.table({
        "l_suppkey": pa.array([1, 2, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([100.0, 60.0, 40.0, 10.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        "l_shipdate": pa.array(
            [np.datetime64("1996-02-01", "us")] * 4),
    })
    su = pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["a", "b", "c"], pa.string()),
    })
    out = relops.top_supplier(rd.from_arrow(li).repartition(3),
                              rd.from_arrow(su)).to_pandas()
    assert list(out["s_suppkey"]) == [1, 2]
    assert list(out["total_revenue"]) == [100.0, 100.0]


def test_global_sales_opportunity_nonvacuous(ray_session, con):
    """The Q22 shape must produce rows at sf0.001 (rich idle customers
    exist) — guards against a silently-empty fixture making the oracle
    compare vacuous."""
    from covertile import api_rel
    got = (api_rel.QUERIES["global_sales_opportunity"](SF)
           .to_pandas().reset_index(drop=True))
    assert got["n_customers"].sum() > 0


def test_top_supplier_empty_window_keeps_schema(ray_session):
    """A shipdate window with no lineitems must return 0 rows WITH the
    (s_suppkey, s_name, total_revenue) schema — Ray drops the schema of
    an empty Dataset through to_pandas(), so the empty case returns a
    typed pyarrow.Table (allowed by the driver contract)."""
    import pyarrow as pa
    import ray.data as rd
    from covertile import relops
    li = pa.table({
        "l_suppkey": pa.array([1], pa.int64()),
        "l_extendedprice": pa.array([10.0]),
        "l_discount": pa.array([0.0]),
        "l_shipdate": pa.array([np.datetime64("1990-01-01", "us")]),
    })
    su = pa.table({"s_suppkey": pa.array([1], pa.int64()),
                   "s_name": pa.array(["a"], pa.string())})
    out = relops.top_supplier(rd.from_arrow(li), rd.from_arrow(su))
    assert isinstance(out, pa.Table)
    df = out.to_pandas()
    assert len(df) == 0
    assert df.columns.tolist() == ["s_suppkey", "s_name", "total_revenue"]
