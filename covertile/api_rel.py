"""Driver-facing relational/warehouse queries (TPC-H-shaped tables)."""

from __future__ import annotations

import os

from . import relops


def _t(sf_dir: str, name: str, columns):
    from .sources import read_table
    return read_table(sf_dir, name, columns)


def q_revenue_by_nation(sf_dir: str):
    import pyarrow.parquet as pq
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    return relops.revenue_by_nation(
        _t(sf_dir, "lineitem",
           ("l_orderkey", "l_extendedprice", "l_discount")),
        _t(sf_dir, "orders", ("o_orderkey", "o_custkey")),
        _t(sf_dir, "customer", ("c_custkey", "c_nationkey")),
        nation)


def sql_revenue_by_nation() -> str:
    return relops.revenue_by_nation_sql()


def q_pricing_summary(sf_dir: str):
    return relops.pricing_summary(
        _t(sf_dir, "lineitem",
           ("l_quantity", "l_extendedprice", "l_discount",
            "l_returnflag", "l_linestatus")))


def sql_pricing_summary() -> str:
    return relops.pricing_summary_sql()


def q_local_supplier_volume(sf_dir: str):
    import pyarrow.parquet as pq
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    return relops.local_supplier_volume(
        _t(sf_dir, "lineitem",
           ("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")),
        _t(sf_dir, "orders", ("o_orderkey", "o_custkey", "o_orderdate")),
        _t(sf_dir, "customer", ("c_custkey", "c_nationkey")),
        _t(sf_dir, "supplier", ("s_suppkey", "s_nationkey")),
        nation, region)


def sql_local_supplier_volume() -> str:
    return relops.local_supplier_volume_sql()


def q_idle_customers(sf_dir: str):
    return relops.idle_customers(
        _t(sf_dir, "customer", ("c_custkey", "c_mktsegment", "c_acctbal")),
        _t(sf_dir, "orders", ("o_custkey", "o_orderdate")))


def sql_idle_customers() -> str:
    return relops.idle_customers_sql()


def q_shipping_priority(sf_dir: str):
    return relops.shipping_priority(
        _t(sf_dir, "lineitem",
           ("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")),
        _t(sf_dir, "orders",
           ("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")),
        _t(sf_dir, "customer", ("c_custkey", "c_mktsegment")))


def sql_shipping_priority() -> str:
    return relops.shipping_priority_sql()



def q_returned_item_report(sf_dir: str):
    import pyarrow.parquet as pq
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    return relops.returned_item_report(
        _t(sf_dir, "lineitem",
           ("l_orderkey", "l_extendedprice", "l_discount",
            "l_returnflag")),
        _t(sf_dir, "orders", ("o_orderkey", "o_custkey", "o_orderdate")),
        _t(sf_dir, "customer",
           ("c_custkey", "c_name", "c_nationkey", "c_acctbal")),
        nation)


def sql_returned_item_report() -> str:
    return relops.returned_item_report_sql()


def q_promo_revenue_share(sf_dir: str):
    import pyarrow.parquet as pq
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type"])
    return relops.promo_revenue_share(
        _t(sf_dir, "lineitem",
           ("l_partkey", "l_extendedprice", "l_discount", "l_shipdate")),
        part)


def sql_promo_revenue_share() -> str:
    return relops.promo_revenue_share_sql()


def q_order_priority_counts(sf_dir: str):
    return relops.order_priority_counts(
        _t(sf_dir, "lineitem", ("l_orderkey", "l_shipdate")),
        _t(sf_dir, "orders",
           ("o_orderkey", "o_orderdate", "o_orderpriority")))


def sql_order_priority_counts() -> str:
    return relops.order_priority_counts_sql()


def q_large_order_customers(sf_dir: str):
    return relops.large_order_customers(
        _t(sf_dir, "lineitem", ("l_orderkey", "l_quantity")),
        _t(sf_dir, "orders",
           ("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")),
        _t(sf_dir, "customer", ("c_custkey", "c_name")))


def sql_large_order_customers() -> str:
    return relops.large_order_customers_sql()


def q_nation_trade_volume(sf_dir: str):
    import pyarrow.parquet as pq
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    return relops.nation_trade_volume(
        _t(sf_dir, "lineitem",
           ("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
            "l_shipdate")),
        _t(sf_dir, "orders", ("o_orderkey", "o_custkey")),
        _t(sf_dir, "customer", ("c_custkey", "c_nationkey")),
        _t(sf_dir, "supplier", ("s_suppkey", "s_nationkey")),
        nation)


def sql_nation_trade_volume() -> str:
    return relops.nation_trade_volume_sql()


def q_market_share(sf_dir: str):
    import pyarrow.parquet as pq
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    return relops.market_share(
        _t(sf_dir, "lineitem",
           ("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")),
        _t(sf_dir, "orders", ("o_orderkey", "o_custkey", "o_orderdate")),
        _t(sf_dir, "customer", ("c_custkey", "c_nationkey")),
        _t(sf_dir, "supplier", ("s_suppkey", "s_nationkey")),
        nation, region)


def sql_market_share() -> str:
    return relops.market_share_sql()


def q_top_supplier(sf_dir: str):
    return relops.top_supplier(
        _t(sf_dir, "lineitem",
           ("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")),
        _t(sf_dir, "supplier", ("s_suppkey", "s_name")))


def sql_top_supplier() -> str:
    return relops.top_supplier_sql()


def q_small_qty_revenue(sf_dir: str):
    return relops.small_qty_revenue(
        _t(sf_dir, "lineitem",
           ("l_partkey", "l_quantity", "l_extendedprice")),
        _t(sf_dir, "part", ("p_partkey", "p_brand")))


def sql_small_qty_revenue() -> str:
    return relops.small_qty_revenue_sql()


def q_brand_bucket_revenue(sf_dir: str):
    return relops.brand_bucket_revenue(
        _t(sf_dir, "lineitem",
           ("l_partkey", "l_quantity", "l_extendedprice", "l_discount")),
        _t(sf_dir, "part", ("p_partkey", "p_brand", "p_size")))


def sql_brand_bucket_revenue() -> str:
    return relops.brand_bucket_revenue_sql()


def q_global_sales_opportunity(sf_dir: str):
    return relops.global_sales_opportunity(
        _t(sf_dir, "customer", ("c_custkey", "c_mktsegment", "c_acctbal")),
        _t(sf_dir, "orders", ("o_custkey", "o_orderdate")))


def sql_global_sales_opportunity() -> str:
    return relops.global_sales_opportunity_sql()


def q_order_value_quantiles(sf_dir: str):
    return relops.order_value_quantiles(
        _t(sf_dir, "orders", ("o_totalprice",)))


def sql_order_value_quantiles() -> str:
    return relops.order_value_quantiles_sql()


def q_forecast_revenue_change(sf_dir: str):
    return relops.forecast_revenue_change(
        _t(sf_dir, "lineitem",
           ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")))


def sql_forecast_revenue_change() -> str:
    return relops.forecast_revenue_change_sql()


def q_customer_order_distribution(sf_dir: str):
    return relops.customer_order_distribution(
        _t(sf_dir, "customer", ("c_custkey",)),
        _t(sf_dir, "orders", ("o_custkey",)))


def sql_customer_order_distribution() -> str:
    return relops.customer_order_distribution_sql()


QUERIES = {
    "revenue_by_nation": q_revenue_by_nation,
    "pricing_summary": q_pricing_summary,
    "local_supplier_volume": q_local_supplier_volume,
    "idle_customers": q_idle_customers,
    "shipping_priority": q_shipping_priority,
    "returned_item_report": q_returned_item_report,
    "promo_revenue_share": q_promo_revenue_share,
    "order_priority_counts": q_order_priority_counts,
    "large_order_customers": q_large_order_customers,
    "nation_trade_volume": q_nation_trade_volume,
    "market_share": q_market_share,
    "top_supplier": q_top_supplier,
    "small_qty_revenue": q_small_qty_revenue,
    "brand_bucket_revenue": q_brand_bucket_revenue,
    "global_sales_opportunity": q_global_sales_opportunity,
    "order_value_quantiles": q_order_value_quantiles,
    "forecast_revenue_change": q_forecast_revenue_change,
    "customer_order_distribution": q_customer_order_distribution,
}

ORACLES = {
    "revenue_by_nation": sql_revenue_by_nation,
    "pricing_summary": sql_pricing_summary,
    "local_supplier_volume": sql_local_supplier_volume,
    "idle_customers": sql_idle_customers,
    "shipping_priority": sql_shipping_priority,
    "returned_item_report": sql_returned_item_report,
    "promo_revenue_share": sql_promo_revenue_share,
    "order_priority_counts": sql_order_priority_counts,
    "large_order_customers": sql_large_order_customers,
    "nation_trade_volume": sql_nation_trade_volume,
    "market_share": sql_market_share,
    "top_supplier": sql_top_supplier,
    "small_qty_revenue": sql_small_qty_revenue,
    "brand_bucket_revenue": sql_brand_bucket_revenue,
    "global_sales_opportunity": sql_global_sales_opportunity,
    "order_value_quantiles": sql_order_value_quantiles,
    "forecast_revenue_change": sql_forecast_revenue_change,
    "customer_order_distribution": sql_customer_order_distribution,
}
