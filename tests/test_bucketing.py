"""Bucketed co-located join: same result as a plain join, with NO
shuffle exchange in the join subtree — the storage-level optimization
that matters most for repeat fact-fact joins at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_etl_pipeline_spark.operators.bucketing import bucketed_join, write_bucketed
from simple_etl_pipeline_spark.schemas import load_table


def test_bucketed_join_no_exchange(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    write_bucketed(li, "li_bucketed", "l_orderkey", num_buckets=8)
    write_bucketed(orders, "orders_bucketed", "o_orderkey", num_buckets=8)

    joined = bucketed_join(spark, "li_bucketed", "orders_bucketed", "l_orderkey", "o_orderkey")
    # disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
