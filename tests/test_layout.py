"""Storage-layout tests: partition pruning and bucketed (shuffle-free)
joins — the two layout disciplines SCALE.md leans on."""

from __future__ import annotations

import re

import __spark_entry__ as entrymod
from pyspark.sql import functions as F


def _plan(df, spark):
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_partition_pruning_in_plan(spark, sf_dir):
    q = entrymod.queries()["partition_pruned_scan"]
    df = q(spark, sf_dir)
    plan = _plan(df, spark)
    assert "PartitionFilters" in plan
    assert re.search(r"PartitionFilters: \[.*order_year.*1997", plan), plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """bucketBy co-location: two tables bucketed+sorted on the join key
    join with zero Exchange nodes — the resident-shuffle eliminator for
    repeated same-key joins (SCALE.md future-work item, proven here)."""
    from movies_etl_spark.sources import readers

    o = readers.load_table(spark, sf_dir, "orders")
    li = readers.load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    a = spark.table("b_orders")
    b = spark.table("b_lineitem")
    joined = a.join(b, a["o_orderkey"] == b["l_orderkey"]).select(
        "o_orderkey", "o_totalprice", "n_items"
    )
    plan = _plan(joined, spark)
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 0, plan
    # sanity: result is right
    n = joined.count()
    assert n == a.join(b, a["o_orderkey"] == b["l_orderkey"]).count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
