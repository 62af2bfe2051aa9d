#!/usr/bin/env python
"""Interleaved A/B: hll_distinct_shards exact side — r18 shared lazy
distinct-pair shape (re-implemented inline, verbatim) vs the r19
rollup(shard) single-pass shape (the shipped registry query). One
session, arm order alternated per rep, control query alongside."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from movies_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_shape(spark, sf_dir):
    """The r18 form: partials + shared lazy distinct (shard, partkey)."""
    from movies_etl_spark.operators import caching
    from movies_etl_spark.operators import sketch as SK
    from movies_etl_spark.sources import readers

    li = readers.load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 8).alias("shard"), "l_partkey"
    )
    parts = caching.tracked_persist(SK.hll_partials(li, "l_partkey", "shard"))
    per_shard = SK.hll_estimate(parts, ["shard"])
    merged_est = SK.hll_estimate(SK.hll_merge(parts))
    pairs = li.select("shard", "l_partkey").distinct()
    exact_shard = pairs.groupBy("shard").agg(
        F.count("l_partkey").alias("exact_distinct")
    )
    exact_all = (
        pairs.select("l_partkey")
        .distinct()
        .agg(F.count("l_partkey").alias("exact_distinct"))
    )
    shard_rows = per_shard.join(exact_shard, "shard").select(
        F.col("shard").cast("string").alias("scope"),
        "est_distinct",
        "exact_distinct",
    )
    merged_row = merged_est.crossJoin(exact_all).select(
        F.lit("merged").alias("scope"), "est_distinct", "exact_distinct"
    )
    return shard_rows.unionAll(merged_row)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from movies_etl_spark.operators import caching
    from movies_etl_spark.plans import queries_scale, registry  # noqa: F401

    spark = get_spark(app_name="ab_hll_rollup")
    registry.QUERIES["groupby_count"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(fn):
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        caching.release_tracked()
        return dt

    new_fn = registry.QUERIES["hll_distinct_shards"].__wrapped__ if hasattr(
        registry.QUERIES["hll_distinct_shards"], "__wrapped__"
    ) else registry.QUERIES["hll_distinct_shards"]
    out = {"old": [], "new": [], "control": []}
    for rep in range(reps):
        arms = ["old", "new"] if rep % 2 == 0 else ["new", "old"]
        for arm in arms:
            out[arm].append(run(old_shape if arm == "old" else new_fn))
        out["control"].append(run(lambda s, d: registry.QUERIES["groupby_count"](s, d)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
