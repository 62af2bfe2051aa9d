#!/usr/bin/env python
"""Prototype A/B: fused collect_list candidate generation (+guard riding
the same aggregate) vs the shipped self-join + broadcast-probe guard."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from movies_etl_spark.operators import caching, dedup as D
from movies_etl_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def fused_pairs(sh_df, id_col, cap=D.MAX_BAND_BUCKET_ROWS):
    bands = D.with_minhash_bands(sh_df, id_col)
    g = bands.groupBy("band_id", "band_key").agg(
        F.collect_list(id_col).alias("__ids"),
        F.count(F.lit(1)).alias("__bucket_n"),
    )
    ok = F.when(
        F.col("__bucket_n") > F.lit(cap),
        F.raise_error(D._bucket_overflow_message(cap)).cast("boolean"),
    ).otherwise(F.lit(True))
    g = g.filter(ok).filter(F.col("__bucket_n") >= 2)
    pairs = (
        g.select(F.explode("__ids").alias("id_a"), "__ids")
        .select("id_a", F.explode("__ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    return pairs.distinct()


def main() -> None:
    spark = get_spark(app_name="proto_fused")
    from movies_etl_spark.plans.queries_ext import _near_corpus

    corpus = _near_corpus(spark, SF)
    sh_all = caching.tracked_persist(D.shingled(corpus, "text", "doc_id"))
    sh_all.count()

    def run(fn):
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        n = fn(sh_all, "doc_id").count()
        return round(time.perf_counter() - t0, 3), n

    # verify identical pair sets once
    a = fused_pairs(sh_all, "doc_id")
    b = D.candidate_pairs_minhash(sh_all, "doc_id")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print("pair-set diff:", diff, "n:", a.count())
    caching.release_tracked.__call__  # keep caches; timing below interleaved
    for rep in range(4):
        tf, nf = run(fused_pairs)
        tj, nj = run(D.candidate_pairs_minhash)
        print(f"rep{rep}: fused {tf}s ({nf})  joinform {tj}s ({nj})")


if __name__ == "__main__":
    main()
