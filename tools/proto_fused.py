#!/usr/bin/env python
"""Frozen three-arm A/B for the LSH candidate-generation shape — the
de-opt canary VERDICT r8 #6 asked for (the r8 version of this tool lost
its baseline when the join form was deleted from dedup.py).

Arms (the first two are FROZEN copies of retired shapes, kept here so
the comparison stays meaningful even as dedup.py evolves):
  joinform   — the r7 shape: persisted band table + broadcast-probe
               guard + band self-join (three consumers of the persist,
               two extra exchanges).
  fused_hash — the r8 shape: one collect_list+count aggregate, guard
               riding the count. Fast, but the aggregate buffers a
               mega-bucket's FULL id list before the guard filter
               evaluates (ADVICE r8 medium: OOM instead of raise_error
               on the exact input the guard exists for).
  shipped    — dedup.candidate_pairs_minhash at HEAD (r9: row_number
               cap BEFORE the aggregate; the window's spillable row
               buffer is the only structure that sees the full bucket).

Pair sets must be identical across all three; the timing loop is
interleaved with per-rep GC like bench.py.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from movies_etl_spark.operators import caching, dedup as D
from movies_etl_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def joinform_pairs(sh_df, id_col, cap=D.MAX_BAND_BUCKET_ROWS):
    """FROZEN r7 shape (dedup.py @ e580622): persisted band table,
    broadcast hot-bucket guard, band self-join."""
    ex = D.guard_band_buckets_broadcast(
        caching.tracked_persist(D.with_minhash_bands(sh_df, id_col)), cap
    )
    a = ex.select(F.col(id_col).alias("id_a"), "band_id", "band_key")
    b = ex.select(F.col(id_col).alias("id_b"), "band_id", "band_key")
    pairs = a.join(b, ["band_id", "band_key"]).filter(
        F.col("id_a") < F.col("id_b")
    )
    return pairs.select("id_a", "id_b").distinct()


def fused_hash_pairs(sh_df, id_col, cap=D.MAX_BAND_BUCKET_ROWS):
    """FROZEN r8 shape: aggregate-first collect_list+count, guard after."""
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


ARMS = [
    ("joinform", joinform_pairs),
    ("fused_hash", fused_hash_pairs),
    ("shipped", D.candidate_pairs_minhash),
]


def main() -> None:
    spark = get_spark(app_name="proto_fused")
    from movies_etl_spark.plans.queries_ext import _near_corpus

    corpus = _near_corpus(spark, SF)
    sh_all = caching.tracked_persist(D.shingled(corpus, "text", "doc_id"))
    sh_all.count()

    # pair-set identity across all three arms (exceptAll both ways).
    # A nonzero diff is a FAILURE, not a log line: the canary exists to
    # fail loudly when a retired arm and the shipped shape diverge
    # (ADVICE r9 — printing-and-exit-0 needed a human to notice).
    frames = {name: fn(sh_all, "doc_id") for name, fn in ARMS}
    base = frames["shipped"]
    diverged: list[str] = []
    for name, df in frames.items():
        if name == "shipped":
            continue
        diff = df.exceptAll(base).count() + base.exceptAll(df).count()
        print(f"pair-set diff shipped vs {name}: {diff}")
        if diff:
            diverged.append(f"{name} (diff {diff})")
    print("n pairs:", base.count())
    if diverged:
        raise SystemExit(
            "CANARY FAILED: pair sets diverged from shipped: "
            + ", ".join(diverged)
        )

    def run(fn):
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        n = fn(sh_all, "doc_id").count()
        return round(time.perf_counter() - t0, 3), n

    for rep in range(4):
        line = []
        for name, fn in ARMS:
            t, _ = run(fn)
            line.append(f"{name} {t}s")
        print(f"rep{rep}: " + "  ".join(line))
        caching.release_tracked()
        sh_all = caching.tracked_persist(
            D.shingled(_near_corpus(spark, SF), "text", "doc_id")
        )
        sh_all.count()


if __name__ == "__main__":
    main()
