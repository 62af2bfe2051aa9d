#!/usr/bin/env python
"""Interleaved A/B: streaming_lsh_dedup with the r18 per-batch body
(re-implemented inline verbatim: separate touched broadcast, index
writes last, second store pass for the id_b shingle lookup) vs the r19
shipped body. One session, arm order alternated per rep, monkeypatching
ops.lsh_dedup_batch per arm; control query alongside."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from movies_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_batch(spark, batch_df, batch_id, work_dir, max_bucket_rows=None):
    """The r18 lsh_dedup_batch body, verbatim."""
    from movies_etl_spark.operators import dedup as D
    from movies_etl_spark.streaming.ops import (
        LSH_BAND_SCHEMA,
        LSH_SHINGLE_SCHEMA,
        _lsh_batches_below,
    )

    sh_b = D.shingled(batch_df, "text", "doc_id").cache()
    bands_b = D.with_minhash_bands(sh_b, "doc_id").cache()
    band_dirs = _lsh_batches_below(work_dir, "bands", batch_id)
    if band_dirs:
        index_bands = spark.read.schema(LSH_BAND_SCHEMA).parquet(*band_dirs)
        index_sh = spark.read.schema(LSH_SHINGLE_SCHEMA).parquet(
            *_lsh_batches_below(work_dir, "shingles", batch_id)
        )
    else:
        index_bands = bands_b.limit(0)
        index_sh = sh_b.limit(0)
    touched = bands_b.select("band_id", "band_key")
    all_bands = D.guard_band_buckets(
        index_bands.unionByName(bands_b).join(
            F.broadcast(touched), ["band_id", "band_key"], "left_semi"
        ),
        max_bucket_rows
        if max_bucket_rows is not None
        else D.MAX_BAND_BUCKET_ROWS,
    )
    bnew = bands_b.select(F.col("doc_id").alias("id_b"), "band_id", "band_key")
    aold = all_bands.select(
        F.col("doc_id").alias("id_a"), "band_id", "band_key"
    )
    cand = (
        aold.join(F.broadcast(bnew), ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    sh_all = index_sh.unionByName(sh_b).filter(F.size("shingles") > 0)
    va = sh_all.select(
        F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")
    )
    vb = sh_all.select(
        F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")
    )
    probed_a = F.broadcast(cand).join(va, "id_a")
    dropped = (
        F.broadcast(probed_a)
        .join(vb, "id_b")
        .filter(F.round(D.jaccard(F.col("sh_a"), F.col("sh_b")), 4) >= 0.5)
        .select("id_b")
    )
    survivors = batch_df.select("doc_id").join(
        F.broadcast(dropped),
        batch_df["doc_id"] == dropped["id_b"],
        "left_anti",
    )
    survivors.write.mode("overwrite").parquet(
        f"{work_dir}/out/batch={batch_id}"
    )
    bands_b.write.mode("overwrite").parquet(
        f"{work_dir}/bands/batch={batch_id}"
    )
    sh_b.write.mode("overwrite").parquet(
        f"{work_dir}/shingles/batch={batch_id}"
    )
    sh_b.unpersist()
    bands_b.unpersist()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from movies_etl_spark.plans import queries_ext, registry  # noqa: F401
    from movies_etl_spark.streaming import ops

    spark = get_spark(app_name="ab_lsh_batch")
    registry.QUERIES["groupby_count"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    new_batch = ops.lsh_dedup_batch

    def run(body):
        ops.lsh_dedup_batch = body
        try:
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            df = registry.QUERIES["streaming_lsh_dedup"](spark, SF)
            df.write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3), df.count()
        finally:
            ops.lsh_dedup_batch = new_batch

    out = {"old": [], "new": [], "control": [], "n": set()}
    for rep in range(reps):
        arms = ["old", "new"] if rep % 2 == 0 else ["new", "old"]
        for arm in arms:
            t, n = run(old_batch if arm == "old" else new_batch)
            out[arm].append(t)
            out["n"].add(n)
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        registry.QUERIES["groupby_count"](spark, SF).write.format(
            "noop"
        ).mode("overwrite").save()
        out["control"].append(round(time.perf_counter() - t0, 3))
    out["n"] = sorted(out["n"])  # survivor counts must agree across arms
    print(json.dumps(out))


if __name__ == "__main__":
    main()
