#!/usr/bin/env python
"""ARCHIVAL — r9-shape evidence, NOT a clone of HEAD.

This instruments the PRE-r10 shape of streaming/ops.lsh_dedup_stream;
its numbers are the profiling evidence behind NOTES_r10.md §1 (the
five-sort scaffold finding) and are kept reproducible as measured.
The shipped code has since moved (one-pass ntile/partitionBy scaffold,
explicit batch-side broadcasts), so DO NOT use this tool to re-measure
HEAD — re-instrument from streaming/ops.py first if a new per-stage
breakdown is needed.

Per-stage profiling for streaming_lsh_dedup (VERDICT r9 next-round
#2: the suite's slowest query at 10.5 s). An instrumented clone of
the r9 streaming/ops.lsh_dedup_stream that walls each stage:

  scaffold  — corpus count + the 4 id-ranged chunk writes (TEST
              SCAFFOLDING: builds the ordered landing zone; a real
              deployment has a landing zone already)
  per batch — shingle+band cache fill, index read, guard+candidate
              join, Jaccard verify, the three per-batch writes
  stream    — total foreachBatch wall (includes commit/checkpoint
              overhead between batches)

Run: python tools/profile_streaming_lsh.py  (SPARK_GRAFT_SF_DIR to
override; defaults to sf0.1 like bench.py)."""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from movies_etl_spark.operators import dedup as D
from movies_etl_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/profile_streaming_lsh"


def main() -> None:
    spark = get_spark(app_name="profile_streaming_lsh")
    from movies_etl_spark.plans.queries_ext import _near_corpus

    shutil.rmtree(WORK, ignore_errors=True)
    work_dir = WORK
    corpus = _near_corpus(spark, SF)
    n_chunks = 4

    walls: dict[str, float] = {}

    def wall(key: str, t0: float) -> None:
        walls[key] = walls.get(key, 0.0) + (time.perf_counter() - t0)

    # ---- scaffold (chunk writing), timed the way ops.py does it ----
    from pyspark.sql import Window

    t_all = time.perf_counter()
    src = f"{work_dir}/src"
    os.makedirs(src, exist_ok=True)
    t0 = time.perf_counter()
    n = corpus.count()
    wall("scaffold_count", t0)
    per = -(-n // n_chunks)
    w = Window.orderBy("doc_id")
    chunked = corpus.withColumn("__rn__", F.row_number().over(w) - 1)
    t0 = time.perf_counter()
    for c in range(n_chunks):
        tmp = f"{work_dir}/chunk_tmp"
        (
            chunked.filter(
                (F.col("__rn__") >= c * per) & (F.col("__rn__") < (c + 1) * per)
            )
            .select("doc_id", "text")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = f"{src}/chunk-{c:04d}.parquet"
        os.replace(f"{tmp}/{part}", dst)
        mt = time.time() - (n_chunks - c) * 10
        os.utime(dst, (mt, mt))
    wall("scaffold_chunks", t0)

    def _batches_below(kind: str, batch_id: int) -> list[str]:
        try:
            ids = [
                int(d.split("=", 1)[1])
                for d in os.listdir(f"{work_dir}/{kind}")
                if d.startswith("batch=")
            ]
        except FileNotFoundError:
            return []
        return [
            f"{work_dir}/{kind}/batch={i}" for i in sorted(ids) if i < batch_id
        ]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.perf_counter()
        sh_b = D.shingled(batch_df, "text", "doc_id").cache()
        bands_b = D.with_minhash_bands(sh_b, "doc_id").cache()
        bands_b.count()  # materialize both caches for attribution
        wall("b_shingle_band_fill", t0)
        t0 = time.perf_counter()
        band_dirs = _batches_below("bands", batch_id)
        if band_dirs:
            index_bands = spark.read.parquet(*band_dirs)
            index_sh = spark.read.parquet(*_batches_below("shingles", batch_id))
        else:
            index_bands = bands_b.limit(0)
            index_sh = sh_b.limit(0)
        touched = bands_b.select("band_id", "band_key").distinct()
        all_bands = D.guard_band_buckets(
            index_bands.unionByName(bands_b).join(
                touched, ["band_id", "band_key"], "left_semi"
            ),
            D.MAX_BAND_BUCKET_ROWS,
        )
        bnew = bands_b.select(F.col("doc_id").alias("id_b"), "band_id", "band_key")
        aold = all_bands.select(F.col("doc_id").alias("id_a"), "band_id", "band_key")
        cand = (
            aold.join(bnew, ["band_id", "band_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        ).cache()
        n_cand = cand.count()
        wall("b_guard_candidates", t0)
        t0 = time.perf_counter()
        sh_all = index_sh.unionByName(sh_b).filter(F.size("shingles") > 0)
        va = sh_all.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
        vb = sh_all.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
        dropped = (
            cand.join(va, "id_a")
            .join(vb, "id_b")
            .filter(F.round(D.jaccard(F.col("sh_a"), F.col("sh_b")), 4) >= 0.5)
            .select("id_b")
            .distinct()
        )
        survivors = batch_df.select("doc_id").join(
            dropped, batch_df["doc_id"] == dropped["id_b"], "left_anti"
        )
        survivors.write.mode("overwrite").parquet(f"{work_dir}/out/batch={batch_id}")
        wall("b_verify_write_out", t0)
        t0 = time.perf_counter()
        bands_b.write.mode("overwrite").parquet(f"{work_dir}/bands/batch={batch_id}")
        sh_b.write.mode("overwrite").parquet(f"{work_dir}/shingles/batch={batch_id}")
        sh_b.unpersist()
        bands_b.unpersist()
        cand.unpersist()
        wall("b_state_writes", t0)
        print(f"  batch {batch_id}: candidates={n_cand}")

    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(src)
    )
    t0 = time.perf_counter()
    q = (
        stream.writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{work_dir}/_ckpt")
        .start()
    )
    q.awaitTermination()
    wall("stream_total", t0)
    t0 = time.perf_counter()
    n_out = spark.read.parquet(f"{work_dir}/out/batch=*").count()
    wall("readback", t0)
    walls["TOTAL"] = time.perf_counter() - t_all

    batch_sum = sum(v for k, v in walls.items() if k.startswith("b_"))
    walls["stream_overhead_nonbatch"] = walls["stream_total"] - batch_sum
    print(f"\nsurvivors={n_out}  corpus={n}")
    for k, v in sorted(walls.items(), key=lambda kv: -kv[1]):
        print(f"{k:28s} {v:7.2f} s")


if __name__ == "__main__":
    main()
