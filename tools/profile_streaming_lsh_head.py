#!/usr/bin/env python
"""Post-extraction re-profile of streaming_lsh_dedup at HEAD (VERDICT
r14 #7): confirm the stream-commit floor adjudicated pre-extraction
(r12/r13) still holds for the r14 shape, where the foreachBatch body is
the module-level ops.lsh_dedup_batch.

Unlike tools/profile_streaming_lsh.py (ARCHIVAL — an r9-shape clone),
this instruments the SHIPPED code path by wrapping ops.lsh_dedup_batch
in a timing shim and running the registered query unchanged, so the
decomposition cannot drift from HEAD:

  pre_first_batch  — chunk scaffold (one ntile+partitionBy write) +
                     stream startup up to the first batch invocation
  batch_bodies     — Σ wall inside the 4 lsh_dedup_batch calls (the
                     exact per-batch plan tools/scale_lsh_store.py
                     measures against pre-built stores)
  commit_gaps      — Σ gaps between one batch returning and the next
                     starting (micro-batch commit/checkpoint/file-
                     source planning — the structural streaming floor)
  post_last_batch  — final commit + survivor-sink read-back + count

Run: python tools/profile_streaming_lsh_head.py  (SPARK_GRAFT_SF_DIR
to override; defaults to sf0.1 like bench.py). 2 reps, best-rep
decomposition reported (min total).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movies_etl_spark.session import get_spark  # noqa: E402
from movies_etl_spark.streaming import ops  # noqa: E402
from movies_etl_spark.plans import registry  # noqa: E402
import __spark_entry__  # noqa: E402,F401

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="profile_streaming_lsh_head")
    registry.QUERIES["groupby_count"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()

    real_batch = ops.lsh_dedup_batch
    marks: list[tuple[float, float]] = []

    def shim(spark_, batch_df, batch_id, work_dir, max_bucket_rows=None):
        t0 = time.perf_counter()
        out = real_batch(spark_, batch_df, batch_id, work_dir, max_bucket_rows)
        marks.append((t0, time.perf_counter()))
        return out

    best = None
    for _ in range(2):
        marks.clear()
        ops.lsh_dedup_batch = shim
        try:
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            registry.QUERIES["streaming_lsh_dedup"](spark, SF).write.format(
                "noop"
            ).mode("overwrite").save()
            total = time.perf_counter() - t0
        finally:
            ops.lsh_dedup_batch = real_batch
        starts = [a for a, _ in marks]
        ends = [b for _, b in marks]
        pre = starts[0] - t0
        bodies = sum(b - a for a, b in marks)
        gaps = sum(s - e for e, s in zip(ends, starts[1:]))
        post = (t0 + total) - ends[-1]
        rep = {
            "total_sec": round(total, 3),
            "n_batches": len(marks),
            "pre_first_batch_sec": round(pre, 3),
            "batch_bodies_sec": round(bodies, 3),
            "commit_gaps_sec": round(gaps, 3),
            "post_last_batch_sec": round(post, 3),
        }
        print(json.dumps(rep), flush=True)
        if best is None or rep["total_sec"] < best["total_sec"]:
            best = rep
    floor = round(
        best["commit_gaps_sec"] + best["post_last_batch_sec"], 3
    )
    print(
        json.dumps({"best_rep": best, "stream_floor_sec": floor}),
        flush=True,
    )


if __name__ == "__main__":
    main()
