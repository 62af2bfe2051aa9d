#!/usr/bin/env python
"""Per-stage job attribution for curation_pipeline's build side (r13).

VERDICT r12 #1: curation_pipeline reads build-frac 0.98 (12.7 s build /
28 jobs / 0.3 s exec at round close) — the same recoverable class
llm_corpus_pipeline was before r12. The pre-identified spenders are the
connected-components convergence actions and the stage persists. This
instrument wraps dedup.connected_components (marking the edge
materialization and each label-propagation round's convergence action)
plus the caching boundaries, and prints the job count each stage
contributes — the same discipline as tools/profile_llm_corpus.py.

Usage: python tools/profile_curation.py [query_name] [sf_dir]
  query_name defaults to curation_pipeline; any connected_components
  consumer works (dedup_cluster_components, dedup_survivors).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movies_etl_spark.session import get_spark  # noqa: E402
from movies_etl_spark.operators import caching, dedup  # noqa: E402
from movies_etl_spark.plans import registry  # noqa: E402
import __spark_entry__  # noqa: E402,F401

QUERY = sys.argv[1] if len(sys.argv) > 1 else "curation_pipeline"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def main() -> None:
    spark = get_spark()

    def max_job_id() -> int:
        jobs = spark.sparkContext._jsc.sc().statusStore().jobsList(None)
        n = jobs.size()
        if n == 0:
            return -1
        return max(jobs.apply(0).jobId(), jobs.apply(n - 1).jobId())

    marks: list[tuple[str, int, float]] = []
    t_start = [time.perf_counter()]
    last = [max_job_id()]

    def mark(label: str) -> None:
        now_id, now_t = max_job_id(), time.perf_counter()
        marks.append((label, now_id - last[0], now_t - t_start[0]))
        last[0] = now_id
        t_start[0] = now_t

    orig_cc = dedup.connected_components

    def cc(edges, *args, **kwargs):
        mark("(before connected_components)")
        out = orig_cc(edges, *args, **kwargs)
        mode = getattr(dedup, "LAST_CC_MODE", "?")
        mark(
            f"connected_components ({mode},"
            f" rounds={dedup.LAST_CC_ROUNDS})"
        )
        return out

    orig_ckpt = caching.tracked_local_checkpoint
    n_ckpt = [0]

    def ckpt(df, eager=True):
        mark(f"(before checkpoint #{n_ckpt[0]})")
        out = orig_ckpt(df, eager=eager)
        n_ckpt[0] += 1
        mark(f"localCheckpoint #{n_ckpt[0]}")
        return out

    dedup.connected_components = cc
    caching.tracked_local_checkpoint = ckpt
    try:
        fn = registry.QUERIES[QUERY]
        t0 = time.perf_counter()
        j0 = max_job_id()
        df = fn(spark, SF_DIR)
        mark("(builder tail)")
        build_jobs, build_sec = max_job_id() - j0, time.perf_counter() - t0
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        exec_sec = time.perf_counter() - t1
        exec_jobs = max_job_id() - j0 - build_jobs
    finally:
        dedup.connected_components = orig_cc
        caching.tracked_local_checkpoint = orig_ckpt

    print(f"\n== stage attribution ({QUERY}, sf_dir={SF_DIR}) ==")
    for label, jobs, sec in marks:
        print(f"{label:48s} {jobs:4d} jobs  {sec:7.3f} s")
    print(
        f"\nTOTAL build {build_jobs} jobs / {build_sec:.2f} s"
        f"   exec {exec_jobs} jobs / {exec_sec:.2f} s"
    )


if __name__ == "__main__":
    main()
