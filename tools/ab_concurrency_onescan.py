#!/usr/bin/env python
"""A/B adjudication for the r15 one-scan sweep-line endpoints (the
VERDICT r14 #5 named candidate from the r14 scan-audit board):
concurrency_sweep's ±1 endpoint union reads the events fact table
twice and both two-phase prefix-sum consumers re-derive it (4 runtime
scans); the explode form emits both (t, delta) endpoints from one scan
(2 runtime scans).

Protocol (same as ab_funnel_onepass.py): (1) assert the two variants
return IDENTICAL frames (full collect — the query is oracle-gated, so
value drift would also fail CORRECTNESS, but the A/B must not depend on
the driver to find out); (2) interleaved warm timings, rep-major so
ambient drift is shared, with Spark job counts via the status tracker.

Usage: python tools/ab_concurrency_onescan.py [--reps N] [--sf DIR]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

import _cli  # noqa: E402
from movies_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    vals, _ = _cli.parse_args(
        sys.argv[1:],
        {"--reps": int, "--sf": str},
        "usage: ab_concurrency_onescan.py [--reps N] [--sf DIR]",
    )
    reps = vals.get("reps", 5)
    sf = vals.get("sf", "/root/testdata/sf0.1")

    from movies_etl_spark.plans import queries_analytics as QA
    from movies_etl_spark.plans import registry

    spark = get_spark(app_name="ab_concurrency_onescan")
    registry.QUERIES["groupby_count"](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(onescan: bool) -> float:
        QA.CONCURRENCY_ONE_SCAN = onescan
        fn = registry.QUERIES["concurrency_sweep"]
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def rows(onescan: bool):
        QA.CONCURRENCY_ONE_SCAN = onescan
        fn = registry.QUERIES["concurrency_sweep"]
        return sorted(tuple(r) for r in fn(spark, sf).collect())

    # ---- value identity first ----
    base_rows = rows(False)
    onescan_rows = rows(True)
    assert base_rows == onescan_rows, (
        "variant mismatch: union=" + str(base_rows[:5])
        + " explode=" + str(onescan_rows[:5])
    )
    print(f"values identical: {len(base_rows)} rows", file=sys.stderr)

    out: dict[str, list] = {"union": [], "onescan": []}
    jobs: dict[str, list] = {"union": [], "onescan": []}
    for _ in range(reps):
        for key, flag in (("union", False), ("onescan", True)):
            n0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
            out[key].append(run(flag))
            n1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
            jobs[key].append(n1 - n0)
    med = {k: sorted(v)[len(v) // 2] for k, v in out.items()}
    print(
        json.dumps(
            {
                "timings": out,
                "jobs": jobs,
                "median": med,
                "onescan_over_union": round(
                    med["onescan"] / med["union"], 3
                ),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
