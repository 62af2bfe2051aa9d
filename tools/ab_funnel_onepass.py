#!/usr/bin/env python
"""A/B adjudication for the r14 one-pass funnel (fourth exec-side
adoption, found by tools/audit_scans.py): the per-stage funnel scans
the events fact table five times at runtime (three per-stage
aggregates + two join probes; one exchange reused) vs one scan + one
user_id exchange + a three-window stack + a partitioning-reusing
dedup aggregate.

Protocol (same as ab_frontier_shared.py): (1) assert the two variants
return IDENTICAL frames (full collect — the query is oracle-gated, so
value drift would also fail CORRECTNESS, but the A/B must not depend on
the driver to find out); (2) interleaved warm timings, rep-major so
ambient drift is shared, with Spark job counts via the status tracker.

Usage: python tools/ab_funnel_onepass.py [--reps N] [--sf DIR]
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
        "usage: ab_funnel_onepass.py [--reps N] [--sf DIR]",
    )
    reps = vals.get("reps", 3)
    sf = vals.get("sf", "/root/testdata/sf0.1")

    from movies_etl_spark.plans import queries_analytics as QA
    from movies_etl_spark.plans import registry

    spark = get_spark(app_name="ab_funnel_onepass")
    registry.QUERIES["groupby_count"](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(onepass: bool) -> float:
        QA.FUNNEL_ONE_PASS = onepass
        fn = registry.QUERIES["funnel_analysis"]
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def rows(onepass: bool):
        QA.FUNNEL_ONE_PASS = onepass
        fn = registry.QUERIES["funnel_analysis"]
        return sorted(tuple(r) for r in fn(spark, sf).collect())

    # ---- value identity first ----
    base_rows = rows(False)
    onepass_rows = rows(True)
    assert base_rows == onepass_rows, (
        "variant mismatch: base=" + str(base_rows) + " onepass=" + str(onepass_rows)
    )
    print(f"values identical: {base_rows}", file=sys.stderr)

    out: dict[str, list] = {"per_stage": [], "onepass": []}
    jobs: dict[str, list] = {"per_stage": [], "onepass": []}
    for _ in range(reps):
        for key, flag in (("per_stage", False), ("onepass", True)):
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
                "onepass_over_per_stage": round(
                    med["onepass"] / med["per_stage"], 3
                ),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
