#!/usr/bin/env python
"""A/B adjudication for the r14 frontier shared-scan experiment
(VERDICT r13 #6): per-config broadcast joins (one signature-table scan
per config, 15 scans) vs one cfg-tagged join per (corpus, family) arm
(4 scans, small constant corpus-row expansion).

Protocol: (1) assert the two variants return IDENTICAL frames (sorted
full collect — the query is oracle-gated, so any value drift would also
fail CORRECTNESS, but the A/B must not depend on the driver to find
out); (2) interleaved warm timings, rep-major so ambient drift is
shared, with Spark job counts via the status tracker.

Usage: python tools/ab_frontier_shared.py [--reps N] [--sf DIR]
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
        "usage: ab_frontier_shared.py [--reps N] [--sf DIR]",
    )
    reps = vals.get("reps", 3)
    sf = vals.get("sf", "/root/testdata/sf0.1")

    from movies_etl_spark.plans import queries_ext as QE
    from movies_etl_spark.plans import registry

    spark = get_spark(app_name="ab_frontier_shared")
    registry.QUERIES["groupby_count"](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(shared: bool) -> float:
        QE.FRONTIER_SHARED_SCAN = shared
        fn = registry.QUERIES["ann_frontier_sweep"]
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def rows(shared: bool):
        QE.FRONTIER_SHARED_SCAN = shared
        fn = registry.QUERIES["ann_frontier_sweep"]
        return sorted(tuple(r) for r in fn(spark, sf).collect())

    # ---- value identity first ----
    base_rows = rows(False)
    shared_rows = rows(True)
    assert base_rows == shared_rows, (
        "variant mismatch: "
        + str([a for a, b in zip(base_rows, shared_rows) if a != b][:3])
    )
    print(f"values identical: {len(base_rows)} rows", file=sys.stderr)

    out: dict[str, list] = {"per_config": [], "shared": []}
    jobs: dict[str, list] = {"per_config": [], "shared": []}
    for _ in range(reps):
        for key, flag in (("per_config", False), ("shared", True)):
            n0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
            out[key].append(run(flag))
            n1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
            jobs[key].append(n1 - n0)
    med = {
        k: sorted(v)[len(v) // 2] for k, v in out.items()
    }
    print(
        json.dumps(
            {
                "timings": out,
                "jobs": jobs,
                "median": med,
                "shared_over_per_config": round(
                    med["shared"] / med["per_config"], 3
                ),
                "n_rows": len(base_rows),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
