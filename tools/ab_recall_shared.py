#!/usr/bin/env python
"""A/B adjudication for the r15 shared-scan recall audits: the two
standing eval-harness rows on the scan board (ann_recall_eval ×4
resident embeddings scans, ann_recall_clustered ×5 — each method arm
plus both query-set derivations re-read parquet, and the clustered
arms each re-ran the fixture's broadcast join). The shared form rides
one lazy tracked checkpoint (the frontier pattern) so every arm reads
a LogicalRDD leaf.

Protocol (same as ab_funnel_onepass.py): (1) assert the two variants
return IDENTICAL frames per query (full collect); (2) interleaved warm
timings, rep-major so ambient drift is shared, with Spark job counts.

Usage: python tools/ab_recall_shared.py [--reps N] [--sf DIR]
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

NAMES = ["ann_recall_eval", "ann_recall_clustered"]


def main() -> None:
    vals, _ = _cli.parse_args(
        sys.argv[1:],
        {"--reps": int, "--sf": str},
        "usage: ab_recall_shared.py [--reps N] [--sf DIR]",
    )
    reps = vals.get("reps", 5)
    sf = vals.get("sf", "/root/testdata/sf0.1")

    from movies_etl_spark.plans import queries_ext as QE
    from movies_etl_spark.plans import registry

    spark = get_spark(app_name="ab_recall_shared")
    registry.QUERIES["groupby_count"](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(name: str, shared: bool) -> float:
        QE.RECALL_SHARED_SCAN = shared
        fn = registry.QUERIES[name]
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def rows(name: str, shared: bool):
        QE.RECALL_SHARED_SCAN = shared
        fn = registry.QUERIES[name]
        return sorted(tuple(r) for r in fn(spark, sf).collect())

    result: dict[str, dict] = {}
    for name in NAMES:
        base_rows = rows(name, False)
        shared_rows = rows(name, True)
        assert base_rows == shared_rows, (
            f"{name} mismatch: base={base_rows} shared={shared_rows}"
        )
        print(f"{name}: values identical ({len(base_rows)} rows)",
              file=sys.stderr)
        out: dict[str, list] = {"per_arm": [], "shared": []}
        jobs: dict[str, list] = {"per_arm": [], "shared": []}
        for _ in range(reps):
            for key, flag in (("per_arm", False), ("shared", True)):
                n0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
                out[key].append(run(name, flag))
                n1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
                jobs[key].append(n1 - n0)
        med = {k: sorted(v)[len(v) // 2] for k, v in out.items()}
        result[name] = {
            "timings": out,
            "jobs": jobs,
            "median": med,
            "shared_over_per_arm": round(med["shared"] / med["per_arm"], 3),
        }
    print(json.dumps({"queries": result, "sf": sf}))


if __name__ == "__main__":
    main()
