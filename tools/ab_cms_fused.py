#!/usr/bin/env python
"""A/B adjudication for the r14 CMS-join-size fusion experiment (the
second exec-side target of the VERDICT r13 #6 budget): per-relation
sketch builds (two lineitem scans + a (seed, cell) equi-join for the
inner product, plus two exact-side groupBys + an l_partkey join — four
lineitem scans total) vs the fused dual-counter build (ONE sketch scan,
cell-local inner product, ONE conditional-aggregate exact side — two
lineitem scans total).

Protocol (same as ab_frontier_shared.py): (1) assert the two variants
return IDENTICAL frames (full collect — the query is oracle-gated, so
value drift would also fail CORRECTNESS, but the A/B must not depend on
the driver to find out); (2) interleaved warm timings, rep-major so
ambient drift is shared, with Spark job counts via the status tracker.

Usage: python tools/ab_cms_fused.py [--reps N] [--sf DIR]
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
        "usage: ab_cms_fused.py [--reps N] [--sf DIR]",
    )
    reps = vals.get("reps", 3)
    sf = vals.get("sf", "/root/testdata/sf0.1")

    from movies_etl_spark.plans import queries_scale as QS
    from movies_etl_spark.plans import registry

    spark = get_spark(app_name="ab_cms_fused")
    registry.QUERIES["groupby_count"](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(fused: bool) -> float:
        QS.CMS_JOIN_FUSED = fused
        fn = registry.QUERIES["cms_join_size_estimate"]
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def rows(fused: bool):
        QS.CMS_JOIN_FUSED = fused
        fn = registry.QUERIES["cms_join_size_estimate"]
        return sorted(tuple(r) for r in fn(spark, sf).collect())

    # ---- value identity first ----
    base_rows = rows(False)
    fused_rows = rows(True)
    assert base_rows == fused_rows, (
        "variant mismatch: base=" + str(base_rows) + " fused=" + str(fused_rows)
    )
    print(f"values identical: {base_rows}", file=sys.stderr)

    out: dict[str, list] = {"per_relation": [], "fused": []}
    jobs: dict[str, list] = {"per_relation": [], "fused": []}
    for _ in range(reps):
        for key, flag in (("per_relation", False), ("fused", True)):
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
                "fused_over_per_relation": round(
                    med["fused"] / med["per_relation"], 3
                ),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
