#!/usr/bin/env python
"""A/B adjudication for the r14 shared-signature experiment (third
exec-side target of the VERDICT r13 #6 budget): minhash_jaccard_estimate
derives the 8-slot MinHash signature three times per doc (banding inside
candidate generation + each verify join side, all from the persisted
shingles) vs materializing the signature columns into the tracked
persist once and reading them three times.

Protocol (same as ab_frontier_shared.py / ab_cms_fused.py): (1) assert
the two variants return IDENTICAL frames; (2) interleaved warm timings,
rep-major so ambient drift is shared, with Spark job counts.

Usage: python tools/ab_minhash_sig.py [--reps N] [--sf DIR]
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
        "usage: ab_minhash_sig.py [--reps N] [--sf DIR]",
    )
    reps = vals.get("reps", 3)
    sf = vals.get("sf", "/root/testdata/sf0.1")

    from movies_etl_spark.plans import queries_ext as QE
    from movies_etl_spark.plans import registry

    spark = get_spark(app_name="ab_minhash_sig")
    registry.QUERIES["groupby_count"](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(shared: bool) -> float:
        QE.MINHASH_EST_SHARED_SIG = shared
        fn = registry.QUERIES["minhash_jaccard_estimate"]
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def rows(shared: bool):
        QE.MINHASH_EST_SHARED_SIG = shared
        fn = registry.QUERIES["minhash_jaccard_estimate"]
        return sorted(tuple(r) for r in fn(spark, sf).collect())

    # ---- value identity first ----
    base_rows = rows(False)
    shared_rows = rows(True)
    assert base_rows == shared_rows, (
        "variant mismatch: "
        + str([a for a, b in zip(base_rows, shared_rows) if a != b][:3])
    )
    print(f"values identical: {len(base_rows)} rows", file=sys.stderr)

    out: dict[str, list] = {"refold": [], "shared_sig": []}
    jobs: dict[str, list] = {"refold": [], "shared_sig": []}
    for _ in range(reps):
        for key, flag in (("refold", False), ("shared_sig", True)):
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
                "shared_over_refold": round(med["shared_sig"] / med["refold"], 3),
                "n_rows": len(base_rows),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
