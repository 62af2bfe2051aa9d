#!/usr/bin/env python
"""A/B confirming the RETIREMENT of the serving-family ×2 candidate
(NOTES_r15 close; VERDICT r15 next-round #4 ordered numbers either way).

Candidate: the serving-path similarity queries (similarity_topk /
similarity_ann_lsh / similarity_ann_multiprobe / ann_rerank /
dedup_embedding_cosine) each show 2 resident embeddings scans — the
corpus pass plus the query-subset derivation. Superficially the seam
the r15 recall adoption closed with one lazy checkpoint (4-5 scans →
1). The retirement reasoning: the recall audits ran two FULL corpus
passes (one per method arm) so the checkpoint saved a full pass; the
serving queries' second scan is parquet-PRUNED to the probe set
(PushedFilters LessThan(vec_id,8) — a row-group mini-scan at any
corpus size), so a checkpoint trades that mini-scan for a FULL corpus
materialization — strictly worse at scale, and at 100 TB the query
set arrives separately anyway.

This tool prices the trade at bench SF with the standard interleaved
protocol (ab_funnel_onepass.py): (1) assert both variants return
IDENTICAL frames; (2) rep-major interleaved warm timings + job counts.
Variant B mints a fresh lazy checkpoint per rep — exactly what a
per-query adoption would pay in a driver session that runs each query
once.

Usage: python tools/ab_serving_checkpoint.py [--reps N] [--sf DIR]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

import _cli  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from movies_etl_spark.session import get_spark  # noqa: E402

NAMES = ["similarity_topk", "similarity_ann_multiprobe"]


def main() -> None:
    vals, _ = _cli.parse_args(
        sys.argv[1:],
        {"--reps": int, "--sf": str},
        "usage: ab_serving_checkpoint.py [--reps N] [--sf DIR]",
    )
    reps = vals.get("reps", 5)
    sf = vals.get("sf", "/root/testdata/sf0.1")

    from movies_etl_spark.operators import similarity as SIM
    from movies_etl_spark.plans import registry

    spark = get_spark(app_name="ab_serving_checkpoint")
    registry.QUERIES["groupby_count"](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()

    def build(name: str, checkpointed: bool):
        e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        # variant B: the candidate's shape — one materialized corpus,
        # query subset derived from the checkpoint instead of a pruned
        # parquet mini-scan. Fresh per call (per-query driver cost).
        base = e.localCheckpoint(eager=False) if checkpointed else e
        q = base.filter(F.col("vec_id") < 8)
        if name == "similarity_topk":
            return SIM.topk_bruteforce(base, q, k=5)
        return SIM.topk_multiprobe_lsh(base, q, k=5)

    def run(name: str, checkpointed: bool) -> float:
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        build(name, checkpointed).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    result: dict[str, dict] = {}
    for name in NAMES:
        a = sorted(tuple(r) for r in build(name, False).collect())
        b = sorted(tuple(r) for r in build(name, True).collect())
        assert a == b, f"{name} mismatch: pruned != checkpointed"
        print(f"{name}: values identical ({len(a)} rows)", file=sys.stderr)
        out: dict[str, list] = {"pruned": [], "checkpointed": []}
        jobs: dict[str, list] = {"pruned": [], "checkpointed": []}
        for _ in range(reps):
            for key, flag in (("pruned", False), ("checkpointed", True)):
                n0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
                out[key].append(run(name, flag))
                n1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
                jobs[key].append(n1 - n0)
        med = {k: sorted(v)[len(v) // 2] for k, v in out.items()}
        result[name] = {
            "timings": out,
            "jobs": jobs,
            "median": med,
            "checkpointed_over_pruned": round(
                med["checkpointed"] / med["pruned"], 3
            ),
        }
    print(json.dumps({"queries": result, "sf": sf}))


if __name__ == "__main__":
    main()
