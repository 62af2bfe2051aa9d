#!/usr/bin/env python
"""Per-JOB profile of streaming_lsh_dedup's micro-batch bodies: runs
the registered query with the UI REST endpoint enabled, wraps
ops.lsh_dedup_batch to stamp each batch's job group description, then
dumps every Spark job (submission order, duration, description) so the
per-batch job count and the time split across broadcast builds / writes
are visible. Diagnostic only — not on the bench path."""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movies_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from movies_etl_spark.plans import queries_ext, registry  # noqa: F401
    from movies_etl_spark.streaming import ops

    spark = get_spark(
        app_name="profile_lsh_jobs", extra_conf={"spark.ui.enabled": "true"}
    )
    registry.QUERIES["groupby_count"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()

    real = ops.lsh_dedup_batch

    def shim(spark_, batch_df, batch_id, work_dir, max_bucket_rows=None):
        spark_.sparkContext.setJobDescription(f"lsh batch {batch_id}")
        t0 = time.perf_counter()
        out = real(spark_, batch_df, batch_id, work_dir, max_bucket_rows)
        print(
            f"## batch {batch_id}: {time.perf_counter() - t0:.3f}s",
            file=sys.stderr,
        )
        spark_.sparkContext.setJobDescription(None)
        return out

    ops.lsh_dedup_batch = shim
    try:
        t0 = time.perf_counter()
        df = registry.QUERIES["streaming_lsh_dedup"](spark, SF)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
    finally:
        ops.lsh_dedup_batch = real

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    jobs = json.load(
        urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs")
    )
    jobs.sort(key=lambda j: j["jobId"])
    rows = []
    for j in jobs:
        if "lsh batch" not in (j.get("description") or ""):
            continue
        t_sub = j["submissionTime"]
        t_end = j.get("completionTime", t_sub)
        rows.append(
            {
                "id": j["jobId"],
                "desc": j["description"],
                "stages": len(j["stageIds"]),
                "tasks": j["numTasks"],
                "ms": _dur_ms(t_sub, t_end),
            }
        )
    print(json.dumps({"wall": round(wall, 3), "jobs": rows}, indent=1))
    per_batch: dict[str, list] = {}
    for r in rows:
        per_batch.setdefault(r["desc"], []).append(r)
    for b, rs in per_batch.items():
        print(
            f"{b}: {len(rs)} jobs, {sum(r['ms'] for r in rs)} ms job-time",
            file=sys.stderr,
        )


def _dur_ms(a: str, b: str) -> int:
    from datetime import datetime

    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    try:
        ta = datetime.strptime(a, fmt)
        tb = datetime.strptime(b, fmt)
        return int((tb - ta).total_seconds() * 1000)
    except Exception:
        return -1


if __name__ == "__main__":
    main()
