#!/usr/bin/env python
"""Interleaved A/B: distributed-CC convergence check every round (r18
shape, CC_CHECK_EVERY=1) vs every 2nd round (r19, VERDICT r18 #7) on
dedup_cc_distributed. One session, arm order alternated per rep, control
query (groupby_count) read alongside to price ambient drift."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movies_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from movies_etl_spark.operators import dedup as D
    from movies_etl_spark.plans import queries_ext, registry  # noqa: F401

    spark = get_spark(app_name="ab_cc_checkevery")
    registry.QUERIES["groupby_count"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()

    def run(name):
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, SF)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    out = {"every1": [], "every2": [], "control": [], "rounds": []}
    for rep in range(reps):
        arms = [1, 2] if rep % 2 == 0 else [2, 1]
        for arm in arms:
            D.CC_CHECK_EVERY = arm
            t = run("dedup_cc_distributed")
            out[f"every{arm}"].append(t)
            out["rounds"].append((arm, D.LAST_CC_ROUNDS))
        out["control"].append(run("groupby_count"))
    D.CC_CHECK_EVERY = 2
    print(json.dumps(out))


if __name__ == "__main__":
    main()
