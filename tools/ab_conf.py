#!/usr/bin/env python
"""Interleaved conf-A/B: time named queries alternating a conf set
on/off WITHIN one session (ambient drift shared). Usage:

  python tools/ab_conf.py --conf k=v [--conf k2=v2] [--reps N] [--sf DIR] q1 q2 ...
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movies_etl_spark.session import get_spark, temp_confs  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    args, reps, sf, confs = [], 3, "/root/testdata/sf0.1", {}
    i = 0
    while i < len(argv):
        if argv[i] == "--reps":
            reps = int(argv[i + 1]); i += 2
        elif argv[i] == "--sf":
            sf = argv[i + 1]; i += 2
        elif argv[i] == "--conf":
            k, v = argv[i + 1].split("=", 1); confs[k] = v; i += 2
        else:
            args.append(argv[i]); i += 1
    from movies_etl_spark.plans import flagship, registry  # noqa: F401
    from movies_etl_spark.plans import queries_analytics  # noqa: F401
    from movies_etl_spark.plans import queries_curation  # noqa: F401
    from movies_etl_spark.plans import queries_expr, queries_ext  # noqa: F401
    from movies_etl_spark.plans import queries_mlprep  # noqa: F401
    from movies_etl_spark.plans import queries_scale  # noqa: F401

    spark = get_spark(app_name="ab_conf")
    registry.QUERIES["groupby_count"](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {n: {"off": [], "on": []} for n in args}

    def run(name):
        fn = registry.QUERIES[name]
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        df = fn(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # Alternate arm order per rep (ADVICE r18 #4): always running the
    # conf-off arm first systematically warms page-cache/JIT for the on
    # arm; flipping the order each rep cancels the bias across reps.
    for rep in range(reps):
        for name in args:
            arms = ["off", "on"] if rep % 2 == 0 else ["on", "off"]
            for arm in arms:
                if arm == "off":
                    out[name]["off"].append(run(name))
                else:
                    with temp_confs(spark, confs):
                        out[name]["on"].append(run(name))
    print(json.dumps({"confs": confs, "timings": out}))


if __name__ == "__main__":
    main()
