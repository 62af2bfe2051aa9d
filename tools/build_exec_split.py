#!/usr/bin/env python
"""Per-query (build_sec, exec_sec) split: time fn(spark, sf) separately
from the noop-sink action. Reps interleaved rep-major like ab_time."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movies_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    args, reps, sf = [], 3, "/root/testdata/sf0.1"
    i = 0
    while i < len(argv):
        if argv[i] == "--reps":
            reps = int(argv[i + 1]); i += 2
        elif argv[i] == "--sf":
            sf = argv[i + 1]; i += 2
        else:
            args.append(argv[i]); i += 1
    from movies_etl_spark.plans import flagship, registry  # noqa: F401
    from movies_etl_spark.plans import queries_analytics  # noqa: F401
    from movies_etl_spark.plans import queries_curation  # noqa: F401
    from movies_etl_spark.plans import queries_expr, queries_ext  # noqa: F401
    from movies_etl_spark.plans import queries_mlprep  # noqa: F401
    from movies_etl_spark.plans import queries_scale  # noqa: F401

    spark = get_spark(app_name="build_exec_split")
    registry.QUERIES["groupby_count"](spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    out = {n: [] for n in args}
    for _ in range(reps):
        for name in args:
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            df = registry.QUERIES[name](spark, sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            out[name].append([round(t1 - t0, 3), round(t2 - t1, 3)])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
