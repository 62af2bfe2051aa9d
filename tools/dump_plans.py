#!/usr/bin/env python
"""Dump .explain('formatted') for named registry queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX q1 q2 ... [--sf DIR]
Writes OUTDIR/<query>_<SUFFIX>.txt. Streaming-sink queries (whose
builder RUNS a stream rather than returning a lazy frame) still return
a batch DataFrame over the sink output; the explain is of that final
frame — noted in the file header."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movies_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        del argv[i : i + 2]
    outdir, suffix, names = argv[0], argv[1], argv[2:]
    os.makedirs(outdir, exist_ok=True)
    from movies_etl_spark.plans import flagship, registry  # noqa: F401
    from movies_etl_spark.plans import queries_analytics  # noqa: F401
    from movies_etl_spark.plans import queries_curation  # noqa: F401
    from movies_etl_spark.plans import queries_expr, queries_ext  # noqa: F401
    from movies_etl_spark.plans import queries_mlprep  # noqa: F401
    from movies_etl_spark.plans import queries_scale  # noqa: F401

    spark = get_spark(app_name="dump_plans")
    for name in names:
        fn = registry.QUERIES[name]
        df = fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf} (.explain formatted)\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        from movies_etl_spark.operators import caching

        caching.release_tracked()


if __name__ == "__main__":
    main()
