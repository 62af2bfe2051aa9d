#!/usr/bin/env python
"""Corpus-axis scale measurement for ann_frontier_sweep (VERDICT r14
#4).

The r14 shared-scan adoption claims the 100-TB shape — ONE pass over
the corpus-scale signature table per (corpus, family) arm instead of
one per config — but the general scale fixture (tools/scale_curves.py)
symlinks embeddings at 1×, so the one query whose rewrite is argued on
corpus-scan multiplicity had no measured corpus-axis point. This
harness replicates EMBEDDINGS (the only table the query scans) and
measures the exact registered query at 1×/10×/100× corpus size
(2k/20k/200k vectors; --thousand extends to 2M).

Why the axis is honest:

- The query's two query sets are FIXED id ranges (vec_id in [0,8) and
  [8,16)), all inside replica 0 — so the corpus grows while the query
  set stays constant, exactly the production shape the shared-scan
  argument is about (per-arm scan term ∝ corpus; probe side constant).
- Replica vectors are DIRECTIONALLY DISTINCT, not copies: replica k
  (k ≥ 1) maps v → v + δ_k·rot1(v) (circular shift by one element,
  δ_k = 0.1 + 0.05k), and the 100× outer replication composes
  v → v + γ_j·rot2(v) (γ_j = 0.1 + 0.037j). Pure IEEE adds/multiplies
  (deterministic, same discipline as clustered_fixture); no two
  replicas share a direction, so the fixture adds no exact-twin
  tie/duplicate structure — bucket occupancy and candidate volume grow
  with corpus size the way real growth grows them.
- clustered_fixture / the trained quantizer stay well-defined at every
  size: cluster centers are vec_id < 8 (replica 0), assignment is
  vec_id % k — replication scales cluster POPULATIONS, not the center
  set, which is what a growing clustered corpus does.
- vec_id shifts (k·10M inner, j·1e9 outer) keep every replica id clear
  of the query ranges and of each other.

Recall values at scaled sizes are reported for context but NOT gated
(the 1× exact values are the driver's correctness gate; at 10×/100×
the planted clusters hold 10×/100× members so recall@5 against the
fixed query set measures the fixture, not the index). The measured
quantity is per-tier wall + job count: the shared-scan form should
hold its job count flat while wall grows ~linearly in the corpus term.

Same fixture-sentinel and min-of-reps discipline as
tools/scale_curves.py.

Usage: python tools/scale_frontier.py [--thousand]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from movies_etl_spark.session import get_spark  # noqa: E402
from movies_etl_spark.plans import registry  # noqa: E402
import __spark_entry__  # noqa: E402,F401

SRC_SF = "/root/testdata/sf0.1"
WORK = "/tmp/scale_frontier"
REPLICAS = 10

TPCH_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _mixed(vec, delta: float, shift: int):
    """v + delta·rot_shift(v), cast back to float (the table's element
    type). rot is slice+concat — no UDF, bit-deterministic."""
    rot = F.concat(
        F.slice(vec, shift + 1, 10_000), F.slice(vec, 1, shift)
    )
    lit = F.lit(float(delta))
    return F.zip_with(
        vec, rot, lambda a, b: (a.cast("double") + lit * b.cast("double")).cast("float")
    )


def _replicate(df, id_shift: int, k: int, delta: float, shift: int):
    r = df.withColumn("vec_id", F.col("vec_id") + F.lit(k * id_shift))
    if k == 0:
        return r
    return r.withColumn("embedding", _mixed(F.col("embedding"), delta, shift))


def _build_tier(spark, src_dir: str, out_dir: str, id_shift: int,
                delta0: float, dstep: float, shift: int, parts: int) -> None:
    os.makedirs(out_dir)
    for t in TPCH_TABLES:
        if t != "embeddings":
            os.symlink(f"{SRC_SF}/{t}.parquet", f"{out_dir}/{t}.parquet")
    e = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    reps = None
    for k in range(REPLICAS):
        r = _replicate(e, id_shift, k, delta0 + dstep * k, shift)
        reps = r if reps is None else reps.unionByName(r)
    reps.repartition(parts).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def build_dirs(spark, thousand: bool) -> list[tuple[str, str]]:
    scheme = (
        f"replicas={REPLICAS};mix=rot1+rot2{'+rot4' if thousand else ''};"
        f"src={SRC_SF}"
    )
    sentinel = f"{WORK}/.fixture_complete"
    tiers = [("1x", f"{WORK}/sf1x"), ("10x", f"{WORK}/sf10x"),
             ("100x", f"{WORK}/sf100x")]
    if thousand:
        tiers.append(("1000x", f"{WORK}/sf1000x"))
    if os.path.isfile(sentinel):
        with open(sentinel) as f:
            if f.read() == scheme:
                return tiers
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(f"{WORK}/sf1x")
    for t in TPCH_TABLES:
        os.symlink(f"{SRC_SF}/{t}.parquet", f"{WORK}/sf1x/{t}.parquet")
    _build_tier(spark, f"{WORK}/sf1x", f"{WORK}/sf10x",
                10_000_000, 0.1, 0.05, 1, 8)
    _build_tier(spark, f"{WORK}/sf10x", f"{WORK}/sf100x",
                1_000_000_000, 0.1, 0.037, 2, 32)
    if thousand:
        _build_tier(spark, f"{WORK}/sf100x", f"{WORK}/sf1000x",
                    100_000_000_000, 0.1, 0.023, 4, 64)
    with open(sentinel, "w") as f:
        f.write(scheme)
    return tiers


def measure(
    spark, name: str, sf_dir: str, reps: int = 2
) -> tuple[float, int, int]:
    best, jobs, rows = None, 0, 0
    for _ in range(reps):
        spark._jvm.System.gc()
        j0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        out = df.collect()
        w = time.perf_counter() - t0
        j1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        rows = len(out)
        if best is None or w < best:
            best, jobs = w, j1 - j0
    return round(best, 3), jobs, rows


def main() -> None:
    args = sys.argv[1:]
    thousand = "--thousand" in args
    # r15 extension: the fixture serves the whole EMBEDDING-SCANNING
    # query family, which the general scale fixture (symlinked
    # embeddings) could never measure. Queries with fixed vec_id train/
    # query ranges keep them inside replica 0 — train/probe sets stay
    # constant while the corpus grows, the production shape.
    names = [a for a in args if not a.startswith("--")] or [
        "ann_frontier_sweep"
    ]
    spark = get_spark(app_name="scale_frontier")
    spark.range(1).count()
    tiers = build_dirs(spark, thousand)
    for name in names:
        walls: dict[str, float] = {}
        for tag, d in tiers:
            # a guarded operator MAY hard-fail at a big tier by design
            # (e.g. cosine_pairs_vectorized's MAX_COSINE_BLOCK_ROWS cap
            # when fixed-cardinality blocks grow past the bound) — that
            # is the contract firing, not a harness error: report the
            # row and continue the sweep.
            try:
                w, jobs, rows = measure(spark, name, d)
            except Exception as exc:  # noqa: BLE001
                first = next(
                    (ln for ln in str(exc).splitlines() if ln.strip()),
                    type(exc).__name__,
                )
                print(
                    json.dumps(
                        {"query": name, "tier": tag,
                         "guard_tripped": first[:220]}
                    ),
                    flush=True,
                )
                continue
            walls[tag] = w
            n_vec = spark.read.parquet(f"{d}/embeddings.parquet").count()
            print(
                json.dumps(
                    {"query": name, "tier": tag, "n_vectors": n_vec,
                     "wall_sec": w, "jobs": jobs, "rows": rows}
                ),
                flush=True,
            )
        tags = [t for t, _ in tiers if t in walls]
        for a, b in zip(tags, tags[1:]):
            slope = round(
                math.log(walls[b] / walls[a]) / math.log(REPLICAS), 3
            )
            print(
                json.dumps(
                    {"query": name, "segment": f"{a}->{b}",
                     "loglog_slope": slope}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
