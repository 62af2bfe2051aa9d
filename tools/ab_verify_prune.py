#!/usr/bin/env python
"""A/B the streaming-LSH verify shapes in their CONTRACT regime
(VERDICT r10 next-round #3): big accumulated store, small micro-batch.

The r10 rejection of the candidate-id broadcast semi-prune was priced
at sf0.1 where the store is ~2k docs — the builder's own note said the
trade could invert at large store sizes. This harness builds stores of
increasing size (the NOTES_r10 replication trick), a fixed small
batch, and a realistic candidate set, then times three verify shapes
interleaved in one session:

  A "shipped":   cand ⋈ store(id_a) ⋈ store(id_b) with no hints —
                 whatever AQE plans.
  B "bcast":     same joins with cand wrapped in F.broadcast — the
                 store is PROBED map-side by construction, zero extra
                 jobs, zero extra passes.
  C "semiprune": broadcast left_semi prune of the store down to
                 candidate ids first, then candidate-sized joins (the
                 r10-rejected variant).

Store build time is excluded; each shape's wall is the verify
aggregation only (count of dropped ids). Output: one JSON line per
(store_size, shape, rep).

Usage: python tools/ab_verify_prune.py [--sizes 10000,40000,160000]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

import _cli  # noqa: E402  (tools/_cli.py — shared flag parsing)
from pyspark.sql import functions as F  # noqa: E402

from movies_etl_spark.operators import dedup as D  # noqa: E402
from movies_etl_spark.session import get_spark  # noqa: E402

WORK = f"/tmp/ab_verify_prune/{os.getpid()}"
BATCH_DOCS = 100
CAND_PER_BATCH_DOC = 3


def build_fixture(spark, n_store: int) -> tuple[str, str, str]:
    """Store/batch shingle parquets + candidate parquet. Docs are ~40
    tokens with overlapping vocab so Jaccard verify does real set
    work."""
    base = f"{WORK}/n{n_store}"
    shutil.rmtree(base, ignore_errors=True)
    docs = spark.range(n_store).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}_"), ((F.col("id") * (j + 7)) % 997))
                for j in range(40)
            ],
        ).alias("text"),
    )
    D.shingled(docs, "text", "doc_id").write.mode("overwrite").parquet(
        f"{base}/store"
    )
    batch = spark.range(n_store, n_store + BATCH_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}_"), ((F.col("id") * (j + 7)) % 997))
                for j in range(40)
            ],
        ).alias("text"),
    )
    D.shingled(batch, "text", "doc_id").write.mode("overwrite").parquet(
        f"{base}/batch"
    )
    # candidates: each batch doc pairs with a few pseudo-random store ids
    cand = (
        spark.range(n_store, n_store + BATCH_DOCS)
        .select(F.col("id").alias("id_b"))
        .withColumn(
            "k", F.explode(F.array(*[F.lit(i) for i in range(CAND_PER_BATCH_DOC)]))
        )
        .select(
            ((F.col("id_b") * 131 + F.col("k") * 7919) % n_store).alias("id_a"),
            "id_b",
        )
        .distinct()
    )
    cand.write.mode("overwrite").parquet(f"{base}/cand")
    return f"{base}/store", f"{base}/batch", f"{base}/cand"


def verify_wall(
    spark, store_p, batch_p, cand_p, shape: str
) -> tuple[float, int]:
    store = spark.read.parquet(store_p)
    sh_b = spark.read.parquet(batch_p)
    # Re-derive cand so it loses its parquet size statistic: in the
    # production shape the candidate frame is DERIVED (no stats), so
    # the static planner won't auto-broadcast it — a raw parquet read
    # here is sized and the planner broadcasts even in the "plain"
    # arm, making that arm unrepresentative of the regime the
    # adjudication is about (review catch, r11). The .distinct() is a
    # no-op on the data (build_fixture already wrote it distinct) and
    # applies identically to every arm.
    cand = spark.read.parquet(cand_p).distinct()
    sh_all = store.unionByName(sh_b).filter(F.size("shingles") > 0)
    t0 = time.perf_counter()
    if shape == "semiprune":
        ids = cand.select(F.col("id_a").alias("doc_id")).union(
            cand.select(F.col("id_b"))
        ).distinct()
        sh_all = sh_all.join(F.broadcast(ids), "doc_id", "left_semi")
    va = sh_all.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    vb = sh_all.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    c = F.broadcast(cand) if shape in ("bcast", "semiprune") else cand
    dropped = (
        c.join(va, "id_a")
        .join(vb, "id_b")
        .filter(F.round(D.jaccard(F.col("sh_a"), F.col("sh_b")), 4) >= 0.5)
        .select("id_b")
        .distinct()
    )
    n = dropped.count()
    wall = time.perf_counter() - t0
    return wall, n


def main() -> None:
    vals, _ = _cli.parse_args(
        sys.argv[1:],
        {"--sizes": lambda s: [int(x) for x in s.split(",")]},
        "usage: ab_verify_prune.py [--sizes N,N,...]",
    )
    sizes = vals.get("sizes", [10_000, 40_000, 160_000])
    spark = get_spark()
    spark.range(1).count()
    out = []
    for n in sizes:
        store_p, batch_p, cand_p = build_fixture(spark, n)
        # interleave shapes, 2 reps each, alternating order
        for rep in range(2):
            order = (
                ["shipped", "bcast", "semiprune"]
                if rep % 2 == 0
                else ["semiprune", "bcast", "shipped"]
            )
            for shape in order:
                spark._jvm.System.gc()
                wall, nd = verify_wall(spark, store_p, batch_p, cand_p, shape)
                row = {
                    "store": n,
                    "shape": shape,
                    "rep": rep,
                    "wall_sec": round(wall, 3),
                    "n_dropped": nd,
                }
                out.append(row)
                print(json.dumps(row), flush=True)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
