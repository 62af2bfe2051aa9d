"""Mergeable quantile sketches (SCALE.md's at-scale swap for exact
percentiles, made explicit as partial/merge stages).

``percentile_approx`` already merges t-digest partials inside one query,
but a 100 TB pipeline needs the partials THEMSELVES as data: per-shard
(per-day, per-source) sketch tables that merge later — across jobs,
engines, and re-runs — without touching the raw values again. That
requires an engine-portable sketch: this module implements an equi-depth
centroid sketch (t-digest's merge discipline with uniform instead of
quantile-scaled centroid sizing) in pure DataFrame arithmetic, so the
identical sketch recomputes in any engine (the DuckDB oracle replicates
it exactly) and partials are append-stable the way the md5 dedup hashes
are (dedup.py module doc).

Error contract: with ``k`` centroids per shard, each centroid holds
≤ ceil(n_shard/k) values, so a merged-quantile estimate's RANK error is
bounded by ~N/k (one centroid width per shard boundary) — the
tests assert estimates sit inside the exact [q−1.5/k·margin, q+margin]
rank window rather than an ad-hoc relative tolerance.

Scale shape: stage 1 is a map-side-combinable aggregate per (shard,
bucket) — ONE shuffle of ~shards·k centroid rows, never the values;
the merge stage sorts centroid rows (thousands, not billions) and is
associative: shard sketches can merge into region sketches into a
global sketch, each step reading only centroid tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def equidepth_centroids(
    df: DataFrame,
    value_col: str,
    shard_col: str,
    order_cols: Sequence[str],
    k: int = 100,
) -> DataFrame:
    """Per-shard partial sketch: rank values within the shard
    (deterministic tie-break via ``order_cols``), cut into ``k``
    equi-depth buckets, and reduce each bucket to a (mean, weight)
    centroid. Returns (shard, bucket, m, w).

    The rank window shuffles each shard's values once — the same shuffle
    class as any per-shard sort — and the centroid reduction is a
    map-side-combinable groupBy. At 100 TB the shard column is the
    physical partition (day, source file group), so the window never
    crosses partitions and the output is ~shards·k rows."""
    w_rank = Window.partitionBy(shard_col).orderBy(
        F.col(value_col), *[F.col(c) for c in order_cols]
    )
    w_shard = Window.partitionBy(shard_col)
    ranked = df.select(
        F.col(shard_col).alias("shard"),
        F.col(value_col).alias("v"),
        (F.row_number().over(w_rank) - 1).alias("rn"),
        F.count(F.lit(1)).over(w_shard).alias("n_s"),
    )
    bucket = F.floor(F.col("rn") * k / F.col("n_s")).cast("bigint")
    return ranked.groupBy("shard", bucket.alias("bucket")).agg(
        F.avg("v").alias("m"), F.count(F.lit(1)).alias("w")
    )


def merge_centroid_quantiles(
    centroids: DataFrame, quantiles: Sequence[float]
) -> DataFrame:
    """Merge partial sketches into quantile estimates: order ALL shard
    centroids by (mean, shard, bucket) — the deterministic total order —
    take the running weight, and for each q return the mean of the first
    centroid whose cumulative weight reaches q·N. Returns (q, est) with
    est UNROUNDED — callers round exactly once at their output scale
    (double-rounding at two scales can flip the last digit vs an oracle
    that rounds once).

    This is the associative merge: ``centroids`` may itself be the union
    of previously merged centroid tables (shard → region → global), and
    the input is centroid rows only — the raw values are never re-read."""
    w_cum = Window.orderBy("m", "shard", "bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ordered = centroids.select(
        "m",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    qs = F.array(*[F.lit(float(q)) for q in quantiles])
    qdf = centroids.sparkSession.range(1).select(
        F.explode(qs).alias("q")
    )
    hit = qdf.join(
        ordered, F.col("cum") >= F.col("q") * F.col("total"), "inner"
    )
    return (
        hit.groupBy("q")
        .agg(F.min_by("m", "cum").alias("m_sel"))
        .select("q", F.col("m_sel").alias("est"))
    )
