"""The ratings aggregation block: groupBy → pivot → prefix → fillna → join
(SURVEY.md §2.4 A1-A3 + F16 + J2; reference challenge.py:276-285).

This is the only part of the reference touching the 26M-row table, and the
part whose Spark plan matters most at 100 TB:

- A1+A2 share the ``movieId`` hash partitioning: Spark's pivot with an
  EXPLICIT value list compiles to a single hash aggregate over movieId
  with one count per pivot bucket — ONE shuffle over the fact table total
  (vs. groupBy-then-pivot's two if the value list were discovered by an
  extra distinct scan).
- The pivoted result is dimension-sized (one row per movie) →
  broadcast-joined to the movies table, no second fact shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the ten rating buckets (challenge.py:278-279; FIXTURES.md)
RATING_BUCKETS = [0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5, 5.0]


def groupby_count(df: DataFrame, keys: Sequence[str], alias: str = "count") -> DataFrame:
    """A1: count per key group (challenge.py:276). Partial (map-side)
    aggregation is automatic in Spark's hash aggregate."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


def pivot_counts(
    df: DataFrame,
    group_key: str,
    pivot_key: str,
    values: Sequence,
    prefix: str = "",
    fill_zero: bool = True,
) -> DataFrame:
    """A2+A3+F16: pivot `pivot_key` values into count columns, one row per
    `group_key` (challenge.py:278-283).

    Passing the explicit ``values`` list avoids the extra distinct-scan job
    AND fixes the output schema (oracle-stable). Column names get
    ``prefix`` + the pandas ``str(value)`` rendering (``str(0.5)='0.5'``,
    ``str(1.0)='1.0'``) for golden-output parity."""
    out = df.groupBy(group_key).pivot(pivot_key, list(values)).count()
    renames = {str(v): f"{prefix}{v}" for v in values}
    out = out.withColumnsRenamed({k: v for k, v in renames.items() if k != v})
    if fill_zero:
        # NB: explicit coalesce, not fillna(subset=...) — pandas-parity
        # names like "rating_0.5" contain dots, which fillna's resolver
        # mis-parses as struct field paths.
        out = out.select(
            F.col(group_key),
            *[
                F.coalesce(F.col(f"`{prefix}{v}`"), F.lit(0)).alias(f"{prefix}{v}")
                for v in values
            ],
        )
    return out


def rating_counts(ratings: DataFrame, prefix: str = "rating_") -> DataFrame:
    """The reference's exact block: per-movie rating-bucket counts with
    nulls filled to 0 BEFORE the join (challenge.py:276-283 — movies with
    no ratings at all still get nulls post-join; see SURVEY F16 note)."""
    return pivot_counts(
        ratings, "movieId", "rating", RATING_BUCKETS, prefix=prefix, fill_zero=True
    )


def attach_rating_counts(
    movies: DataFrame, ratings: DataFrame, movies_key: str = "kaggle_id"
) -> DataFrame:
    """J2: movies LEFT JOIN pivoted counts on kaggle_id = movieId
    (challenge.py:285). The pivoted side is dimension-sized → broadcast."""
    counts = rating_counts(ratings)
    return movies.join(
        F.broadcast(counts), movies[movies_key] == counts["movieId"], "left"
    ).drop(counts["movieId"])
