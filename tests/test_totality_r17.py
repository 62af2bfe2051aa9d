"""r17 totality sweep: end-to-end pins for the temporal/numeric edge
sites VERDICT r16 #2 queued (the method that found the F7-F9 year-0 and
F10 int64 crashes, applied to the remaining sites).

Contract boundary, probed empirically this round (/tmp probe scripts,
results in NOTES_r17.md): a value ALREADY outside Python's representable
range in the input data crashes at collect even as a bare passthrough
(``spark.read.parquet(...).collect()`` raises) — that is a scan-level
property of PySpark no operator can fix, and is out of contract. In
contract is everything an operator DERIVES: an in-range input must never
be mapped to a crash. The two in-range cliffs found and fixed in r17:

- ``date_add`` maps order dates within 30 days of 9999-12-31 out of
  range (collect crash) → ``expr.bounded_date_add``.
- Arrow/pandas kernels bound timestamps to datetime64[ns]'s
  [1677-09-21, 2262-04-11] — far inside Spark's [0001, 9999] — so the
  stateful sessionizer crashed executor-side on a year-5000 event Spark
  itself collects fine → int64 micros transport + ``from_unix_micros``.

Sites audited and found already total over in-range inputs (pinned
here): 1-hour window starts (the epoch→0001-01-01 offset is divisible
by 3600 s, so hour-window floors of in-range events stay in range),
``rolling_distinct_users``'s calendar expansion (out-of-range obs_day
internals stay JVM-side and are clipped by the observed-days join,
never collected), and gapfill/TWAP/range-window (numeric outputs;
``unix_micros``/``datediff`` are total over the full internal range).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(path, rows):
    """events.parquet with TIMESTAMP(MICROS) ts — the current testdata
    encoding (load_table/events_stream both accept it)."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, path)


# epoch micros for the pinned instants
US_YEAR_5000 = 95_617_584_000_000_000  # 5000-01-01T00:00:00 (> pandas ns max 2262)
US_YEAR_1500 = -14_831_769_600_000_000  # 1500-01-01T00:00:00 (< pandas ns min 1677)
US_2020 = 1_577_836_800_000_000  # 2020-01-01T00:00:00


def test_sessionize_total_beyond_pandas_ns_range(spark, tmp_path):
    """The applyInPandasWithState sessionizer must survive event times
    outside pandas datetime64[ns]'s [1677, 2262] span (in-range for
    Spark and for collect). Pre-r17 the TIMESTAMP Arrow transport
    crashed the Python worker with OutOfBoundsDatetime on the year-5000
    row; the int64 micros transport is immune, and session semantics
    (floor-to-second, strict 30-min gap) are unchanged."""
    from movies_etl_spark.streaming import ops

    sf = tmp_path / "sf"
    sf.mkdir()
    _write_events(
        str(sf / "events.parquet"),
        [
            (1, US_YEAR_5000, 10),
            (2, US_YEAR_1500, 11),
            (3, US_2020, 12),
            (4, US_2020 + 60 * 1_000_000, 12),  # same session, +1 min
            (5, US_2020 + 3 * 3600 * 1_000_000, 12),  # new session, +3 h
        ],
    )
    out = ops.sessionize(spark, str(sf))
    rows = {(r["user_id"], str(r["session_start"])): r["n_events"]
            for r in out.collect()}
    assert rows == {
        (10, "5000-01-01 00:00:00"): 1,
        (11, "1500-01-01 00:00:00"): 1,
        (12, "2020-01-01 00:00:00"): 2,
        (12, "2020-01-01 03:00:00"): 1,
    }


def test_sessionize_gap_boundary_exact_at_extreme_epoch(spark, tmp_path):
    """The strict-> gap contract (an EXACTLY-30-minute gap still merges)
    must hold at epochs where float64 can no longer represent micros
    exactly (ulp > 32 µs beyond ~year 2255): pandas Series.diff() routes
    int64 through float64, which can nudge an exact-boundary gap across
    the threshold — the kernel uses exact numpy int64 diffs instead.
    Pinned at year 5000: gap == 30 min merges, gap == 30 min + 1 s
    splits."""
    from movies_etl_spark.streaming import ops

    gap_us = 30 * 60 * 1_000_000
    sf = tmp_path / "sf"
    sf.mkdir()
    _write_events(
        str(sf / "events.parquet"),
        [
            (1, US_YEAR_5000, 7),
            (2, US_YEAR_5000 + gap_us, 7),           # exactly 30 min: merges
            (3, US_YEAR_5000 + 2 * gap_us + 1_000_000, 7),  # 30 min + 1 s: splits
        ],
    )
    rows = sorted(
        (str(r["session_start"]), r["n_events"])
        for r in ops.sessionize(spark, str(sf)).collect()
    )
    assert rows == [
        ("5000-01-01 00:00:00", 2),
        ("5000-01-01 01:00:01", 1),
    ]


def test_windowed_counts_start_in_range_at_date_floor(spark, tmp_path):
    """1-hour tumbling window starts stay in range for in-range events
    because the epoch→0001-01-01 offset (-62135596800 s) is divisible by
    3600 — pinned at the floor so a future window-width change that
    breaks the alignment argument fails here instead of at collect."""
    from movies_etl_spark.streaming import ops

    sf = tmp_path / "sf"
    sf.mkdir()
    us_floor = -62_135_510_400_000_000 + 1800 * 1_000_000  # 0001-01-02T00:30:00
    _write_events(str(sf / "events.parquet"), [(1, us_floor, 1)])
    rows = ops.windowed_counts(spark, str(sf)).collect()
    assert len(rows) == 1
    assert str(rows[0]["window_start"]) == "0001-01-02 00:00:00"
    assert rows[0]["cnt"] == 1


def test_date_arithmetic_due_date_total_near_maxyear(spark, tmp_path):
    """q_date_arithmetic's due_date (order date + 30 days) must null —
    not crash at collect — when an in-range order date sits within 30
    days of 9999-12-31 (the probed ``ValueError: year 10000`` cliff)."""
    from movies_etl_spark.plans.registry import QUERIES

    sf = tmp_path / "sf"
    sf.mkdir()
    us_9999_12_15 = 253_400_846_400_000_000  # 9999-12-15T00:00:00
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], type=pa.int64()),
                "o_orderdate": pa.array(
                    [us_9999_12_15, US_2020], type=pa.timestamp("us")
                ),
            }
        ),
        str(sf / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 2], type=pa.int64()),
                "l_linenumber": pa.array([1, 1], type=pa.int32()),
                "l_shipdate": pa.array([US_2020, US_2020], type=pa.timestamp("us")),
            }
        ),
        str(sf / "lineitem.parquet"),
    )
    got = {r["l_orderkey"]: r for r in QUERIES["date_arithmetic"](
        spark, str(sf)).collect()}
    assert got[1]["due_date"] is None          # 9999-12-15 + 30 crosses
    assert got[1]["order_year"] == 9999        # the other parts stay exact
    assert str(got[2]["due_date"]) == "2020-01-31 00:00:00"


def test_rolling_distinct_users_total_near_maxyear(spark, tmp_path):
    """rolling_distinct_users expands each (user, day) into 7 obs_day
    candidates via date_add(day, 0..6); near 9999-12-31 those internals
    go out of range but are clipped by the observed-days join and never
    collected — already total, pinned so a refactor that starts emitting
    obs_day (or pre-materializing the expansion) fails here."""
    from movies_etl_spark.plans import queries_mlprep  # noqa: F401 (registers)
    from movies_etl_spark.plans.registry import QUERIES

    sf = tmp_path / "sf"
    sf.mkdir()
    us_9999_12_31 = 253_402_214_400_000_000  # 9999-12-31T00:00:00
    _write_events(
        str(sf / "events.parquet"),
        [(1, us_9999_12_31, 1), (2, us_9999_12_31, 2)],
    )
    rows = QUERIES["rolling_distinct_users"](spark, str(sf)).collect()
    assert len(rows) == 1
    assert str(rows[0]["day"]) == "9999-12-31"
    assert rows[0]["dau"] == 2 and rows[0]["wau"] == 2
