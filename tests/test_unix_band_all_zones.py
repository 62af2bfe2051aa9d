"""The F10/F10µ guard band vs the driver's OS timezone (r18 — ADVICE r16
low / VERDICT r17 #6, upgraded from "re-document" to a FIX).

The collect-time crash site is ``TimestampType.fromInternal`` →
``datetime.fromtimestamp`` under the PROCESS timezone (``TZ``), which
``spark.sql.session.timeZone`` does not reach — the driver harness owns
its own process env, so the band must be total over every OS zone.
``fromInternal`` is pure Python, so the sweep runs in-process via
TZ + tzset with no JVM involved.

What r18 found: CPython's ``fromtimestamp`` probes ``t − 24 h`` in local
time for fold detection, so the unrepresentable window at the lower edge
is 24 h PLUS the zone's year-1 LMT west offset — the r17 one-day band
(0001-01-02) crashed under plain America/New_York (offset 4:56:02,
first representable instant exact_min + 104 162 s). The band is now
asymmetric: 2 days at the lower edge (fold probe + max ~12 h
longitude-bound LMT), 1 day at the upper (no probe, east offsets ≤ +14 h).
"""

from __future__ import annotations

import os
import time

import pytest

from movies_etl_spark.functions import expr as E

ZONES_SPOT = [
    "Etc/UTC",
    "America/New_York",      # the r17-band killer (LMT -4:56:02)
    "Pacific/Kiritimati",    # +14 today, LMT -10:29 in year 1 — both edges
    "Pacific/Apia",          # crossed the date line (east today, west LMT)
    "Etc/GMT+12",            # max modern west offset
    "Etc/GMT-14",            # max modern east offset
]


@pytest.fixture
def restore_tz():
    old = os.environ.get("TZ")
    yield
    if old is None:
        os.environ.pop("TZ", None)
    else:
        os.environ["TZ"] = old
    time.tzset()


def _from_internal_ok(v_seconds: int) -> bool:
    from pyspark.sql.types import TimestampType

    try:
        TimestampType().fromInternal(v_seconds * 1_000_000)
        return True
    except Exception:
        return False


def test_band_bounds_total_under_spot_zones(restore_tz):
    for tz in ZONES_SPOT:
        os.environ["TZ"] = tz
        time.tzset()
        assert _from_internal_ok(E.UNIX_SECONDS_MIN), tz
        assert _from_internal_ok(E.UNIX_SECONDS_MAX), tz


def test_r17_band_floor_was_leaky(restore_tz):
    """Regression witness: the retired 0001-01-02 floor crashes under a
    west-of-UTC OS zone — the reason the band widened."""
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    assert not _from_internal_ok(-62_135_510_400)


@pytest.mark.slow
def test_band_bounds_total_under_every_iana_zone(restore_tz):
    import zoneinfo

    bad = []
    for tz in sorted(zoneinfo.available_timezones()):
        os.environ["TZ"] = tz
        time.tzset()
        for v in (E.UNIX_SECONDS_MIN, E.UNIX_SECONDS_MAX):
            if not _from_internal_ok(v):
                bad.append((tz, v))
    assert not bad, bad[:10]
