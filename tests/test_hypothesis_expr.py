"""Hypothesis differential tests for the expression parsers.

The money/date/running-time parsers are regex batteries whose oracle
parity runs on FIXED corpora (testdata + the unit-test corpus). These
tests generate adversarial strings from a fragment grammar (partial
units, mixed separators, dashes, citations, stray digits) and compare
the Spark expressions against an INDEPENDENT python/re reference that
mirrors the reference pipeline's semantics (challenge.py:102-174) —
a third formulation, so a shared-regex-quirk bug class that both the
engine and its DuckDB oracle could replay gets an external check.

Batch pattern: each hypothesis example is a LIST of strings evaluated
in ONE Spark job (a per-string job would make shrinking unusable).
"""

from __future__ import annotations

import math
import os
import re
from datetime import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from movies_etl_spark.functions import expr as E

#: default 15 keeps CI fast; the per-round deep sweep (VERDICT r15 #3:
#: "zero new falsifying examples in a 10-minute Hypothesis run") sets
#: HYP_MAX_EXAMPLES=200 to push the fragment grammars much further.
_SETTINGS = dict(
    max_examples=int(os.environ.get("HYP_MAX_EXAMPLES", "15")),
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# ---------------------------------------------------------------------------
# independent python references (re module, not Spark, not DuckDB)
# ---------------------------------------------------------------------------

_RANGE_PY = re.compile(r"\$.*[-—–](?![a-z])")
_MONEY_PY = re.compile(
    r"\$\s*(\d+\.?\d*)\s*([mb])illi?on"
    r"|\$\s*(\d{1,3}(?:[,\.]\d{3})+)(?!\s[mb]illion)",
    re.I,
)


def _ref_money(s):
    if s is None:
        return None
    s = _RANGE_PY.sub("$", s)
    m = _MONEY_PY.search(s)
    if not m:
        return None
    if m.group(2):
        try:
            v = float(m.group(1))
        except ValueError:
            return None
        return v * (1e6 if m.group(2).lower() == "m" else 1e9)
    try:
        return float(m.group(3).replace(",", ""))
    except ValueError:
        return None


_DATE_PY = re.compile(
    f"({E.DATE_FORM_ONE})|({E.DATE_FORM_TWO})"
    f"|({E.DATE_FORM_THREE})|({E.DATE_FORM_FOUR})"
)
_DATE_FORMATS = ["%B %d, %Y", "%Y-%m-%d", "%B %Y", "%Y"]


def _ref_date(s):
    if s is None:
        return None
    m = _DATE_PY.search(s)
    if not m:
        return None
    for gi, fmt in enumerate(_DATE_FORMATS, start=1):
        g = m.group(gi)
        if g:
            try:
                return datetime.strptime(g, fmt).date()
            except ValueError:
                return None
    return None


_RT_PY = re.compile(E.RUNNING_TIME_PATTERN)


def _ref_running_time(s):
    if s is None:
        return None
    m = _RT_PY.search(s)
    g1 = g2 = g3 = 0.0
    if m:
        g1 = float(m.group(1)) if m.group(1) else 0.0
        g2 = float(m.group(2)) if m.group(2) else 0.0
        g3 = float(m.group(3)) if m.group(3) else 0.0
    return g3 if g3 != 0 else g1 * 60 + g2


# ---------------------------------------------------------------------------
# fragment grammars
# ---------------------------------------------------------------------------


def _frag_strings(fragments):
    return st.one_of(
        st.none(),
        st.lists(st.sampled_from(fragments), min_size=0, max_size=8).map(
            "".join
        ),
    )


_MONEY_FRAGS = [
    "$", " ", "1", "12", "123", "1234", ".5", ".", ",000", ",00", ".000",
    "million", "billion", "milion", "Million", "BILLION", "illion", "m",
    "b", "–", "-", "—", "-word", "[3]", "est.", "USD", " to ", "4,383",
    # leading-zero / long digit runs (same shape class that found the
    # year-0 date crash — VERDICT r15 #1): exercise float conversion and
    # the thousands-group regex on degenerate numerals.
    "0000", "00007", "000", ",0000", "0.000",
]
_DATE_FRAGS = [
    "July", "March", "December", "Smarch", " ", ",", "11", "39", "07",
    "1990", "2024", "-", ".", "x", "0", "3", "31, ", "1, ", "word",
    # degenerate-year shapes (VERDICT r15 #1: "00007" crashed the date
    # family via a year-0 parse): leading-zero runs, 5+ digit runs, and
    # the MINYEAR/MAXYEAR boundary years.
    "0000", "00007", "000", "0001", "9999", "99999", "00",
]
_RT_FRAGS = [
    "1", "02", "120", " ", "hour", "hours", "hr", "h", "ho",
    "minutes", "min", "m", ".", "approx", "x",
]


def _run_spark(spark, strings, expr_col):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "i long, s string"
    )
    rows = df.select("i", expr_col(F.col("s")).alias("v")).collect()
    return [r["v"] for r in sorted(rows, key=lambda r: r["i"])]


@settings(**_SETTINGS)
@given(batch=st.lists(_frag_strings(_MONEY_FRAGS), min_size=1, max_size=40))
def test_parse_money_matches_python_re(spark, batch):
    got = _run_spark(spark, batch, E.parse_money_column)
    for s, g in zip(batch, got):
        w = _ref_money(s)
        if w is None:
            assert g is None, (s, g)
        else:
            assert g is not None and math.isclose(g, w, rel_tol=1e-12), (s, g, w)


@settings(**_SETTINGS)
@given(batch=st.lists(_frag_strings(_DATE_FRAGS), min_size=1, max_size=40))
def test_parse_date_matches_python_strptime(spark, batch):
    got = _run_spark(spark, batch, E.parse_date_column)
    for s, g in zip(batch, got):
        assert g == _ref_date(s), (s, g, _ref_date(s))


#: adversarial epoch seconds: dense around the representability cliffs
#: (year-1/year-9999 band edges, the Long.MAX/1e6 JVM-overflow line)
#: plus full-range int64 — the F10 twin of the degenerate-year shapes.
_EPOCH_SECONDS = st.one_of(
    st.none(),
    st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1),
    st.integers(min_value=-(10**12), max_value=10**12),
    *[
        st.integers(min_value=edge - 3, max_value=edge + 3)
        for edge in (
            E.UNIX_SECONDS_MIN, E.UNIX_SECONDS_MAX,
            -62135596800, 253402300800, 9_223_372_036_854, -9_223_372_036_854,
        )
    ],
)


@settings(**_SETTINGS)
@given(batch=st.lists(_EPOCH_SECONDS, min_size=1, max_size=40))
def test_from_unix_seconds_total_on_int64(spark, batch):
    """F10 must be TOTAL over int64 (no JVM overflow abort, no
    fromInternal crash at collect): null outside the guarded band,
    exact UTC instant inside it."""
    from datetime import datetime, timedelta

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(batch)], "i long, v long"
    )
    rows = df.select(
        "i", E.from_unix_seconds(F.col("v")).alias("t")
    ).collect()
    got = [r["t"] for r in sorted(rows, key=lambda r: r["i"])]
    for v, t in zip(batch, got):
        if v is None or not (
            E.UNIX_SECONDS_MIN <= v <= E.UNIX_SECONDS_MAX
        ):
            assert t is None, (v, t)
        elif abs(v) <= 10**10:
            # modern band (~1653-2286): Spark's session-tz rendering and
            # the UTC arithmetic agree on any UTC-configured box; deep
            # past/future in-band values assert totality only (pre-1883
            # LMT rules differ between java.time and OS localtime).
            want = datetime(1970, 1, 1) + timedelta(seconds=v)
            assert t == want, (v, t, want)
        else:
            assert t is not None, (v, t)


#: adversarial epoch micros: dense around the representability cliffs
#: (the micros-band edges and the int64 extremes) plus full-range int64 —
#: the r17 micros twin of _EPOCH_SECONDS.
_EPOCH_MICROS = st.one_of(
    st.none(),
    st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1),
    st.integers(min_value=-(10**18), max_value=10**18),
    *[
        st.integers(min_value=edge - 3, max_value=edge + 3)
        for edge in (
            E.UNIX_MICROS_MIN, E.UNIX_MICROS_MAX,
            -62135596800 * 10**6, 253402300800 * 10**6,
        )
    ],
)


@settings(**_SETTINGS)
@given(batch=st.lists(_EPOCH_MICROS, min_size=1, max_size=40))
def test_from_unix_micros_total_on_int64(spark, batch):
    """from_unix_micros (r17: int64 timestamp transport across pandas
    kernels) must be TOTAL over int64: null outside the guarded band,
    exact UTC instant inside it (timestamp_micros is the identity into
    the internal, so no overflow flavor exists — only fromInternal
    representability at collect)."""
    from datetime import datetime, timedelta

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(batch)], "i long, v long"
    )
    rows = df.select(
        "i", E.from_unix_micros(F.col("v")).alias("t")
    ).collect()
    got = [r["t"] for r in sorted(rows, key=lambda r: r["i"])]
    for v, t in zip(batch, got):
        if v is None or not (E.UNIX_MICROS_MIN <= v <= E.UNIX_MICROS_MAX):
            assert t is None, (v, t)
        elif abs(v) <= 10**16:
            # modern band: same rendering caveat as the seconds twin
            want = datetime(1970, 1, 1) + timedelta(microseconds=v)
            assert t == want, (v, t, want)
        else:
            assert t is not None, (v, t)


#: cliff-dense (base date, day offset) pairs for bounded_date_add:
#: bases hug MINYEAR/MAXYEAR, offsets hug the exact crossing distances,
#: plus broad random pairs — the one derivation that maps in-range
#: inputs out of range.
_DATE_BASES = st.one_of(
    st.dates(),
    st.dates(min_value=__import__("datetime").date(1, 1, 1),
             max_value=__import__("datetime").date(1, 3, 1)),
    st.dates(min_value=__import__("datetime").date(9999, 10, 1),
             max_value=__import__("datetime").date(9999, 12, 31)),
)
_DATE_OFFSETS = st.one_of(
    st.integers(min_value=-100, max_value=100),
    st.integers(min_value=-(2**31) + 1, max_value=2**31 - 1),
)


@settings(**_SETTINGS)
@given(
    batch=st.lists(
        st.tuples(_DATE_BASES, _DATE_OFFSETS), min_size=1, max_size=40
    )
)
def test_bounded_date_add_total(spark, batch):
    """bounded_date_add must be total: collect never raises; the result
    equals python date + timedelta when that stays in [MINYEAR, MAXYEAR]
    and is null exactly when it crosses (independent oracle: datetime's
    own OverflowError)."""
    from datetime import date, timedelta

    def ref(d, k):
        try:
            return d + timedelta(days=k)
        except OverflowError:
            return None

    df = spark.createDataFrame(
        [(i, d, k) for i, (d, k) in enumerate(batch)], "i long, d date, k int"
    )
    rows = df.select(
        "i", E.bounded_date_add(F.col("d"), F.col("k")).alias("v")
    ).collect()
    got = [r["v"] for r in sorted(rows, key=lambda r: r["i"])]
    for (d, k), v in zip(batch, got):
        assert v == ref(d, k), (d, k, v, ref(d, k))


@settings(**_SETTINGS)
@given(batch=st.lists(_frag_strings(_RT_FRAGS), min_size=1, max_size=40))
def test_parse_running_time_matches_python_re(spark, batch):
    got = _run_spark(spark, batch, E.parse_running_time)
    for s, g in zip(batch, got):
        w = _ref_running_time(s)
        if w is None:
            assert g is None, (s, g)
        else:
            assert g is not None and math.isclose(g, w, rel_tol=1e-12), (s, g, w)


# ---------------------------------------------------------------------------
# extraction / cleanup expressions
# ---------------------------------------------------------------------------

_IMDB_PY = re.compile(r"(tt\d{7})")


def _ref_imdb(s):
    if s is None:
        return None
    m = _IMDB_PY.search(s)
    return m.group(1) if m else None


_CIT_PY = re.compile(r"\[\d+\]\s*")


def _ref_strip_citations(s):
    return None if s is None else _CIT_PY.sub("", s)


def _ref_strip_ranges(s):
    return None if s is None else _RANGE_PY.sub("$", s)


_IMDB_FRAGS = ["tt", "0120338", "123", "45678901", "/title/", "x", "t"]
_CIT_FRAGS = ["[", "]", "1", "23", " ", "\t", "word", "[4]", "[a]", "."]
_RANGE_FRAGS = [
    "$", "1.2", " ", "–", "-", "—", "million", "-word", "word", "\n", "$3",
]


@settings(**_SETTINGS)
@given(batch=st.lists(_frag_strings(_IMDB_FRAGS), min_size=1, max_size=40))
def test_extract_imdb_id_matches_python_re(spark, batch):
    got = _run_spark(spark, batch, E.extract_imdb_id)
    assert got == [_ref_imdb(s) for s in batch], batch


@settings(**_SETTINGS)
@given(batch=st.lists(_frag_strings(_CIT_FRAGS), min_size=1, max_size=40))
def test_strip_citations_matches_python_re(spark, batch):
    got = _run_spark(spark, batch, E.strip_citations)
    assert got == [_ref_strip_citations(s) for s in batch], batch


@settings(**_SETTINGS)
@given(batch=st.lists(_frag_strings(_RANGE_FRAGS), min_size=1, max_size=40))
def test_strip_money_ranges_matches_python_re(spark, batch):
    got = _run_spark(spark, batch, E.strip_money_ranges)
    assert got == [_ref_strip_ranges(s) for s in batch], batch


# ---------------------------------------------------------------------------
# mixed string-or-array cell normalization
# ---------------------------------------------------------------------------

import json as _json


def _ref_mixed_cell(s):
    """Reference semantics for string-element JSON arrays (the grammar
    below emits only string elements / malformed shapes — numeric or
    nested elements exercise Jackson-specific text capture that the
    python json module cannot mirror, and the corpus never produces
    them). raw_decode, not loads: Spark's from_json parses the FIRST
    JSON value and ignores trailing text (found by this very test —
    '[..][..]' normalizes to the first array's join, where strict
    json.loads would reject the whole cell)."""
    if s is None or not s.startswith("["):
        return s
    try:
        v, _ = _json.JSONDecoder().raw_decode(s)
    except ValueError:
        return s
    if not isinstance(v, list) or any(
        x is not None and not isinstance(x, str) for x in v
    ):
        return s
    joined = " ".join(x for x in v if x is not None)
    return joined if joined != "" else s


_MIXED_FRAGS = [
    '["May 17, 1990","(","1990-05-17",")"]', '["a","b"]', "[", "]", '"a"',
    ",", "plain scalar", " ", "[]", '["",""]', '["x"', "[null]", '[null,"y"]',
]


def _has_nonstring_elements(s):
    """True for JSON arrays holding nested/numeric elements — the
    out-of-corpus shapes where Spark's Jackson parser text-captures the
    element (from_json(.., array<string>) turns a nested array into its
    raw JSON text) while python's json module cannot mirror that. The
    operator docstring pins these as out of contract; fragment
    concatenation can still construct them (hypothesis found
    '[["a","b"]]'), so the documented skip must be enforced, not just
    stated."""
    if s is None or not s.startswith("["):
        return False
    try:
        v, _ = _json.JSONDecoder().raw_decode(s)
    except ValueError:
        return False
    return isinstance(v, list) and any(
        x is not None and not isinstance(x, str) for x in v
    )


@settings(**_SETTINGS)
@given(batch=st.lists(_frag_strings(_MIXED_FRAGS), min_size=1, max_size=40))
def test_normalize_mixed_cell_matches_python_json(spark, batch):
    from movies_etl_spark.operators.normalize import normalize_mixed_cell

    got = _run_spark(spark, batch, normalize_mixed_cell)
    for s, g in zip(batch, got):
        # skip inputs with non-string JSON elements the reference can't
        # mirror (see _has_nonstring_elements)
        if _has_nonstring_elements(s):
            continue
        assert g == _ref_mixed_cell(s), (s, g, _ref_mixed_cell(s))


# ---------------------------------------------------------------------------
# connected-components union-find (r13 local path) vs brute-force closure
# ---------------------------------------------------------------------------


def _ref_components(edges):
    """Brute-force reference: repeated relaxation of min-label over the
    bidirectional closure — a structurally different formulation from
    _components_local's union-find (no parent forest, no path
    compression), so a union-find bug cannot be replayed here."""
    nodes = {n for e in edges for n in e}
    label = {n: n for n in nodes}
    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    changed = True
    while changed:
        changed = False
        for n in nodes:
            m = min([label[n]] + [label[x] for x in adj[n]])
            if m < label[n]:
                label[n] = m
                changed = True
    return sorted(label.items())


@settings(max_examples=200, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=80,
    )
)
def test_components_local_matches_bruteforce_closure(edges):
    """The r13 driver-side union-find (dedup._components_local) must
    label every node with its component's MINIMUM member id — asserted
    against an independent brute-force min-label relaxation over
    arbitrary random multigraphs (self-loops, duplicate and reversed
    edges, long chains included by construction). Pure python on both
    sides: 200 examples cost milliseconds, complementing the
    Spark-level local-vs-distributed parity test."""
    from movies_etl_spark.operators.dedup import _components_local

    assert _components_local(edges) == _ref_components(edges)
