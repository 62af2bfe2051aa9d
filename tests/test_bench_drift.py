"""Unit witnesses for bench.py's drift-guard decision logic (ADVICE
r9): symmetric triggering and closer-to-1.0 retry acceptance. Pure
functions — no SparkSession."""

from __future__ import annotations

import bench


def test_retry_triggers_on_slow_and_fast_spikes():
    assert bench._drift_should_retry(1.6)
    assert bench._drift_should_retry(0.5)  # spiked-fast reading
    assert not bench._drift_should_retry(1.25)
    assert not bench._drift_should_retry(0.8)  # 1/1.3 ≈ 0.769 < 0.8
    assert not bench._drift_should_retry(1.0)
    assert not bench._drift_should_retry(None)
    # the r12 case that motivated tightening 1.5 → 1.3: a 0.714 battery
    # (hot page cache on the probe fixtures) passed the old band while
    # raw query times matched the previous clean capture — must re-probe
    assert bench._drift_should_retry(0.714)
    assert bench._drift_should_retry(1.35)


def test_retry_accepted_only_when_closer_to_one():
    # classic contended-then-recovered: adopt
    assert bench._drift_accept_retry(2.0, 1.1)
    # retry undershoots past 1.0 by MORE than the original overshot:
    # lower, but a worse normalization factor — reject (the ADVICE case)
    assert not bench._drift_accept_retry(1.6, 0.3)
    # undershoot smaller than the overshoot: adopt
    assert bench._drift_accept_retry(1.6, 0.9)
    # equal distance: keep the first (no churn without improvement)
    assert not bench._drift_accept_retry(1.5, 0.5)
    assert not bench._drift_accept_retry(1.6, None)
    assert not bench._drift_accept_retry(None, 1.0)


def test_drift_median_of_ratios():
    ref = {"a": 1.0, "b": 2.0, "c": 4.0, "extra_ref_only": 9.0}
    now = {"a": 1.1, "b": 2.0, "c": 8.0, "extra_now_only": 3.0}
    # ratios over shared keys: 1.1, 1.0, 2.0 -> median 1.1
    assert bench._drift_vs_ref(ref, now) == 1.1
    assert bench._drift_vs_ref({}, now) is None


def test_suite_drift_is_median_raw_over_pin():
    """The r13 authoritative estimator (VERDICT r12 #2), pinned with the
    round's motivating values: the r12 driver capture's 5-probe battery
    read 0.783 while the suite-wide raw/pin median read 0.922 — an 18%
    disagreement that inflated every normalized ratio ~1.28× and put 43
    false names over the 1.2 bar. The suite median must win whenever
    enough pins exist, and normalizing by it puts the median per-query
    ratio at exactly 1.0 (self-consistent by construction)."""
    ref = {f"q{i}": 2.0 for i in range(30)}
    # every query runs at 0.922× its pin — the r12 suite-wide reading
    timings = {q: round(0.922 * v, 6) for q, v in ref.items()}
    suite = bench._suite_drift(timings, ref)
    assert suite == 0.922
    # the contaminated battery reading must NOT be applied
    drift, source = bench._pick_drift(0.783, suite)
    assert (drift, source) == (0.922, "suite_median")
    # normalized ratio of an untouched query is exactly 1.0
    assert round(timings["q0"] / drift / ref["q0"], 3) == 1.0

    # below the pin floor the battery is the only estimator left
    few = {"q0": 1.844}
    assert bench._suite_drift(few, ref) is None
    assert bench._pick_drift(0.783, None) == (0.783, "battery")
    assert bench._pick_drift(None, None) == (None, "none")


def test_suite_drift_robust_to_rewritten_queries():
    """A round's handful of intentionally-faster rewrites must not drag
    the estimator: the median over the pinned majority holds even when
    several queries moved 2× in either direction."""
    ref = {f"q{i}": 1.0 for i in range(25)}
    timings = {q: 1.0 for q in ref}
    timings["q0"] = 0.5   # this round's cut
    timings["q1"] = 0.45  # another cut
    timings["q2"] = 2.1   # a regression under watch
    assert bench._suite_drift(timings, ref) == 1.0
    # unpinned names never enter the median
    timings["brand_new_query"] = 99.0
    assert bench._suite_drift(timings, ref) == 1.0


def test_contended_segment_detector():
    """r13: suite-order-localized contention (captures C/D/E) took a
    hand adjudication per capture; the detector must flag a contiguous
    hot block, report its boundaries, ignore scattered singles (the
    ordinary pin-noise regime), skip unpinned names without breaking a
    span, and read None on a clean capture."""
    order = [f"q{i}" for i in range(30)]
    clean = {q: 0.95 for q in order}
    assert bench._contended_segments(order, clean) is None
    assert bench._contended_segments(order, None) is None

    # a contiguous 6-name hot block mid-suite (the capture-E shape)
    hot = dict(clean)
    for i in range(10, 16):
        hot[f"q{i}"] = 1.5
    spans = bench._contended_segments(order, hot)
    assert spans and len(spans) == 1
    assert spans[0]["first"] == "q10" and spans[0]["last"] == "q15"
    assert spans[0]["n_hot"] == 6 and spans[0]["median_hot"] == 1.5

    # scattered singles (pin noise) must NOT flag
    noisy = dict(clean)
    for i in (2, 9, 17, 25):
        noisy[f"q{i}"] = 1.4
    assert bench._contended_segments(order, noisy) is None

    # unpinned names interleaved in the hot block don't break the span
    gappy = dict(hot)
    del gappy["q12"]  # q12 has no pin at all
    spans = bench._contended_segments(order, gappy)
    assert spans and spans[0]["n_hot"] == 5
    assert spans[0]["first"] == "q10" and spans[0]["last"] == "q15"


def test_post_battery_is_diagnostic_only():
    """The post-suite battery must never reach the normalization
    factor: it is warm-biased vs the cold-pinned reference (a clean
    r10 run measured 0.45× from JIT + page cache alone), so folding it
    in inflates every normalized number. Pin the contract structurally:
    no combined-drift helper exists, and the post/pre diagnostic rides
    the ordinary median-of-ratios helper against the PRE battery."""
    assert not hasattr(bench, "_combined_drift")
    pre = {"scan": 1.0, "shuffle": 2.0}
    post = {"scan": 0.5, "shuffle": 1.0}
    assert bench._drift_vs_ref(pre, post) == 0.5  # the clean warm shape


def test_ratios_vs_ref_pins_untouched_queries_at_one():
    """The per-query reference column (VERDICT r10 #6): an untouched
    query's drift-normalized value divided by its own pin reads ~1.0
    regardless of the suite-level drift factor; queries without a pin
    are LISTED, never silently dropped; and a missing/empty ref
    degrades to (None, all-names) instead of raising."""
    ref = {"q_fast": 0.5, "q_slow": 8.0, "q_zero": 0.0}
    normalized = {"q_fast": 0.52, "q_slow": 10.0, "q_new": 1.2, "q_zero": 1.0}
    ratios, unpinned = bench._ratios_vs_ref(normalized, ref)
    assert ratios == {"q_fast": 1.04, "q_slow": 1.25}
    # q_new has no pin; q_zero's pin is degenerate — both surfaced
    assert unpinned == ["q_new", "q_zero"]

    assert bench._ratios_vs_ref(None, ref) == (None, [])
    assert bench._ratios_vs_ref(normalized, {}) == (
        None,
        sorted(normalized),
    )


def test_query_reference_loads_pinned_file():
    """BENCH_QUERY_REF.json must load as (medians, 'pinned') at HEAD —
    the committed pin backs the ratio column the NOTES watch-list
    adjudications read."""
    ref, source = bench._query_reference()
    assert source == "pinned"
    assert len(ref) >= 90
    assert all(isinstance(v, (int, float)) and v > 0 for v in ref.values())

def test_query_ref_generator_rejects_small_sf_captures():
    """tools/gen_query_ref.py must refuse to blend non-sf0.1 captures
    into the pinned medians: a committed small-SF BENCH_DETAIL smoke
    capture carries 10-100x smaller timings, and one admitted blob
    would drag every pin down — turning every untouched query into a
    phantom regression on the next run (review catch, r11)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "gen_query_ref",
        os.path.join(os.path.dirname(__file__), "..", "tools", "gen_query_ref.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    good = {"sf": 0.1, "queries_normalized": {"q": 1.0}}
    smoke = {"sf": 0.01, "queries_normalized": {"q": 0.02}}
    legacy_no_sf = {"queries_normalized": {"q": 1.0}}
    no_map = {"sf": 0.1}
    # r14 continuation: a detector-flagged contended capture stays
    # committed as evidence but must not mint pins — its hot names
    # price ambient load, not code (capture K: a 12-name median-1.33
    # block read one query at 3.2x that probed 0.6-0.7x clean).
    contended = {
        "sf": 0.1,
        "queries_normalized": {"q": 1.0},
        "contended_segments": [
            {"first": "a", "last": "b", "median_hot": 1.33, "n_hot": 12}
        ],
    }
    clean_empty_segments = {
        "sf": 0.1,
        "queries_normalized": {"q": 1.0},
        "contended_segments": [],
    }
    # r18: a UNIFORMLY contended capture has no localized segment for
    # the detector to flag — the contention booleans are the only
    # instrument that catches it (capture B: wall 340s vs 185 clean,
    # zero segments, both booleans TRUE, names up to 11.9x) — and it
    # must not mint either.
    battery_flagged = {
        "sf": 0.1,
        "queries_normalized": {"q": 1.0},
        "battery_contention_suspected": True,
    }
    midsuite_flagged = {
        "sf": 0.1,
        "queries_normalized": {"q": 1.0},
        "mid_suite_contention_suspected": True,
    }
    clean_false_booleans = {
        "sf": 0.1,
        "queries_normalized": {"q": 1.0},
        "battery_contention_suspected": False,
        "mid_suite_contention_suspected": False,
    }
    assert mod.capture_ok(good)
    assert not mod.capture_ok(smoke)
    assert not mod.capture_ok(legacy_no_sf)
    assert not mod.capture_ok(no_map)
    assert not mod.capture_ok(contended)
    assert mod.capture_ok(clean_empty_segments)
    assert not mod.capture_ok(battery_flagged)
    assert not mod.capture_ok(midsuite_flagged)
    assert mod.capture_ok(clean_false_booleans)

def test_shared_cli_parser():
    """tools/_cli.parse_args — the one flag-parsing loop the three
    diagnostic tools share (r11 consolidated three hand-rolled copies
    that had each needed the same guard fixes individually)."""
    import importlib.util
    import os

    import pytest

    spec = importlib.util.spec_from_file_location(
        "_cli", os.path.join(os.path.dirname(__file__), "..", "tools", "_cli.py")
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    flags = {"--top": int, "--dry-run": cli.BOOL}
    vals, pos = cli.parse_args(
        ["--top", "3", "a", "b"], flags, "u", positionals=True
    )
    assert vals == {"top": 3} and pos == ["a", "b"]
    vals, pos = cli.parse_args(["--top=7", "--dry-run"], flags, "u")
    assert vals == {"top": 7, "dry-run": True} and pos == []
    # exact-match only: '--topology' is NOT '--top' (the ADVICE r10 bug)
    with pytest.raises(SystemExit):
        cli.parse_args(["--topology"], flags, "u")
    with pytest.raises(SystemExit):  # missing value
        cli.parse_args(["--top"], flags, "u")
    with pytest.raises(SystemExit):  # bool flag takes no value
        cli.parse_args(["--dry-run=x"], flags, "u")
    with pytest.raises(SystemExit):  # positionals rejected by default
        cli.parse_args(["stray"], flags, "u")


def test_contention_boolean_ors_segment_detector():
    """VERDICT r13 #2: the driver's r13 capture shipped
    `mid_suite_contention_suspected: false` (battery post/pre heuristic)
    two fields from a detector-flagged 32-name median-1.58 segment — a
    consumer reading only the boolean called the capture clean. The
    headline boolean is now `_battery_contention(post_over_pre) or
    bool(contended_segments)`; the battery heuristic stays as a
    separately named diagnostic. Reproduce the capture's shape: 94
    names, 32 contiguous hot (positions 33–64), clean tails, battery
    post/pre in the clean band."""
    order = [f"q{i}" for i in range(94)]
    ratios = {q: 0.95 for q in order}
    for i in range(33, 65):
        ratios[f"q{i}"] = 1.58
    spans = bench._contended_segments(order, ratios)
    assert spans and spans[0]["n_hot"] == 32
    # the r13 capture's battery heuristic read clean (post/pre ~0.36)
    assert not bench._battery_contention(0.36)
    # the OR'd headline boolean must flag anyway
    assert bench._battery_contention(0.36) or bool(spans)
    # and the battery heuristic still fires on its own shape
    assert bench._battery_contention(1.1)
    assert not bench._battery_contention(None)


def test_wall_excluding_contended():
    """VERDICT r13 What's-wrong #2: on a segment-contended capture the
    suite-median drift under-corrects both halves by construction, so
    the artifact now carries the comparable residue — the sum of
    per-query timings OUTSIDE the flagged spans. Every name positioned
    inside a span's [first..last] range is excluded, pinned or not
    (contention hits by wall-clock position, not pin status)."""
    order = [f"q{i}" for i in range(20)]
    timings = {q: 1.0 for q in order}
    ratios = {q: 0.95 for q in order}
    for i in range(5, 11):
        ratios[f"q{i}"] = 1.6
    # q7 unpinned (mid-span) — must still be excluded by position
    del ratios["q7"]
    spans = bench._contended_segments(order, ratios)
    assert spans and spans[0]["first"] == "q5" and spans[0]["last"] == "q10"
    wall, n_excl = bench._wall_excluding_contended(order, timings, spans)
    assert n_excl == 6  # q5..q10 inclusive, including unpinned q7
    assert wall == 14.0  # 20 names at 1.0 s minus the 6 excluded
    # clean capture: no spans -> null field, zero excluded
    assert bench._wall_excluding_contended(order, timings, None) == (None, 0)


def test_suite_drift_anomaly_warning():
    """VERDICT r14 #1: the flag is DIRECTIONAL — only the
    suite-slow/battery-clean shape (the one a suite-wide code
    regression produces) fires. Each observed r14 capture shape is
    encoded below with its committed numbers; the r14 symmetric form
    fired on all eight clean captures (pin lag + fast ambient) and
    none of them may fire now."""
    # synthetic suite-wide code regression: suite slow 1.3, battery
    # clean 1.0 -> FIRES (the only shape that should)
    assert bench._suite_drift_anomaly(1.0, 1.3)
    # r14 captures B/E (battery ~1.03, suite ~0.85): suite FAST vs
    # stale pins, battery flat — pin lag + fast ambient, a shape a
    # code regression cannot produce -> silent
    assert not bench._suite_drift_anomaly(1.03, 0.85)
    # r14 captures F-I/J/M (battery ~1.0, suite 0.83-0.91) -> silent
    assert not bench._suite_drift_anomaly(1.0, 0.83)
    assert not bench._suite_drift_anomaly(0.98, 0.91)
    # r14 capture D (battery 0.938, suite 0.945 agreeing) -> silent
    assert not bench._suite_drift_anomaly(0.938, 0.945)
    # r14 captures K/L (genuine mid-suite contention): ambient moves
    # battery and suite together -> silent here, the SEGMENT detector
    # carries the signal for order-localized contention
    assert not bench._suite_drift_anomaly(1.35, 1.3)
    # clean capture: both ~1.0 -> silent
    assert not bench._suite_drift_anomaly(0.98, 1.02)
    # r12 motivating capture: battery 0.783 vs suite 0.922 — suite
    # within the band of 1.0, so the (correct) suite normalization is
    # NOT an anomaly even though the battery was contaminated
    assert not bench._suite_drift_anomaly(0.783, 0.922)
    # suite slow but battery slower (front-loaded ambient that cleared
    # before the post battery ran backwards? no — battery elevated
    # ABOVE suite means ambient, not code) -> silent
    assert not bench._suite_drift_anomaly(1.5, 1.3)
    # suite slow AND well above an only-mildly-elevated battery: the
    # suite moved beyond what ambient explains -> fires
    assert bench._suite_drift_anomaly(1.1, 1.3)
    assert not bench._suite_drift_anomaly(None, 1.3)
    assert not bench._suite_drift_anomaly(1.0, None)


def test_settle_probe_slow_side_only():
    """r16 pre-suite settle: waits trigger ONLY on a hot box (adopted
    drift > SETTLE_DRIFT_THRESHOLD) — the shapes that burned captures
    D/E/F (3.24, 2.30, 3.94 batteries) wait; a clean or FAST box never
    delays the suite; the wait budget is bounded."""
    assert bench._settle_should_wait(3.24)
    assert bench._settle_should_wait(2.30)
    assert bench._settle_should_wait(1.51)
    assert not bench._settle_should_wait(1.5)
    assert not bench._settle_should_wait(1.0)
    # fast box: suite starts immediately (fast batteries never hurt it)
    assert not bench._settle_should_wait(0.5)
    assert not bench._settle_should_wait(None)
    assert bench.SETTLE_MAX_WAITS * bench.SETTLE_WAIT_SEC <= 120


def test_anomaly_code_possible_auto_adjudication():
    """r16 (captures D/H, both ambient fires at unchanged engine code):
    a proven fingerprint match adjudicates a fire as not-code; unknown
    identity (dirty tree / pre-r16 pin) stays conservative; silent
    anomaly emits null."""
    fp = "aaaa-bbbb"
    assert bench._anomaly_code_possible(True, fp, fp) is False
    assert bench._anomaly_code_possible(True, "cccc-dddd", fp) is True
    assert bench._anomaly_code_possible(True, None, fp) is True
    assert bench._anomaly_code_possible(True, fp, None) is True
    assert bench._anomaly_code_possible(False, fp, fp) is None
    assert bench._anomaly_code_possible(False, None, None) is None


def test_engine_fingerprint_stable_on_clean_tree():
    """On a clean checkout the fingerprint is deterministic (two calls
    agree) and has the tree-blob two-part shape; a dirty engine tree
    would return None, which the caller treats as unknown."""
    a = bench._engine_fingerprint()
    b = bench._engine_fingerprint()
    assert a == b
    if a is not None:
        assert len(a.split("-")) == 2


def test_pin_fingerprint_provenance():
    """ADVICE r16 medium + VERDICT r16 #5: the pin's engine_fingerprint
    must be PROVEN, not asserted — stamped only when every admitted
    capture carries HEAD's fingerprint (a pin minted after an engine
    change from older-code captures must stamp null, else the anomaly
    rider can return a definitive 'provably not code' on a real code
    regression); a dirty-tree mint (head None) is refused outright."""
    import importlib.util
    import os

    import pytest

    spec = importlib.util.spec_from_file_location(
        "gen_query_ref",
        os.path.join(os.path.dirname(__file__), "..", "tools", "gen_query_ref.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fp = "aaaa-bbbb"
    # proven: every admitted capture ran on HEAD's code
    assert mod.pin_fingerprint(fp, [fp, fp, fp]) == fp
    # any capture on different/unknown code -> null (conservative rider)
    assert mod.pin_fingerprint(fp, [fp, "cccc-dddd", fp]) is None
    assert mod.pin_fingerprint(fp, [fp, None, fp]) is None  # pre-r17 blob
    # no admitted captures at all -> nothing proven -> null
    assert mod.pin_fingerprint(fp, []) is None
    # dirty-tree mint is a hard refusal, never a silent null stamp
    with pytest.raises(SystemExit):
        mod.pin_fingerprint(None, [fp])


def test_suite_fast_split_informational():
    """ADVICE r15 #2: the suite-FAST split the directional re-spec made
    silent stays machine-visible as a separate INFORMATIONAL field —
    it must never coincide with the anomaly flag (disjoint directions)."""
    # r14 capture-B shape: battery flat, suite fast -> fast-split true
    assert bench._suite_fast_split(1.03, 0.85)
    assert bench._suite_fast_split(1.0, 0.83)
    # agreeing drifts (clean or ambient) -> false
    assert not bench._suite_fast_split(0.938, 0.945)
    assert not bench._suite_fast_split(1.35, 1.3)
    assert not bench._suite_fast_split(0.98, 1.02)
    # the anomaly (suite-slow) direction -> false here, true there
    assert not bench._suite_fast_split(1.0, 1.3)
    assert bench._suite_drift_anomaly(1.0, 1.3)
    # missing inputs -> false
    assert not bench._suite_fast_split(None, 0.8)
    assert not bench._suite_fast_split(1.0, None)
    # disjointness: no (battery, suite) pair can set both flags
    for b in (0.8, 0.9, 1.0, 1.1, 1.3, 1.5):
        for s in (0.8, 0.9, 1.0, 1.1, 1.3, 1.5):
            assert not (
                bench._suite_fast_split(b, s)
                and bench._suite_drift_anomaly(b, s)
            ), (b, s)
