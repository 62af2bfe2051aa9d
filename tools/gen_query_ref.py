#!/usr/bin/env python
"""Regenerate BENCH_QUERY_REF.json — per-query pinned reference medians.

VERDICT r10 #6: the scalar suite-level drift factor is the only
correction bench.py applies, and on fast-box captures (pre-drift
0.74–0.80) it makes untouched sub-second queries read as ~1.46×
phantom "regressions" — calibration artifacts, not code. The fix is a
PER-QUERY reference: pin each query's median drift-normalized seconds
over the most recent committed BENCH_DETAIL.json captures, and have
bench.py emit each run's per-query ratio against that pin
(queries_ratio_vs_ref). An untouched query then reads ~1.0 regardless
of the box the capture ran on, and a real regression reads as its own
ratio instead of riding the suite scalar.

Medians are taken over the last ``--captures N`` (default 5) committed
BENCH_DETAIL.json blobs in git history — recent enough to reflect
HEAD-era implementations (r10 rewrote several queries; a full-history
median would pin retired code's cost), wide enough to damp single-
capture noise. Like BENCH_CAL_REF.json, the output is PINNED: bench.py
only reads it, and it is refreshed deliberately (rerun this tool) when
a query's implementation intentionally changes cost, with the refresh
noted in the round's NOTES ledger.

Usage: python tools/gen_query_ref.py [--captures N] [--dry-run]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_QUERY_REF.json")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _cli  # noqa: E402  (tools/_cli.py — shared flag parsing)


def capture_ok(d: dict) -> bool:
    """Admit a committed BENCH_DETAIL blob into the pin medians only if
    it carries a per-query map AND is an sf0.1 capture: a committed
    small-SF smoke capture (the workflow notes warn BENCH_DETAIL can be
    overwritten by one) carries 10-100x smaller timings and would
    silently drag every median down, making every untouched query read
    as a large phantom regression — the exact artifact class this tool
    exists to kill (review catch, r11).

    Segment-flagged captures are also excluded (r14 continuation): a
    capture with a detector-flagged contended block carries hot names
    whose normalized timings price ambient load, not code — r14's
    capture K read minhash_jaccard_estimate at 3.2x inside a 12-name
    median-1.33 block while the same query probed 0.6-0.7x on four
    clean captures. Such captures stay committed as evidence; they
    just don't mint pins. (Suite-median drift under-corrects a bimodal
    capture by construction — the r13 VERDICT's reading — so exclusion,
    not normalization, is the right treatment here.)"""
    if not (bool(d.get("queries_normalized")) and d.get("sf") == 0.1):
        return False
    if d.get("contended_segments"):
        print(
            "skipping segment-flagged capture "
            f"(contended_segments={d['contended_segments']!r:.80})",
            file=sys.stderr,
        )
        return False
    # Boolean-flagged captures are excluded too (r18): a UNIFORMLY
    # contended capture has no localized hot block for the segment
    # detector to find — r18's capture B ran the whole suite under
    # external load (wall 340 s vs 185 clean, battery + mid-suite
    # booleans both TRUE, zero segments) and suite-median normalization
    # absorbed the uniform part while individual names still read up to
    # 11.9x. The booleans are the instrument that caught it; admitting
    # the capture anyway would have minted dedup_cc_distributed's first
    # pin at 18.2 s vs its 3.5 s clean floor.
    if d.get("battery_contention_suspected") or d.get(
        "mid_suite_contention_suspected"
    ):
        print(
            "skipping contention-flagged capture (battery="
            f"{d.get('battery_contention_suspected')}, mid_suite="
            f"{d.get('mid_suite_contention_suspected')})",
            file=sys.stderr,
        )
        return False
    return True


def collect(
    n_captures: int,
) -> tuple[dict[str, float], int, list[str | None]]:
    hashes = subprocess.check_output(
        ["git", "log", "--format=%H", "--", "BENCH_DETAIL.json"],
        text=True,
        cwd=REPO,
    ).split()
    per_query: dict[str, list[float]] = {}
    capture_fps: list[str | None] = []
    used = 0
    for h in hashes:
        if used >= n_captures:
            break
        try:
            blob = subprocess.check_output(
                ["git", "show", f"{h}:BENCH_DETAIL.json"],
                text=True,
                cwd=REPO,
            )
            d = json.loads(blob)
        except (subprocess.CalledProcessError, json.JSONDecodeError):
            continue
        if not capture_ok(d):
            continue
        used += 1
        capture_fps.append(d.get("engine_fingerprint"))
        for q, v in d["queries_normalized"].items():
            per_query.setdefault(q, []).append(float(v))
    return (
        {q: round(statistics.median(v), 3) for q, v in sorted(per_query.items())},
        used,
        capture_fps,
    )


def pin_fingerprint(
    head_fp: str | None, capture_fps: list[str | None]
) -> str | None:
    """Engine identity to stamp into the pin file — PROVEN or null
    (ADVICE r16 medium + VERDICT r16 #5).

    The pin's fingerprint attests "these medians price THIS code": the
    anomaly rider (bench._anomaly_code_possible) returns a definitive
    'provably not code' on a fingerprint match, so a pin minted after
    an engine change from captures that ran on OLDER code must not
    carry HEAD's fingerprint — that is exactly the false negative the
    rider exists to prevent. Stamp head_fp only when every admitted
    capture carries its own engine_fingerprint (r17+ captures) AND all
    of them equal HEAD; otherwise null, which keeps the rider on its
    conservative True path.

    A dirty-tree mint (head_fp None) is a HARD error, not a null stamp:
    the medians would attest code that exists nowhere in history, and
    the silent-null would permanently disable the rider for the pin's
    lifetime without anyone choosing that."""
    if head_fp is None:
        raise SystemExit(
            "refusing to mint pins with unknown engine identity: "
            "bench._engine_fingerprint() is None (movies_etl_spark/ or "
            "bench.py dirty in the working tree, or git unavailable) — "
            "commit the engine state first, then re-mint"
        )
    if capture_fps and all(fp == head_fp for fp in capture_fps):
        return head_fp
    print(
        "pin fingerprint stamped null: "
        f"{sum(1 for fp in capture_fps if fp != head_fp)}/"
        f"{len(capture_fps)} admitted captures lack a matching "
        "engine_fingerprint (pre-r17 captures carry none; others ran "
        "on different code) — the anomaly rider stays conservative",
        file=sys.stderr,
    )
    return None


def main() -> None:
    vals, _ = _cli.parse_args(
        sys.argv[1:],
        {"--captures": int, "--dry-run": _cli.BOOL},
        "usage: gen_query_ref.py [--captures N] [--dry-run]",
    )
    n = vals.get("captures", 5)
    dry = vals.get("dry-run", False)
    meds, used, capture_fps = collect(n)
    sys.path.insert(0, REPO)
    import bench  # noqa: E402  (repo-root bench.py — shared fingerprint)

    out = {
        "source": (
            "median drift-normalized seconds per query over the most "
            f"recent {used} committed BENCH_DETAIL.json captures "
            "(tools/gen_query_ref.py; pinned — refresh deliberately)"
        ),
        "n_captures": used,
        # engine identity the medians PROVABLY price (r17, ADVICE r16):
        # bench.py compares its own fingerprint against this when the
        # directional anomaly fires — a proven match auto-adjudicates
        # the fire as ambient. Stamped only when every admitted capture
        # carries HEAD's fingerprint; null otherwise (see
        # pin_fingerprint). A dirty-tree mint is refused outright.
        "engine_fingerprint": pin_fingerprint(
            bench._engine_fingerprint(), capture_fps
        ),
        "medians_sec": meds,
    }
    if dry:
        print(json.dumps(out, indent=1, sort_keys=True))
        return
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(meds)} queries from {used} captures")


if __name__ == "__main__":
    main()
