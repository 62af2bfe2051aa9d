"""Text-analysis operators for large-scale training-data pipelines
(north star, BASELINE.json): language-ID, quality scoring, token counting,
document fingerprinting — all as NATIVE column expressions (no Python in
the hot path; at 100 TB these run inside whole-stage codegen over the
documents fact table with zero shuffles — they are pure map operators).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist"],
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "les"],
    "zh": ["的", "是", "了", "在", "我"],
}

ROLLING_HASH_MOD = 1_000_000_007
ROLLING_HASH_BASE = 31


def tokens(c: Column) -> Column:
    """Whitespace tokenization (single-space corpus contract)."""
    return F.split(c, " ")


def token_count_ws(c: Column) -> Column:
    """Token count, whitespace split."""
    return F.size(tokens(c))


def token_count_regex(c: Column) -> Column:
    """BPE-ish token count: runs of letters | runs of digits | any other
    non-space symbol, one token each (the regex analog of byte-pair
    pre-tokenization)."""
    return F.size(F.regexp_extract_all(c, F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))


def stopword_hits(toks: Column, stopwords: list[str]) -> Column:
    """Number of tokens that are stopwords (not distinct — frequency)."""
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def avg_token_len(c: Column) -> Column:
    """(chars - separators) / tokens, rounded to 4."""
    n_chars = F.length(c)
    n_toks = token_count_ws(c)
    return F.round((n_chars - (n_toks - 1)).cast("double") / n_toks.cast("double"), 4)


def quality_score(c: Column) -> Column:
    """Composite quality score in [0,1]: length credit (saturates at 100
    tokens), stopword-ratio credit, short-token credit. The exact formula
    is arbitrary by design — what matters at scale is that it is a pure
    codegen expression evaluated in one pass."""
    n_toks = token_count_ws(c).cast("double")
    stop_ratio = (
        stopword_hits(tokens(c), LANG_STOPWORDS["en"]).cast("double") / n_toks
    )
    atl = avg_token_len(c)
    score = (
        F.least(n_toks / F.lit(100.0), F.lit(1.0)) * 0.5
        + stop_ratio * 0.3
        + (F.lit(1.0) / atl) * 0.2
    )
    return F.round(score, 4)


def lang_scores(c: Column) -> dict[str, Column]:
    """Stopword-hit score per language."""
    toks = tokens(c)
    return {
        lang: stopword_hits(toks, sw).cast("int") for lang, sw in LANG_STOPWORDS.items()
    }


def lang_id(c: Column) -> Column:
    """Predicted language = argmax of stopword hits, ties broken by
    language code ascending (deterministic; mirrors a CASE chain so the
    SQL oracle states the identical logic)."""
    scores = lang_scores(c)
    m = F.greatest(*scores.values())
    out = F.lit(None).cast("string")
    # build the CASE in reverse-alphabetical order so the earliest
    # alphabetical winner ends up outermost
    for lang in sorted(scores.keys(), reverse=True):
        out = F.when(scores[lang] == m, F.lit(lang)).otherwise(out)
    return out


def token_hash(tok: Column) -> Column:
    """48-bit integer hash of a token via md5-hex prefix — identical in
    any engine with md5 (the cross-engine-stable alternative to
    xxhash/murmur whose seeds differ per engine)."""
    return F.conv(F.substring(F.md5(tok), 1, 12), 16, 10).cast("long")


def rolling_hash(c: Column) -> Column:
    """Karp-Rabin rolling hash over the token stream:
    ``h = fold(tokens, 0, (acc, t) -> (acc*31 + hash48(t)) mod 1e9+7)``.
    Order-sensitive (unlike a bag-of-words hash) → a document fingerprint.
    Max intermediate ≈ 2^48·31 < 2^63, no overflow."""
    toks = tokens(c)
    hashed = F.transform(toks, token_hash)
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * ROLLING_HASH_BASE + v) % ROLLING_HASH_MOD,
    )


def content_hash(c: Column) -> Column:
    """Exact-content fingerprint (md5 hex)."""
    return F.md5(c)
