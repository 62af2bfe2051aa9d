"""Deduplication operators for large-scale corpora (north star):
exact (hash-groupBy), MinHash+LSH banding, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the whole point of these operators):
- NOTHING here is O(n²) over the corpus. Candidate generation is always
  a shuffle-join on a compact key (content hash, LSH band, block key);
  pairwise verification runs only inside candidate buckets.
- All hashes derive from md5 (engine-portable, deterministic) rather than
  engine-private hash functions — signatures are reproducible anywhere,
  which also makes them incrementally maintainable (append-only corpora
  re-hash only new documents).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from movies_etl_spark.operators.text import token_hash, tokens

# MinHash configuration: 8 hashes, 4 bands × 2 rows.
N_MINHASH = 8
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS


def token_shingles(toks: Column, k: int = 3) -> Column:
    """k-token shingles ("a b c" for consecutive triples). Empty array if
    fewer than k tokens."""
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - k)  # 0-based start indices
    mk = lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + j + 1) for j in range(k)]
    )
    return F.when(n >= k, F.transform(starts, mk)).otherwise(
        F.array().cast("array<string>")
    )


def _seeded_md5(seed: int):
    """Single-arg lambda factory. NB: do NOT write ``lambda s, i=i: ...``
    with pyspark higher-order functions — they count DEFAULTED params and
    would call the lambda as (element, index), silently binding the seed
    to the index Column."""
    prefix = f"{seed}:"
    return lambda s: F.md5(F.concat(F.lit(prefix), s))


def minhash_signature(shingles: Column, n_hashes: int = N_MINHASH) -> list[Column]:
    """MinHash signature: per seed i, the lexicographic min of
    md5(i || ':' || shingle) over the shingle set. String-min of md5 is a
    valid min-wise permutation and is engine-portable (SQL oracles
    reproduce it verbatim)."""
    return [
        F.array_min(F.transform(shingles, _seeded_md5(i))) for i in range(n_hashes)
    ]


def band_keys(sig: list[Column], n_bands: int = N_BANDS) -> list[Column]:
    """LSH band keys: concat of each signature slice. Docs sharing ANY
    band key become candidate pairs (bucket join, never n²)."""
    r = len(sig) // n_bands
    return [
        F.concat_ws("|", *sig[b * r : (b + 1) * r]) for b in range(n_bands)
    ]


def with_minhash_bands(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """id → exploded (band_id, band_key) rows, one per band."""
    toks = tokens(F.col(text_col))
    sh = token_shingles(toks)
    sig = minhash_signature(sh)
    bands = band_keys(sig)
    banded = df.select(
        F.col(id_col),
        F.array(
            *[
                F.struct(F.lit(i).alias("band_id"), b.alias("band_key"))
                for i, b in enumerate(bands)
            ]
        ).alias("bands"),
    )
    ex = banded.select(id_col, F.explode("bands").alias("b")).select(
        id_col, F.col("b.band_id").alias("band_id"), F.col("b.band_key").alias("band_key")
    )
    return ex.filter(F.col("band_key") != "")  # docs too short for shingles


def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard of two arrays (array_intersect/union are set-semantic)."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(
        F.array_union(a, b)
    ).cast("double")


def candidate_pairs_minhash(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b), deduplicated across bands.
    Cost: one shuffle on band_key; bucket sizes bound the join fan-out."""
    ex = with_minhash_bands(df, text_col, id_col)
    a = ex.select(
        F.col(id_col).alias("id_a"), "band_id", "band_key"
    )
    b = ex.select(
        F.col(id_col).alias("id_b"), "band_id", "band_key"
    )
    pairs = a.join(b, ["band_id", "band_key"]).filter(
        F.col("id_a") < F.col("id_b")
    )
    return pairs.select("id_a", "id_b").distinct()


def simhash16(toks: Column) -> Column:
    """16-bit SimHash over the token bag: bit j of the fingerprint is the
    sign of Σ_tokens (±1 by bit j of hash48(token)). Near-dup docs differ
    in few bits (compare by Hamming distance)."""
    def _bit_pm1(j: int):
        # ±1 by bit j of the hash: (h >> j) & 1, exact integer bit ops.
        # Closure factory, not a defaulted lambda (see _seeded_md5 note).
        return lambda h: (F.shiftright(h, j).bitwiseAND(F.lit(1))) * 2 - 1

    hashed = F.transform(toks, token_hash)
    bits = []
    for j in range(16):
        bit = F.transform(hashed, _bit_pm1(j))
        s = F.aggregate(bit, F.lit(0).cast("long"), lambda acc, v: acc + v)
        bits.append(F.when(s > 0, F.lit(2**j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays, computed in double with a
    left-to-right fold (bit-reproducible across engines that fold
    sequentially)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return dot / (na * nb)
