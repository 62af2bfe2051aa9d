"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the
train-a-tokenizer-on-the-corpus step of an LLM data pipeline, expressed
Spark-first.

Shape at 100 TB: the ONLY corpus-scale stage is the word count (one
explode + one map-side-combinable groupBy — the wordcount shuffle).
Everything after runs on the aggregated (word, freq) table, which is
vocabulary-bounded (millions of rows for a web corpus, not billions) —
the standard industrial shape: HuggingFace/SentencePiece trainers
likewise iterate on word-frequency tables, never re-reading raw text.
Each merge iteration is two tiny jobs over that table: a weighted
adjacent-pair count plus a 1-row argmax collect (the bounded
1-row-statistic collect class, same as prune_null_columns), then the
merge applies as a pure string map.

Determinism/portability: pair selection orders by (count DESC, left,
right) — no floats anywhere — and the greedy leftmost-non-overlapping
merge is implemented with plain `replace` string arithmetic that is
byte-identical in any engine (see apply_merge), so the DuckDB oracle
replays the identical training run and the merge table is reproducible
across engines and re-runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: end-of-word marker (classic BPE): lets the model distinguish suffix
#: subwords from prefix/infix ones.
EOW = "</w>"


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the whitespace-tokenized corpus — the one
    corpus-scale stage of BPE training (wordcount: explode map-side,
    partials combine before the shuffle)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_symbols(wc: DataFrame) -> DataFrame:
    """Seed the symbol sequences: each word becomes its characters
    joined by single spaces, plus the end-of-word marker.
    (word, syms, freq) — the word rides along so the trained vocabulary
    doubles as the word→segmentation ENCODING MAP (bpe_pack_pipeline
    broadcasts it back onto the corpus)."""
    return wc.select(
        "word",
        F.concat(
            F.concat_ws(" ", F.split(F.col("word"), "")), F.lit(" " + EOW)
        ).alias("syms"),
        "freq",
    )


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy leftmost-non-overlapping merge of the symbol pair (a, b)
    inside a space-delimited symbol string, as pure `replace` calls.

    The double-space trick makes one replace pass equal the greedy walk:
    widen every gap to two spaces, then replace ' a  b ' with ' ab ' —
    each match owns its boundary spaces, so back-to-back occurrences
    ('a b a b') all merge in one pass while overlaps ('a a a' with
    (a,a)) merge leftmost-first exactly like the reference algorithm.
    Collapse the doubled gaps and trim afterwards. `replace` scans
    leftmost-non-overlapping identically in Spark and DuckDB, so the
    oracle replays this byte-for-byte."""
    doubled = F.concat(
        F.lit(" "), F.replace(syms, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    merged = F.replace(doubled, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return F.trim(F.replace(merged, F.lit("  "), F.lit(" ")))


def pair_counts(words: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts over the symbol table:
    (sym_a, sym_b, cnt). Runs on the vocab-bounded table — the explode
    is per distinct word, weighted by freq, never per corpus token.

    Fully-merged words (a single symbol — e.g. a 1-char word after its
    char+EOW merge) contribute no pairs and MUST be filtered before the
    transform: Spark's sequence(1, 0) is the DESCENDING [1, 0], whose
    element_at(.., 0) throws under ANSI — while the oracle's
    range(1, 1) is just empty. The filter makes both read the same."""
    words = words.filter(F.size(F.split(F.col("syms"), " ")) >= 2)
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(syms, ' ')) - 1), "
                "p -> struct(element_at(split(syms, ' '), p) AS a, "
                "element_at(split(syms, ' '), p + 1) AS b))"
            )
        ).alias("pr"),
        "freq",
    )
    return pairs.groupBy(
        F.col("pr.a").alias("sym_a"), F.col("pr.b").alias("sym_b")
    ).agg(F.sum("freq").alias("cnt"))


def bpe_train(
    spark: SparkSession, wc: DataFrame, n_merges: int = 8
) -> DataFrame:
    """Train ``n_merges`` BPE merges over a (word, freq) table; returns
    the learned merge table (step, sym_a, sym_b, pair_cnt) — the
    artifact a tokenizer ships.

    Each iteration: weighted pair count over the symbol table, 1-row
    argmax collect (count DESC, then lexicographic pair — fully
    deterministic), then the merge applied as a string map. The input
    ``wc`` should be persisted by the caller (it is re-read once per
    iteration); the symbol table itself stays vocab-bounded."""
    merges, _ = bpe_train_with_vocab(spark, wc, n_merges)
    return merges


def bpe_train_with_vocab(
    spark: SparkSession, wc: DataFrame, n_merges: int = 8
) -> tuple[DataFrame, DataFrame]:
    """bpe_train plus the ENCODED vocabulary: the symbol table after the
    final merge IS every distinct word's subword segmentation, so
    training yields the tokenizer-apply artifact for free. Returns
    (merges, encoded_words) with encoded_words = (word, syms, freq) —
    the word rides along, so the result doubles as the
    word→segmentation ENCODING MAP ready to broadcast.

    This is the scale shape of tokenizer APPLICATION too: encode the
    distinct-word table once (vocab-bounded work), then the corpus maps
    through it with a broadcast join — the raw text is never re-walked
    per merge rule."""
    words = initial_symbols(wc)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            pair_counts(words)
            .orderBy(F.col("cnt").desc(), "sym_a", "sym_b")
            .limit(1)
            .collect()
        )
        if not top:  # corpus exhausted (every word a single symbol)
            break
        a, b, cnt = top[0]["sym_a"], top[0]["sym_b"], top[0]["cnt"]
        merges.append((step, a, b, int(cnt)))
        words = words.select(
            "word", apply_merge(F.col("syms"), a, b).alias("syms"), "freq"
        )
    merges_df = spark.createDataFrame(
        merges, "step int, sym_a string, sym_b string, pair_cnt bigint"
    )
    return merges_df, words
