"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the
train-a-tokenizer-on-the-corpus step of an LLM data pipeline, expressed
Spark-first.

Shape at 100 TB: the ONLY corpus-scale stage is the word count (one
explode + one map-side-combinable groupBy — the wordcount shuffle).
Everything after runs on the aggregated (word, freq) table, which is
vocabulary-bounded (millions of rows for a web corpus, not billions) —
the standard industrial shape: HuggingFace/SentencePiece trainers
likewise iterate on word-frequency tables IN MEMORY, never re-reading
raw text. The merge loop therefore runs DRIVER-SIDE on the collected
vocab table when it fits ``max_local_vocab`` rows (r12): the encode
step already broadcasts the entire encoded vocabulary back onto the
corpus as a join, so collecting the same table to the driver is inside
the size contract the pipeline already assumes — and it replaces
~2 Spark jobs per merge iteration (pair-count shuffle + argmax under
AQE; 18 jobs for the standard 8-merge train, measured in
tools/profile_llm_corpus.py) with ONE count + ONE collect. Vocabularies
over the cap fall back to the original distributed per-iteration loop
(weighted pair-count shuffle + 1-row argmax collect — the bounded
1-row-statistic collect class), which never materializes the vocab on
the driver.

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

#: Driver-side merge-loop admission cap (rows in the (word, freq)
#: table). The encoded vocabulary is broadcast back onto the corpus by
#: every consumer (bpe_pack_pipeline / llm_corpus_pipeline join
#: F.broadcast(nsub)), so any vocab the pipeline can run at all already
#: fits one JVM — the local loop only mirrors that bound on the driver.
#: Checked with ONE aggregate action BEFORE collecting, so an over-cap
#: vocab falls back to the distributed loop instead of OOMing the
#: driver.
MAX_LOCAL_VOCAB = 5_000_000

#: Driver-side admission cap in total WORD CHARACTERS (ADVICE r12): row
#: count alone under-measures _train_local's footprint, because the
#: Python structures scale with SYMBOLS, not rows — per word character
#: the trainer holds a syms-string slot (~2-4 B), a pair-Counter
#: contribution, and a pair→word-index set entry (~60-80 B), roughly
#: 100 B per character all-in (tracemalloc-measured r13: 105.5 B/char
#: peak on a 50k-word random vocab of 3-12-char words, 8 merges), an
#: order of magnitude over the
#: serialized broadcast the row cap was calibrated against. 50M chars
#: therefore bounds the local loop's peak at ~5 GB of driver heap; a
#: near-row-cap vocab of LONG words (5M rows × 100-char words = 500M
#: chars) now correctly diverts to the distributed loop.
MAX_LOCAL_CHARS = 50_000_000


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
    broadcasts it back onto the corpus).

    Characters are CODE POINTS (r13, ADVICE r12): regexp_extract_all
    over '(?s).' — Java regex matches supplementary characters as one
    code point — instead of F.split(word, ''), which splits by UTF-16
    CODE UNIT and would seed a non-BMP character (emoji, supplementary
    CJK) as two surrogate halves. This keeps the distributed path
    byte-identical to _train_local's python iteration (code points) and
    to the DuckDB oracle's string_split(word, ''), so the two engine
    paths can no longer train different merge tables on the same corpus
    depending only on whether the vocab exceeded the local cap."""
    return wc.select(
        "word",
        F.concat(
            F.concat_ws(
                " ",
                F.regexp_extract_all(F.col("word"), F.lit("(?s)."), 0),
            ),
            F.lit(" " + EOW),
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


def _apply_merge_str(syms: str, a: str, b: str) -> str:
    """Pure-python twin of :func:`apply_merge` — the IDENTICAL
    double-space replace dance (str.replace scans
    leftmost-non-overlapping exactly like Spark's/DuckDB's replace).
    strip(' ') not strip(): F.trim removes only ASCII spaces, and a
    word may legitimately begin or end with another whitespace char
    (word_counts splits on ' ' alone), which trim would keep."""
    doubled = " " + syms.replace(" ", "  ") + " "
    merged = doubled.replace(f" {a}  {b} ", f" {a}{b} ")
    return merged.replace("  ", " ").strip(" ")


def _train_local(
    rows: list[tuple[str, int]], n_merges: int
) -> tuple[list[tuple[int, str, str, int]], list[tuple[str, str, int]]]:
    """In-memory Sennrich merge loop over the collected (word, freq)
    table — exact value parity with the distributed loop (integer
    counts, (cnt DESC, sym_a, sym_b) argmax: UTF-8 byte order equals
    code-point order, so python string comparison matches Spark's
    binary collation; merges apply via _apply_merge_str).

    Pair counts update INCREMENTALLY: only words containing the merged
    pair are re-walked per iteration (the pair→word index), so
    iterations after the first cost O(affected words), the same
    asymptotic shape industrial in-memory trainers use.

    Initial symbols split by CODE POINT (python iteration) — since r13
    the distributed path seeds identically (initial_symbols uses a
    code-point regex, not the UTF-16 code-unit F.split), so both engine
    paths and the DuckDB oracle agree on non-BMP characters; asserted
    with a planted-emoji vocab over both paths in
    tests/test_property_parity.py."""
    from collections import Counter, defaultdict

    # [word, syms, freq]; syms seeded exactly like initial_symbols
    words = [[w, " ".join(w) + " " + EOW, int(f)] for w, f in rows]

    def adj_pairs(syms: str) -> list[tuple[str, str]]:
        t = syms.split(" ")
        return [(t[i], t[i + 1]) for i in range(len(t) - 1)]

    counts: Counter = Counter()
    index: defaultdict = defaultdict(set)
    for i, (_, syms, freq) in enumerate(words):
        for p in adj_pairs(syms):
            counts[p] += freq
            index[p].add(i)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        if not counts:  # corpus exhausted (every word a single symbol)
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, int(cnt)))
        for i in sorted(index.get((a, b), ())):
            w, syms, freq = words[i]
            new_syms = _apply_merge_str(syms, a, b)
            if new_syms == syms:
                continue
            for p in adj_pairs(syms):
                counts[p] -= freq
                if counts[p] <= 0:
                    del counts[p]
                index[p].discard(i)
            for p in adj_pairs(new_syms):
                counts[p] += freq
                index[p].add(i)
            words[i][1] = new_syms
    return merges, [(w, s, f) for w, s, f in words]


def bpe_train(
    spark: SparkSession,
    wc: DataFrame,
    n_merges: int = 8,
    max_local_vocab: int = MAX_LOCAL_VOCAB,
    max_local_chars: int = MAX_LOCAL_CHARS,
) -> DataFrame:
    """Train ``n_merges`` BPE merges over a (word, freq) table; returns
    the learned merge table (step, sym_a, sym_b, pair_cnt) — the
    artifact a tokenizer ships. See :func:`bpe_train_with_vocab` for
    the local/distributed execution split."""
    merges, _ = bpe_train_with_vocab(
        spark, wc, n_merges, max_local_vocab, max_local_chars
    )
    return merges


def _train_distributed(
    spark: SparkSession, wc: DataFrame, n_merges: int
) -> tuple[DataFrame, DataFrame]:
    """The over-cap path: per-iteration weighted pair-count shuffle +
    1-row argmax collect (the bounded 1-row-statistic collect class),
    merge applied as a string map. Never materializes the vocab table
    on the driver. The input ``wc`` should be persisted by the caller
    (it is re-read once per iteration)."""
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


def bpe_train_with_vocab(
    spark: SparkSession,
    wc: DataFrame,
    n_merges: int = 8,
    max_local_vocab: int = MAX_LOCAL_VOCAB,
    max_local_chars: int = MAX_LOCAL_CHARS,
) -> tuple[DataFrame, DataFrame]:
    """bpe_train plus the ENCODED vocabulary: the symbol table after the
    final merge IS every distinct word's subword segmentation, so
    training yields the tokenizer-apply artifact for free. Returns
    (merges, encoded_words) with encoded_words = (word, syms, freq) —
    the word rides along, so the result doubles as the
    word→segmentation ENCODING MAP ready to broadcast.

    Execution split (r12, VERDICT r11 #1): vocabularies within
    ``max_local_vocab`` rows AND ``max_local_chars`` total word
    characters (ADVICE r12 — the Python merge structures scale with
    symbols, not rows; see MAX_LOCAL_CHARS) train in one guard
    aggregate + one collect + an in-memory incremental merge loop
    (:func:`_train_local`) — the 18-job distributed loop collapsed to
    2, and the encoded map comes back as a LocalRelation ready to
    broadcast. The guard aggregate (count + char sum, ONE job) runs
    BEFORE the collect, so an over-cap vocab is diverted to
    :func:`_train_distributed` instead of OOMing the driver. Both paths
    produce byte-identical merge tables and segmentations (asserted in
    tests/test_property_parity.py, including a non-BMP planted vocab),
    and the same DuckDB oracle gates both.

    This is the scale shape of tokenizer APPLICATION too: encode the
    distinct-word table once (vocab-bounded work), then the corpus maps
    through it with a broadcast join — the raw text is never re-walked
    per merge rule."""
    guard = wc.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.length("word")), F.lit(0)).alias("chars"),
    ).collect()[0]
    if guard["n"] <= max_local_vocab and guard["chars"] <= max_local_chars:
        rows = [(r["word"], r["freq"]) for r in wc.collect()]
        merges, encoded = _train_local(rows, n_merges)
        merges_df = spark.createDataFrame(
            merges, "step int, sym_a string, sym_b string, pair_cnt bigint"
        )
        encoded_df = spark.createDataFrame(
            encoded, "word string, syms string, freq bigint"
        )
        return merges_df, encoded_df
    return _train_distributed(spark, wc, n_merges)
