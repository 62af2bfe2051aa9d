"""ML-prep query suite: the feature/statistics layer between raw corpus
and training run — rolling engagement windows, n-gram LM quality
scoring, rule-based labeling, co-occurrence statistics, and categorical
cardinality capping.

Contents:
- ``rolling_distinct_users``: DAU + trailing-7-day WAU per day via
  contribution-day expansion — the scale-correct rolling COUNT DISTINCT
  (a distinct count has no partial state a RANGE window could slide).
- ``bigram_perplexity``: per-document average negative log-likelihood
  under an add-one-smoothed corpus bigram LM — the CCNet-style
  perplexity quality filter, self-trained so the whole pipeline is one
  job with no external model artifact.
- ``topic_tag_rules``: keyword-rule multi-label topic tagging — the
  deterministic labeler used to seed/stratify training mixes before a
  learned classifier exists.
- ``cooccurrence_topk``: distance-≤2 token co-occurrence counts — the
  GloVe/PMI statistics primitive.
- ``group_rare_collapse``: collapse categories below a frequency floor
  into ``__other__`` — cardinality capping before one-hot/embedding
  lookup, emitted as the relabel mapping you broadcast back onto the
  fact table.

Oracle discipline (same as the sibling suites): floats are rounded
before they cross the engine boundary; multi-term float sums are folds
over a deterministically-sorted list so DuckDB replays the identical
reduction order; top-k ties are broken by a total order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from movies_etl_spark.plans.registry import _t, query

# ===========================================================================
# Rolling engagement windows
# ===========================================================================


@query(
    "rolling_distinct_users",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    contrib AS (SELECT user_id, day + CAST(k AS INTEGER) AS obs_day
                FROM ud, unnest(range(7)) AS t(k)),
    w AS (SELECT obs_day AS day, count(DISTINCT user_id) AS wau
          FROM contrib JOIN days ON obs_day = days.day
          GROUP BY obs_day),
    d AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY day)
    SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau
    FROM d JOIN w ON w.day = d.day
    """,
)
def q_rolling_distinct_users(spark, sf_dir):
    """DAU and trailing-7-day WAU per day — the rolling DISTINCT count.

    COUNT(DISTINCT) has no subtractable partial state, so a RANGE window
    cannot slide it and the naive formulation is a per-day self-join over
    the trailing week (7 scans of the fact table). The scale shape used
    here: shrink to distinct (user, day) pairs first (one
    fact-table shuffle, the frame is bounded by users x days), then
    expand each pair map-side into the 7 observation days it contributes
    to, join the tiny distinct-days frame (broadcast) to clip the
    expansion to observed days, and count distinct users per observation
    day. Corpus-scale work is one shuffle + a 7x expansion of the already
    -tiny distinct frame — independent of the window length's cost in the
    self-join form. The distinct frame feeds three consumers (days clip,
    WAU expansion, DAU) so it persists for the query's lifetime — one
    fact-table scan instead of three; it is the SMALL side (users x
    days), which is what makes persisting it 100 TB-safe."""
    from movies_etl_spark.operators.caching import tracked_persist

    ud = tracked_persist(
        _t(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    days = ud.select("day").distinct()
    contrib = ud.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"), "day"
    ).select("user_id", F.expr("date_add(day, k)").alias("obs_day"))
    wau = (
        contrib.join(
            F.broadcast(days), contrib["obs_day"] == days["day"], "inner"
        )
        .groupBy("obs_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    return dau.join(wau, dau["day"] == wau["obs_day"], "inner").select(
        "day", "dau", "wau"
    )


# ===========================================================================
# N-gram LM quality scoring (CCNet-style perplexity filter)
# ===========================================================================


@query(
    "bigram_perplexity",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE len(string_split(text, ' ')) >= 2),
    bg AS (SELECT doc_id, p, toks[p] AS w1,
                  toks[p] || ' ' || toks[p + 1] AS bg
           FROM d, unnest(range(1, len(toks))) AS t(p)),
    v AS (SELECT count(DISTINCT tk) AS vsz
          FROM (SELECT unnest(string_split(text, ' ')) AS tk
                FROM documents)),
    c2 AS (SELECT w1, bg, count(*) AS c2 FROM bg GROUP BY w1, bg),
    lm AS (SELECT bg,
                  round(-ln((c2 + 1.0) /
                            (sum(c2) OVER (PARTITION BY w1) + vsz)), 6)
                      AS nll
           FROM c2, v),
    scored AS (SELECT bg.doc_id, bg.p, lm.nll
               FROM bg JOIN lm USING (bg)),
    agg AS (SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   list_reduce([CAST(0 AS DOUBLE)]
                       || list(nll ORDER BY p),
                       (acc, x) -> acc + x) AS s
            FROM scored GROUP BY doc_id)
    SELECT doc_id, n_bigrams, round(s / n_bigrams, 4) AS avg_nll
    FROM agg
    """,
)
def q_bigram_perplexity(spark, sf_dir):
    """Per-document perplexity under a self-trained corpus bigram LM —
    the CCNet-style quality filter: documents whose token sequences are
    improbable under the corpus LM (boilerplate, garbled extraction,
    wrong language) score a high average negative log-likelihood and get
    filtered or down-mixed. Add-one smoothing over the full vocabulary:
    P(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V).

    Scale shape: the LM count table is bounded by observed-bigram
    cardinality (vocabulary-squared worst case, far smaller in practice)
    — it BROADCASTS to the exploded corpus, so the corpus-size work is
    one map-side explode + one shuffle for the per-doc rollup; the
    corpus is never joined to itself. The exploded bigram frame feeds
    BOTH the LM count aggregate and the scoring join, so it persists for
    the query's lifetime (tracked, released before the next query) —
    train-then-score reuses one tokenization pass instead of exploding
    the corpus twice; the production analog is materializing the
    tokenized corpus once per ingest. Bit-reproducibility: each nll term
    is rounded to 6 places before the per-doc sum, and that sum is a
    fold over the position-sorted term list (a hash-aggregate's partial
    order is engine-dependent), then the average rounds to 4."""
    from movies_etl_spark.operators.caching import tracked_persist

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.col("text"), " ").alias("toks"))
        .filter(F.size("toks") >= 2)
    )
    bg = tracked_persist(
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "p -> named_struct("
                    "'p', p, "
                    "'w1', element_at(toks, p), "
                    "'bg', concat(element_at(toks, p), ' ', "
                    "element_at(toks, p + 1))))"
                )
            ).alias("b"),
        ).select("doc_id", F.col("b.p").alias("p"), "b.w1", "b.bg")
    )
    vsz = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("tk"))
        .agg(F.countDistinct("tk").alias("vsz"))
    )
    c2 = bg.groupBy("w1", "bg").agg(F.count(F.lit(1)).alias("c2"))
    w1_tot = Window.partitionBy("w1")
    lm = c2.crossJoin(F.broadcast(vsz)).select(
        "bg",
        F.round(
            -F.log(
                (F.col("c2") + 1.0) / (F.sum("c2").over(w1_tot) + F.col("vsz"))
            ),
            6,
        ).alias("nll"),
    )
    scored = bg.select("doc_id", "p", "bg").join(F.broadcast(lm), "bg")
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("p", "nll"))),
            F.lit(0.0),
            lambda acc, s: acc + s["nll"],
        ).alias("s"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        F.round(F.col("s") / F.col("n_bigrams"), 4).alias("avg_nll"),
    )


# ===========================================================================
# Rule-based topic tagging
# ===========================================================================

_TOPIC_RULES = (
    ("relational", ("join", "merge", "table")),
    ("streaming", ("stream", "window", "batch")),
    ("performance", ("fast", "slow", "scan")),
    ("storage", ("row", "column", "part")),
)


@query(
    "topic_tag_rules",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    m AS (SELECT doc_id,
       CASE WHEN len(list_intersect(toks, ['join','merge','table'])) > 0
            THEN 'relational' END AS t1,
       CASE WHEN len(list_intersect(toks, ['stream','window','batch'])) > 0
            THEN 'streaming' END AS t2,
       CASE WHEN len(list_intersect(toks, ['fast','slow','scan'])) > 0
            THEN 'performance' END AS t3,
       CASE WHEN len(list_intersect(toks, ['row','column','part'])) > 0
            THEN 'storage' END AS t4
       FROM d)
    SELECT doc_id,
           CAST((t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT
              + (t3 IS NOT NULL)::INT + (t4 IS NOT NULL)::INT AS BIGINT)
               AS n_tags,
           CASE WHEN t1 IS NULL AND t2 IS NULL AND t3 IS NULL
                     AND t4 IS NULL
                THEN 'untagged'
                ELSE concat_ws(',', t1, t2, t3, t4) END AS tags
    FROM m
    """,
)
def q_topic_tag_rules(spark, sf_dir):
    """Keyword-rule multi-label topic tagging: a document gets every
    topic whose keyword set intersects its token set — the deterministic
    labeler that seeds topic-stratified training mixes (domain_mix_sample
    consumes exactly this kind of label) before any learned classifier
    exists.

    Pure map stage: token-set membership via arrays_overlap on the split
    array — no explode, no shuffle, no regex (token-exact matching
    sidesteps the Java-vs-RE2 dialect problem entirely). Tags render in
    fixed rule order via concat_ws (skips nulls identically in both
    engines); tagless docs get the explicit 'untagged' bucket so the
    downstream mix sampler sees them as a class, not an empty string."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    tag_cols = [
        F.when(
            F.arrays_overlap("toks", F.array(*[F.lit(k) for k in kws])), topic
        ).alias(f"t{i}")
        for i, (topic, kws) in enumerate(_TOPIC_RULES, start=1)
    ]
    m = d.select("doc_id", *tag_cols)
    ts = [F.col(f"t{i}") for i in range(1, len(_TOPIC_RULES) + 1)]
    n_tags = sum(
        (t.isNotNull().cast("int") for t in ts), F.lit(0)
    ).cast("long")
    all_null = ts[0].isNull()
    for t in ts[1:]:
        all_null = all_null & t.isNull()
    return m.select(
        "doc_id",
        n_tags.alias("n_tags"),
        F.when(all_null, "untagged")
        .otherwise(F.concat_ws(",", *ts))
        .alias("tags"),
    )


# ===========================================================================
# Co-occurrence statistics (GloVe/PMI primitive)
# ===========================================================================


@query(
    "cooccurrence_topk",
    oracle="""
    WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents),
    pairs AS (
        SELECT least(toks[p], toks[p + 1]) AS wa,
               greatest(toks[p], toks[p + 1]) AS wb
        FROM d, unnest(range(1, len(toks))) AS t(p)
        UNION ALL
        SELECT least(toks[p], toks[p + 2]) AS wa,
               greatest(toks[p], toks[p + 2]) AS wb
        FROM d, unnest(range(1, len(toks) - 1)) AS t(p))
    SELECT wa, wb, CAST(count(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY wa, wb
    ORDER BY cnt DESC, wa, wb LIMIT 50
    """,
)
def q_cooccurrence_topk(spark, sf_dir):
    """Top-50 token co-occurrence pairs within a distance-2 window —
    the corpus statistic GloVe/PMI embeddings train on. Pairs are
    order-normalized (least, greatest) so 'a b' and 'b a' accumulate
    together.

    Window expansion is MAP-SIDE (array zip against itself at offsets 1
    and 2 — no explode-then-self-join, which at 100 TB would shuffle
    token instances twice and join them); the union of the two offset
    frames happens before aggregation, so the only shuffle carries
    pre-combined (wa, wb) partial counts, bounded by vocabulary squared.
    Top-50 is TakeOrdered with a (cnt DESC, wa, wb) total order."""
    d = _t(spark, sf_dir, "documents").select(
        F.split(F.col("text"), " ").alias("toks")
    )

    def offset_pairs(dist: int):
        return (
            d.filter(F.size("toks") >= dist + 1)
            .select(
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size(toks) - {dist}), "
                        f"p -> named_struct("
                        f"'wa', least(element_at(toks, p), "
                        f"element_at(toks, p + {dist})), "
                        f"'wb', greatest(element_at(toks, p), "
                        f"element_at(toks, p + {dist}))))"
                    )
                ).alias("b")
            )
            .select("b.wa", "b.wb")
        )

    pairs = offset_pairs(1).unionAll(offset_pairs(2))
    return (
        pairs.groupBy("wa", "wb")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "wa", "wb")
        .limit(50)
    )


# ===========================================================================
# Categorical cardinality capping
# ===========================================================================


@query(
    "group_rare_collapse",
    oracle="""
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    tot AS (SELECT sum(n) AS t FROM c)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           CASE WHEN n * 1.0 / t < 0.045 THEN '__other__' ELSE source END
               AS cat
    FROM c, tot
    """,
)
def q_group_rare_collapse(spark, sf_dir):
    """Rare-category collapse mapping: every source whose corpus share
    falls below a 4.5% floor is relabeled ``__other__`` — cardinality
    capping before one-hot encoding / embedding-table lookup, where a
    long tail of rare categories wastes parameters and overfits.

    The output IS the relabel mapping (category, count, collapsed
    label): at 100 TB you broadcast this |categories|-row frame back
    onto the fact table to apply it — the fact table itself is touched
    exactly once, by the initial map-side-combined count (the corpus
    total comes from an unpartitioned window over the already-collapsed
    |categories|-row frame, NOT a second aggregate over the scan — a
    crossJoin-with-agg formulation re-scans the corpus). The share
    threshold compares identically-computed doubles in both engines
    (n/t from exact integer counts)."""
    c = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = F.sum("n").over(Window.partitionBy())
    return c.select(
        "source",
        F.col("n").cast("long").alias("n_docs"),
        F.when(F.col("n") * 1.0 / t < 0.045, "__other__")
        .otherwise(F.col("source"))
        .alias("cat"),
    )


# ===========================================================================
# RAG-style document chunking
# ===========================================================================


@query(
    "chunk_sliding_window",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    ch AS (SELECT doc_id,
                  CAST((st - 1) // 40 AS BIGINT) AS chunk_idx,
                  CAST(len(toks[st:st + 49]) AS BIGINT) AS n_tokens,
                  md5(array_to_string(toks[st:st + 49], ' ')) AS chunk_hash
           FROM d, unnest(range(1, len(toks) + 1, 40)) AS t(st))
    SELECT doc_id, chunk_idx, n_tokens, chunk_hash FROM ch
    """,
)
def q_chunk_sliding_window(spark, sf_dir):
    """Sliding-window document chunking (50-token chunks, stride 40 →
    10-token overlap) — the retrieval/RAG ingestion primitive that
    splits long documents into overlapping embedding-sized passages so
    no answer span is cut at a hard boundary. Emits (doc, chunk index,
    token count, content hash); the embedding step downstream consumes
    exactly this frame.

    Pure map stage (sequence + slice + md5 on the split array — same
    shape as span_dedup but with overlapping stride), zero shuffles:
    chunking 100 TB is scan-bound. The ragged tail chunk clips
    identically in both engines."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    return d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks), 40), "
                "st -> named_struct("
                "'chunk_idx', CAST((st - 1) div 40 AS BIGINT), "
                "'n_tokens', CAST(size(slice(toks, st, 50)) AS BIGINT), "
                "'chunk_hash', md5(array_join(slice(toks, st, 50), ' '))))"
            )
        ).alias("c"),
    ).select("doc_id", "c.chunk_idx", "c.n_tokens", "c.chunk_hash")


# ===========================================================================
# Tokenizer vocabulary coverage
# ===========================================================================


@query(
    "oov_rate",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
    freq AS (SELECT term, count(*) AS tf FROM tok GROUP BY term),
    vocab AS (SELECT term FROM freq
              ORDER BY tf DESC, term LIMIT 20),
    j AS (SELECT t.doc_id,
                 CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
          FROM tok t LEFT JOIN vocab v USING (term))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           round(sum(oov) * 1.0 / count(*), 4) AS oov_rate
    FROM j GROUP BY doc_id
    """,
)
def q_oov_rate(spark, sf_dir):
    """Tokenizer vocabulary coverage: per document, the fraction of
    token instances OUTSIDE the corpus's top-20 vocabulary — the
    out-of-vocabulary rate that sizes a tokenizer's vocab (and flags
    documents a fixed vocab would shred into unknowns).

    The vocabulary is corpus-derived in the same job (count + top-k)
    and BROADCASTS back onto the exploded corpus — bounded by the
    vocab-size parameter, never corpus-scale; the only corpus-scale
    shuffle is the per-doc rollup. Top-k tie-break is (freq DESC, term)
    — a total order, so both engines pick the identical vocabulary."""
    tok = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), "term")
        .limit(20)
        .select("term")
    )
    j = tok.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "term", "left"
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("oov_rate"),
    )


# ===========================================================================
# Embedding column statistics
# ===========================================================================


@query(
    "embedding_dim_stats",
    oracle="""
    WITH e AS (SELECT vec_id,
                      CAST(i AS BIGINT) AS dim,
                      CAST(embedding[i] AS DOUBLE) AS v
               FROM embeddings,
                    unnest(range(1, len(embedding) + 1)) AS t(i)),
    a AS (SELECT dim,
                 CAST(count(*) AS BIGINT) AS n,
                 list_reduce([CAST(0 AS DOUBLE)]
                     || list(v ORDER BY vec_id),
                     (acc, x) -> acc + x) AS s,
                 list_reduce([CAST(0 AS DOUBLE)]
                     || list(v * v ORDER BY vec_id),
                     (acc, x) -> acc + x) AS ss,
                 min(v) AS mn, max(v) AS mx
          FROM e GROUP BY dim)
    SELECT dim, n,
           round(s / n, 4) AS mean,
           round(sqrt((ss - s * s / n) / (n - 1)), 4) AS std,
           round(mn, 4) AS vmin, round(mx, 4) AS vmax
    FROM a
    """,
)
def q_embedding_dim_stats(spark, sf_dir):
    """Per-dimension statistics of the embedding column (mean / std /
    min / max for each of the 64 dimensions) — the feature-normalization
    pass before whitening, product quantization, or drift monitoring of
    an embedding space.

    posexplode is map-side; the only shuffle carries (dim, value) pairs
    combined into per-dim partials... except the float sums, which are
    NOT hash-aggregated: mean and std derive from folds over the
    vec_id-sorted value list (the cosine/BM25/TWAP discipline), because
    a partial-sum tree's order is engine-dependent. min/max/count are
    order-free and aggregate normally. 64 groups × corpus rows — at
    100 TB the collect_list per dim bounds at corpus row count; the
    production swap is Welford partials per partition, which trades the
    exact oracle for O(1) state (noted, not needed at bench scale)."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("i", "vf")
    ).select(
        "vec_id",
        (F.col("i") + 1).cast("long").alias("dim"),
        F.col("vf").cast("double").alias("v"),
    )

    def fold(expr_col):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("vec_id", expr_col.alias("x")))),
            F.lit(0.0),
            lambda acc, s: acc + s["x"],
        )

    a = e.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        fold(F.col("v")).alias("s"),
        fold(F.col("v") * F.col("v")).alias("ss"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    return a.select(
        "dim",
        "n",
        F.round(F.col("s") / F.col("n"), 4).alias("mean"),
        F.round(
            F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)),
            4,
        ).alias("std"),
        F.round("mn", 4).alias("vmin"),
        F.round("mx", 4).alias("vmax"),
    )


@query(
    "stratified_kfold_assign",
    oracle="""
    SELECT doc_id, lang,
           CAST((row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) % 5
                AS BIGINT) AS fold
    FROM documents
    """,
)
def q_stratified_kfold_assign(spark, sf_dir):
    """Stratified 5-fold assignment: within each language stratum, docs
    are dealt round-robin in deterministic hash order, so every fold
    holds exactly ⌈n/5⌉ or ⌊n/5⌋ docs PER LANGUAGE — the exact-balance
    guarantee cross-validation needs that train_test_split's plain hash
    bucketing (binomially balanced only) cannot give.

    One shuffle on the stratum key; the hash order makes assignment
    reproducible across engines and runs. At 100 TB strata are large:
    the same exact balance comes from the two-stage form (per-partition
    row_number + partition-offset add — the sequence_pack prefix-sum
    shape) instead of one window per giant stratum."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return d.select(
        "doc_id",
        "lang",
        ((F.row_number().over(w) - 1) % 5).cast("long").alias("fold"),
    )


# ===========================================================================
# Hashing-trick vectorization
# ===========================================================================


@query(
    "feature_hash_vectorize",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                 FROM documents WHERE doc_id < 50),
    h AS (SELECT doc_id,
                 ('0x' || substr(md5('fh:' || t), 1, 12))::BIGINT AS hv
          FROM tok WHERE t <> ''),
    sgn AS (SELECT doc_id, hv % 256 AS dim,
                   CASE WHEN (hv >> 20) & 1 = 1 THEN 1 ELSE -1 END AS s
            FROM h),
    agg AS (SELECT doc_id, dim, CAST(sum(s) AS BIGINT) AS w
            FROM sgn GROUP BY doc_id, dim),
    nz AS (SELECT * FROM agg WHERE w <> 0)
    SELECT doc_id, dim, w,
           round(w / sqrt(sum(CAST(w * w AS DOUBLE))
                 OVER (PARTITION BY doc_id)), 6) AS w_l2
    FROM nz
    """,
)
def q_feature_hash_vectorize(spark, sf_dir):
    """Hashing-trick text vectorization (Weinberger et al. 2009; the
    HashingVectorizer semantics with alternate signs): token → md5
    bucket in a fixed 256-dim space, sign from an independent hash bit
    (unbiases collisions in expectation), per-(doc, dim) signed counts,
    zero entries dropped, L2-normalized — the stateless featurizer for
    streaming/online training where a fitted vocabulary is impossible
    (no vocab table, no fit pass, any engine reproduces the features).

    Pure map + one (doc, dim) groupBy with map-side partials + one
    per-doc window on the ≤256-dim sparse rows — no vocabulary-sized
    state anywhere, which is the point of the trick at 100 TB. Hashing
    is the engine-portable purpose-salted md5 ('fh:' salt); weights are
    exact integers until the single L2 division, rounded once."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).filter(F.col("t") != "")
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit("fh:"), F.col("t"))), 1, 12), 16, 10
    ).cast("long")
    sgn = tok.select(
        "doc_id",
        (hv % 256).alias("dim"),
        F.when(F.shiftright(hv, 20) % 2 == 1, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("s"),
    )
    agg = (
        sgn.groupBy("doc_id", "dim")
        .agg(F.sum("s").alias("w"))
        .filter(F.col("w") != 0)
    )
    w_doc = Window.partitionBy("doc_id")
    return agg.select(
        "doc_id",
        "dim",
        "w",
        F.round(
            F.col("w")
            / F.sqrt(F.sum((F.col("w") * F.col("w")).cast("double")).over(w_doc)),
            6,
        ).alias("w_l2"),
    )
