"""Deterministic sampling queries (operators/sampling.py), oracle-checked:
stratified per-language quotas and reproducible train/test splits over the
documents corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from airflow_postgres_csv_spark.operators import sampling as S
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import t
from airflow_postgres_csv_spark.queries.text_queries import SQL_TOKENS

SQL_H = "md5(CAST(doc_id AS VARCHAR))"


register(
    "sample_stratified_lang",
    f"""
    WITH ranked AS (
        SELECT doc_id, lang, source,
               row_number() OVER (PARTITION BY lang ORDER BY {SQL_H}, doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, lang, source FROM ranked WHERE rn <= 40 ORDER BY doc_id
    """,
)(
    lambda spark, sf_dir: (
        S.sample_stratified_quota(
            t(spark, sf_dir, "documents").select("doc_id", "lang", "source"),
            strata_col="lang",
            quota=40,
            key_col="doc_id",
        ).orderBy("doc_id")
    )
)


register(
    "split_train_test_counts",
    f"""
    SELECT lang,
           CASE WHEN substr({SQL_H}, 1, 2) < '14' THEN 'test' ELSE 'train' END AS split,
           count(*) AS n_docs
    FROM documents
    GROUP BY lang, split
    ORDER BY lang, split
    """,
)(
    lambda spark, sf_dir: (
        S.split_train_test(t(spark, sf_dir, "documents"), key_col="doc_id")
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "split")
    )
)


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle — the "global shuffle before training" pass.
# A true global ORDER BY + row_number is a single-partition sort at 100 TB;
# the distributed form is shard-then-shuffle: assign each doc to one of N
# shards by key hash, then order within the shard by a seeded hash. Both
# levels are md5-deterministic, so the oracle replays them exactly, and the
# Spark plan keeps N-way parallelism (window partitioned by shard, never a
# global sort).
# ---------------------------------------------------------------------------

_SHUF_SEED = "ep1"
_SHUF_SHARDS = 16

register(
    "corpus_shuffle_deterministic",
    f"""
    WITH keyed AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{_SHUF_SEED}'), 1, 8)) AS BIGINT)
                 % {_SHUF_SHARDS} AS shard,
               md5('{_SHUF_SEED}:' || CAST(doc_id AS VARCHAR)) AS sort_key
        FROM documents
    )
    SELECT doc_id, shard,
           row_number() OVER (PARTITION BY shard ORDER BY sort_key, doc_id) AS pos_in_shard
    FROM keyed
    ORDER BY doc_id
    """,
)(
    lambda spark, sf_dir: (
        lambda keyed: keyed.select(
            "doc_id",
            "shard",
            F.row_number()
            .over(Window.partitionBy("shard").orderBy("sort_key", "doc_id"))
            .alias("pos_in_shard"),
        ).orderBy("doc_id")
    )(
        t(spark, sf_dir, "documents").select(
            "doc_id",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{_SHUF_SEED}"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % _SHUF_SHARDS
            ).alias("shard"),
            F.md5(F.concat(F.lit(f"{_SHUF_SEED}:"), F.col("doc_id").cast("string"))).alias(
                "sort_key"
            ),
        )
    )
)


# ---------------------------------------------------------------------------
# Data-mixture weights — given a target mixture (uniform across languages
# here), compute per-language sampling rates and effective epochs from the
# measured token counts. This is the planning step of mixture-weighted
# corpus assembly (e.g. rebalancing web/code/books): one token-count agg
# over the corpus, a tiny grid of per-stratum arithmetic after it. All
# counts are exact bigints; the two divisions happen once per language and
# are rounded to 9 dp.
# ---------------------------------------------------------------------------

register(
    "data_mixture_weights",
    """
    WITH lt AS (
        SELECT lang,
               CAST(SUM(len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))) AS BIGINT) AS lang_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT SUM(lang_tokens) AS total_tokens, COUNT(*) AS n_langs FROM lt
    )
    SELECT lang, lang_tokens,
           ROUND(CAST(lang_tokens AS DOUBLE) / total_tokens, 9) AS corpus_share,
           ROUND(1.0 / n_langs, 9) AS target_share,
           ROUND(LEAST(1.0, (CAST(total_tokens AS DOUBLE) / n_langs) / lang_tokens), 9) AS sample_rate,
           ROUND((CAST(total_tokens AS DOUBLE) / n_langs) / lang_tokens, 9) AS epochs_at_target
    FROM lt CROSS JOIN tot
    ORDER BY lang
    """,
)(
    lambda spark, sf_dir: (
        lambda lt: lt.crossJoin(
            F.broadcast(
                lt.agg(
                    F.sum("lang_tokens").alias("total_tokens"),
                    F.count(F.lit(1)).alias("n_langs"),
                )
            )
        ).select(
            "lang",
            "lang_tokens",
            F.round(F.col("lang_tokens").cast("double") / F.col("total_tokens"), 9).alias(
                "corpus_share"
            ),
            F.round(F.lit(1.0) / F.col("n_langs"), 9).alias("target_share"),
            F.round(
                F.least(
                    F.lit(1.0),
                    (F.col("total_tokens").cast("double") / F.col("n_langs"))
                    / F.col("lang_tokens"),
                ),
                9,
            ).alias("sample_rate"),
            F.round(
                (F.col("total_tokens").cast("double") / F.col("n_langs"))
                / F.col("lang_tokens"),
                9,
            ).alias("epochs_at_target"),
        ).orderBy("lang")
    )(
        t(spark, sf_dir, "documents")
        .select(
            "lang",
            F.size(
                F.split(
                    F.trim(F.regexp_replace(F.lower("text"), "\\s+", " ")), " "
                )
            ).alias("n_tok"),
        )
        .groupBy("lang")
        .agg(F.sum("n_tok").alias("lang_tokens"))
    )
)


# Weighted deterministic sampling: inclusion probability proportional to
# n_chars (stand-in for any importance weight), decided by integer
# arithmetic over a content-derived hash — bit-identical across engines,
# no RNG, no shuffle.
register(
    "sample_weighted_hash",
    """
    WITH u AS (
      SELECT doc_id, n_chars,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':wsample'), 1, 8))::BIGINT AS u32
      FROM documents
    )
    SELECT doc_id, n_chars, u32
    FROM u
    WHERE u32 * 100000 < 4294967296 * n_chars
    ORDER BY doc_id
    """,
)(
    lambda spark, sf_dir: (
        S.sample_weighted_bernoulli(
            t(spark, sf_dir, "documents").select("doc_id", "n_chars"),
            weight_col="n_chars",
            rate_denom=100_000,
        )
        .select("doc_id", "n_chars", "u32")
        .orderBy("doc_id")
    )
)


# ---------------------------------------------------------------------------
# Output-shard planning by token budget — the "write K balanced training
# shards" step: rank documents by token count (descending, doc_id
# tie-break) and deal them to K shards in boustrophedon ("snake") order
# (1..K, K..1, ...), the classic greedy balancer for size-sorted items.
# The global rank comes from operators/global_order.py — value-range
# bucketing + partitioned local rank + broadcast offsets, never a
# single-partition window — so the plan holds at corpus scale. The oracle
# replays rank + snake arithmetic with a plain ROW_NUMBER().
# ---------------------------------------------------------------------------

_SNAKE_K = 8


def _shard_plan_snake(spark, sf_dir):
    from airflow_postgres_csv_spark.functions import texts as X
    from airflow_postgres_csv_spark.operators.global_order import (
        with_global_order_stats,
    )

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(X.tokens("text")).alias("n_toks")
    )
    ranked = with_global_order_stats(
        docs, "n_toks", descending=True, tiebreak="doc_id", rank_col="rn"
    )
    pos = (F.col("rn") - 1) % (2 * _SNAKE_K)
    shard = F.when(pos < _SNAKE_K, pos).otherwise(2 * _SNAKE_K - 1 - pos)
    return (
        ranked.withColumn("shard", shard.cast("int"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.min("n_toks").alias("min_toks"),
            F.max("n_toks").alias("max_toks"),
        )
        .orderBy("shard")
    )


register(
    "shard_plan_snake",
    f"""
    WITH ranked AS (
      SELECT doc_id,
             len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS n_toks
      FROM documents
    ),
    rn AS (
      SELECT doc_id, n_toks,
             ROW_NUMBER() OVER (ORDER BY n_toks DESC, doc_id) AS rn
      FROM ranked
    ),
    assigned AS (
      SELECT n_toks,
             CASE WHEN (rn - 1) % {2 * _SNAKE_K} < {_SNAKE_K}
                  THEN (rn - 1) % {2 * _SNAKE_K}
                  ELSE {2 * _SNAKE_K} - 1 - ((rn - 1) % {2 * _SNAKE_K})
             END AS shard
      FROM rn
    )
    SELECT CAST(shard AS INT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           MIN(n_toks) AS min_toks,
           MAX(n_toks) AS max_toks
    FROM assigned GROUP BY shard ORDER BY shard
    """,
)(_shard_plan_snake)


# ---------------------------------------------------------------------------
# Priority sampling (Duffield-Lund-Thorup): exactly-k weighted sample
# without replacement, ranked by the pure-integer priority
# (w * 2^32) div (u32 + 1) over the md5-derived uniform — deterministic
# top-k, tie-broken by doc_id, planned as TakeOrderedAndProject (no input
# shuffle). Complements the random-sized Bernoulli sampler above.
# ---------------------------------------------------------------------------
register(
    "sample_priority_topk",
    """
    SELECT doc_id, n_chars,
           (CAST(n_chars AS BIGINT) * 4294967296)
             // (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':prio'), 1, 8))::BIGINT + 1)
             AS priority
    FROM documents
    ORDER BY priority DESC, doc_id
    LIMIT 100
    """,
)(
    lambda spark, sf_dir: (
        S.sample_priority_topk(
            t(spark, sf_dir, "documents").select("doc_id", "n_chars"),
            weight_col="n_chars",
            k=100,
        )
    )
)


# --- exact-proportion stratified split: the hash split
# (split_train_test_counts) gives each doc an independent Bernoulli
# assignment — composition-in-expectation; this variant RANKS each
# stratum by the md5 uniform and cuts at exact 80/10/10 boundaries, the
# fixed-budget counterpart (floor arithmetic in pure integers, so both
# engines cut at identical ranks). Per-stratum window over the lang
# partition — distributed, never a global sort.
def _split_exact_stratified(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    wn = Window.partitionBy("lang")
    d = docs.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    split = (
        F.when(F.col("rn") <= F.expr("(n * 8) div 10"), F.lit("train"))
        .when(F.col("rn") <= F.expr("(n * 9) div 10"), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select("doc_id", "lang", split.alias("split"))
        .orderBy("doc_id")
    )


register(
    "split_exact_stratified",
    f"""
    WITH ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY {SQL_H}, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN rn <= (n * 8) // 10 THEN 'train'
                WHEN rn <= (n * 9) // 10 THEN 'val'
                ELSE 'test' END AS split
    FROM ranked ORDER BY doc_id
    """,
)(_split_exact_stratified)


# ---------------------------------------------------------------------------
# DSIR importance-weighted selection (Xie et al. 2023): per-doc mean
# hashed-unigram log likelihood ratio of the English slice vs the whole
# corpus; top 50 = the docs a DSIR pass would upsample first. Integer
# counts, one IEEE log per bucket, 9-dp decimal sums — fully oracle-exact.
# ---------------------------------------------------------------------------

_DSIR_B = 1024
_DSIR_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

register(
    "sample_dsir_importance",
    f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest(string_split({_DSIR_NORM}, ' ')) AS tok
        FROM documents
    ),
    b AS (
        SELECT doc_id, lang,
               ('0x' || substring(md5(tok), 1, 8))::BIGINT % {_DSIR_B} AS bk
        FROM toks
    ),
    stats AS (
        SELECT bk, COUNT(*) AS c_r,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_t
        FROM b GROUP BY bk
    ),
    tot AS (
        SELECT CAST(SUM(c_r) AS BIGINT) AS t_r, CAST(SUM(c_t) AS BIGINT) AS t_t
        FROM stats
    ),
    scored AS (
        SELECT b.doc_id, b.lang,
               CAST(ROUND(LN(CAST((s.c_t + 1) * (t.t_r + {_DSIR_B}) AS DOUBLE)
                           / CAST((s.c_r + 1) * (t.t_t + {_DSIR_B}) AS DOUBLE)), 9)
                    AS DECIMAL(18,9)) AS lr
        FROM b JOIN stats s ON b.bk = s.bk CROSS JOIN tot t
    )
    SELECT doc_id, lang, COUNT(*) AS n_tokens,
           CAST(SUM(lr) AS DOUBLE) / COUNT(*) AS avg_logratio
    FROM scored GROUP BY doc_id, lang
    ORDER BY avg_logratio DESC, doc_id LIMIT 50
    """,
)(
    lambda spark, sf_dir: (
        S.dsir_importance_weights(
            t(spark, sf_dir, "documents"),
            target_pred=F.col("lang") == "en",
            n_buckets=_DSIR_B,
            carry_cols=["lang"],
        ).orderBy(F.col("avg_logratio").desc(), "doc_id").limit(50)
    )
)


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
# document with the corpus unigram LM (same exact-decimal recipe as
# text_unigram_logprob), cut the corpus into head/middle/tail terciles by
# GLOBAL fluency rank, and report each bucket's size and score range —
# the keep/demote/drop decision table of web-corpus curation. The global
# NTILE uses the distributed global-order machinery (value-range
# bucketing + broadcast offsets, operators/global_order.py) — never a
# single-partition window sort; the oracle is ANSI NTILE over the same
# total order.
# ---------------------------------------------------------------------------


def _sample_perplexity_buckets(spark, sf_dir):
    from airflow_postgres_csv_spark.functions import texts as X
    from airflow_postgres_csv_spark.operators.global_order import (
        with_global_order_stats,
    )

    toks = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(X.tokens("text")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = vocab.agg(F.sum("n").alias("total_n"))
    perdoc = (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.round(F.log(F.col("n").cast("double") / F.col("total_n")), 9)
            .cast("decimal(18,9)")
            .alias("logp"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("logp").cast("double") / F.count(F.lit(1))).alias(
                "avg_logprob"
            ),
        )
    )
    tiled = with_global_order_stats(
        perdoc,
        "avg_logprob",
        descending=True,  # tile 1 = most fluent = lowest perplexity (head)
        tiebreak="doc_id",
        ntile=3,
        ntile_col="ppl_bucket",
    )
    return (
        tiled.groupBy("ppl_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("avg_logprob").alias("min_avg_logprob"),
            F.max("avg_logprob").alias("max_avg_logprob"),
        )
        .orderBy("ppl_bucket")
    )


register(
    "sample_perplexity_buckets",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({SQL_TOKENS}) AS tok FROM documents
    ),
    vocab AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
    total AS (SELECT sum(n) AS total_n FROM vocab),
    scored AS (
        SELECT t.doc_id,
               CAST(ROUND(LN(CAST(v.n AS DOUBLE) / total.total_n), 9) AS DECIMAL(18,9)) AS logp
        FROM toks t JOIN vocab v ON t.tok = v.tok CROSS JOIN total
    ),
    perdoc AS (
        SELECT doc_id, count(*) AS n_tokens,
               CAST(SUM(logp) AS DOUBLE) / count(*) AS avg_logprob
        FROM scored GROUP BY doc_id
    ),
    tiled AS (
        SELECT doc_id, n_tokens, avg_logprob,
               NTILE(3) OVER (ORDER BY avg_logprob DESC, doc_id) AS ppl_bucket
        FROM perdoc
    )
    SELECT ppl_bucket, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(avg_logprob) AS min_avg_logprob,
           MAX(avg_logprob) AS max_avg_logprob
    FROM tiled GROUP BY ppl_bucket ORDER BY ppl_bucket
    """,
)(_sample_perplexity_buckets)


# ---------------------------------------------------------------------------
# Temperature-scaled mixture (the mT5/XLM-R alpha-sampling formula):
# q_s = p_s^alpha / sum_t p_t^alpha with alpha = 0.3 -- the standard
# up-weighting of low-resource strata. Shape: one token-count hash-agg
# over the corpus, then per-language arithmetic on a tiny grid (two 1-row
# broadcast cross-joins). Determinism: p_s is ONE division of exact
# bigints; p^alpha (libm pow differs in ulps across engines) snaps to the
# 9-dp decimal grid BEFORE the cross-language normalizing sum, so the sum
# is exact decimal arithmetic and every later step is a single IEEE op on
# identical operands.
# ---------------------------------------------------------------------------

register(
    "sample_temperature_mixture",
    """
    WITH lt AS (
        SELECT lang,
               CAST(SUM(len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))) AS BIGINT) AS lang_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens FROM lt),
    a AS (
        SELECT lang, lang_tokens,
               CAST(ROUND(POWER(CAST(lang_tokens AS DOUBLE) / total_tokens, 0.3), 9)
                    AS DECIMAL(18,9)) AS a9,
               CAST(lang_tokens AS DOUBLE) / total_tokens AS p
        FROM lt CROSS JOIN tot
    ),
    s AS (SELECT SUM(a9) AS sa FROM a)
    SELECT lang, lang_tokens,
           ROUND(p, 9) AS corpus_share,
           ROUND(CAST(a9 AS DOUBLE) / CAST(sa AS DOUBLE), 9) AS temp_share,
           ROUND((CAST(a9 AS DOUBLE) / CAST(sa AS DOUBLE)) / p, 9) AS boost
    FROM a CROSS JOIN s
    ORDER BY lang
    """,
)(
    lambda spark, sf_dir: (
        lambda a: a.crossJoin(
            F.broadcast(a.agg(F.sum("a9").alias("sa")))
        ).select(
            "lang",
            "lang_tokens",
            F.round("p", 9).alias("corpus_share"),
            F.round(F.col("a9").cast("double") / F.col("sa").cast("double"), 9).alias(
                "temp_share"
            ),
            F.round(
                (F.col("a9").cast("double") / F.col("sa").cast("double")) / F.col("p"),
                9,
            ).alias("boost"),
        ).orderBy("lang")
    )(
        (
            lambda lt: lt.crossJoin(
                F.broadcast(lt.agg(F.sum("lang_tokens").alias("total_tokens")))
            ).select(
                "lang",
                "lang_tokens",
                F.round(
                    F.pow(
                        F.col("lang_tokens").cast("double") / F.col("total_tokens"),
                        0.3,
                    ),
                    9,
                )
                .cast("decimal(18,9)")
                .alias("a9"),
                (F.col("lang_tokens").cast("double") / F.col("total_tokens")).alias("p"),
            )
        )(
            t(spark, sf_dir, "documents")
            .select(
                "lang",
                F.size(
                    F.split(F.trim(F.regexp_replace(F.lower("text"), "\\s+", " ")), " ")
                ).alias("n_tok"),
            )
            .groupBy("lang")
            .agg(F.sum("n_tok").alias("lang_tokens"))
        )
    )
)
