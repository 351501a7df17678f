"""Pattern-mining / classifier-scoring / blocking-join queries
(SURVEY.md §2.3 depth).

Corpus-mining operators the reference's "write any SQL" surface can
express but Spark must plan well at 100 TB — each an oracle-checked
registered query. Flagship three:

- ``basket_pair_rules`` — apriori-pruned association-rule mining over
  order baskets (support / confidence / lift). The pair generation is a
  basket self-join AFTER the item-level support prune, so the candidate
  space is bounded by frequent items only — the standard apriori
  anti-monotonicity cut that keeps the self-join from exploding on a
  100 TB basket table.
- ``text_winnowing_fingerprints`` — robust winnowing (Schleimer et al.,
  SIGMOD'03): per-document char-k-gram rolling hashes, minimum per
  sliding window with rightmost tie-break, distinct selected prints.
  This is the local-fingerprinting primitive behind copy-detection /
  substring-level dedup; all array math runs JVM-side per row (no
  explode until the final output), so there is NO shuffle at all until
  the (tiny) fingerprint set is emitted.
- ``text_hashed_ngram_classifier`` — fastText-style linear classifier
  scoring with the hashing trick: unigram+bigram features hashed into
  2^12 buckets, a deterministic integer weight per bucket, mean-weight
  document score. The fixture has no trained model, so weights are a
  pure function of the bucket id — the *plumbing* (feature hashing,
  explode→agg scoring, integer determinism) is exactly what a real
  quality-classifier pass needs; swap the weight expression for a
  broadcast-joined weight table to serve a trained model.

Determinism: every hash is md5-derived (bit-identical across engines),
every aggregate is integer or exact-decimal, and each double in the
output is produced by ONE final IEEE division with an identical
expression tree in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_csv_spark.operators import dedup as D
from airflow_postgres_csv_spark.queries import register
from airflow_postgres_csv_spark.queries._helpers import t
from airflow_postgres_csv_spark.queries.text_queries import SQL_NORM, SQL_TOKENS


# ---------------------------------------------------------------------------
# Association rules over order baskets (lineitem parts per order).
#
# Scale shape: baskets materialize ONCE as per-order sorted part arrays
# (one shuffle keyed on l_orderkey — collect_set dedupes in the same
# pass); the item-support prune (support >= MINSUP_ITEM) intersects each
# basket with the broadcast frequent-item array BEFORE pairing — apriori
# anti-monotonicity guarantees no frequent pair contains an infrequent
# item, so the cut is lossless. Pair candidates are then generated
# MAP-SIDE per basket (a nested array transform over the sorted pruned
# array — no self-join, no second pass over the fact table), and one
# hash agg counts them. The original relational self-join is kept as the
# DuckDB oracle, certifying the map-side generation computes the same
# relation. Measured: the self-join formulation planned 13 exchanges with
# 4 independent fact scans; this one plans ONE fact shuffle (inside the
# checkpointed basket build) + one pair-count exchange.
# ---------------------------------------------------------------------------

_MINSUP_ITEM = 3
_MINSUP_PAIR = 2


def _basket_pair_rules(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        # consumed by n_orders, item-support and pairing: materialize once
        # (without this the scan+shuffle+agg repeats per branch — no
        # ReusedExchange in the built plan)
        .localCheckpoint(eager=False)
    )
    # scalar-aggregate attaches: 1-row broadcasts, plan stays fully lazy
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    item_supp = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("supp"))
        .filter(F.col("supp") >= _MINSUP_ITEM)
        .localCheckpoint(eager=False)  # consumed by freq_arr + 2 supp joins
    )
    # prune via a broadcast hash JOIN on the exploded parts — the hash
    # table of frequent items is built once per task; an array_intersect
    # against a broadcast frequent-ITEM ARRAY rescans that array per
    # basket row (measured 2.7 s → 49 s at sf0.1 when most parts are
    # frequent). The regroup reuses the basket build's l_orderkey
    # partitioning, so no new exchange.
    pruned = (
        baskets.select("l_orderkey", F.explode("parts").alias("p"))
        .join(
            F.broadcast(item_supp.select(F.col("l_partkey").alias("p"))), "p"
        )
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("p")).alias("fp"))
        .select("fp")
    )
    pair_structs = F.expr(
        """
        CASE WHEN size(fp) < 2 THEN
          cast(array() as array<struct<p1:bigint,p2:bigint>>)
        ELSE flatten(transform(
          sequence(1, size(fp) - 1),
          i -> transform(sequence(i + 1, size(fp)),
                         j -> struct(element_at(fp, i) AS p1,
                                     element_at(fp, j) AS p2))
        )) END
        """
    )
    pairs = (
        pruned.select(F.explode(pair_structs).alias("pr"))
        .select("pr.p1", "pr.p2")
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("supp_pair"))
        .filter(F.col("supp_pair") >= _MINSUP_PAIR)
        .join(
            F.broadcast(
                item_supp.select(
                    F.col("l_partkey").alias("p1"), F.col("supp").alias("supp1")
                )
            ),
            "p1",
        )
        .join(
            F.broadcast(
                item_supp.select(
                    F.col("l_partkey").alias("p2"), F.col("supp").alias("supp2")
                )
            ),
            "p2",
        )
    )
    return (
        pairs.crossJoin(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "supp_pair",
            "supp1",
            "supp2",
            # ONE IEEE division each, from exact integers — engine-identical
            (F.col("supp_pair").cast("double") / F.col("supp1")).alias("conf_1_2"),
            (
                (F.col("supp_pair") * F.col("n_orders")).cast("double")
                / (F.col("supp1") * F.col("supp2"))
            ).alias("lift"),
        )
        .orderBy(F.desc("supp_pair"), "p1", "p2")
        .limit(50)
    )


register(
    "basket_pair_rules",
    f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets),
    item AS (
        SELECT l_partkey, COUNT(*) AS supp FROM baskets
        GROUP BY l_partkey HAVING COUNT(*) >= {_MINSUP_ITEM}
    ),
    fb AS (
        SELECT b.l_orderkey, b.l_partkey, i.supp
        FROM baskets b JOIN item i USING (l_partkey)
    ),
    pairs AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2,
               COUNT(*) AS supp_pair,
               MIN(a.supp) AS supp1, MIN(b.supp) AS supp2
        FROM fb a JOIN fb b USING (l_orderkey)
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {_MINSUP_PAIR}
    )
    SELECT p1, p2, supp_pair, supp1, supp2,
           CAST(supp_pair AS DOUBLE) / supp1 AS conf_1_2,
           CAST(supp_pair * n_orders AS DOUBLE) / (supp1 * supp2) AS lift
    FROM pairs, n
    ORDER BY supp_pair DESC, p1, p2
    LIMIT 50
    """,
)(_basket_pair_rules)


# ---------------------------------------------------------------------------
# Robust winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03).
#
# k-gram hashes h_i over the (capped) normalized text; for each window of
# W consecutive hashes keep the minimum, breaking ties toward the
# RIGHTMOST position; the distinct selected (pos, hash) pairs are the
# document's fingerprints. Tie-break is encoded arithmetically: the
# window minimum is taken over key_i = h_i * 2^20 + (2^20-1 - i), so the
# smallest key has the smallest hash and, among equal hashes, the
# LARGEST position. h_i < 2^32 keeps every key under 2^52 — exact in
# int64 in both engines.
#
# Scale shape: the whole selection is per-row array arithmetic inside
# whole-stage codegen — zero shuffles before the final explode of the
# selected prints (a ~n/W-fold reduction of the k-gram stream). This is
# the fingerprint generator substring-dedup would feed into a bucket
# join at 100 TB.
# ---------------------------------------------------------------------------

_WIN_K = 8  # char k-gram width
_WIN_W = 4  # winnowing window (guarantee: any match >= K+W-1 chars is caught)
_WIN_CAP = 400  # cap normalized text, bounds output size deterministically


def _text_winnowing_fingerprints(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return D.winnowing_fingerprints(
        docs, "text", "doc_id", k=_WIN_K, w=_WIN_W, cap=_WIN_CAP
    ).orderBy("doc_id", "pos")


# fps CTE shared by the fingerprint query and the pairs query below
_WINNOW_FPS_CTE = f"""
    WITH d AS (
        SELECT doc_id, substring({SQL_NORM}, 1, {_WIN_CAP}) AS norm
        FROM documents
    ),
    keyed AS (
        SELECT doc_id,
               list_transform(
                 generate_series(1, greatest(length(norm) - {_WIN_K - 1}, 0)),
                 i -> ('0x' || substring(md5(substring(norm, i, {_WIN_K})), 1, 8))::BIGINT
                        * 1048576 + (1048575 - i)
               ) AS keys
        FROM d
    ),
    sel AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                 generate_series(1, greatest(len(keys) - {_WIN_W - 1}, 0)),
                 j -> list_min(list_slice(keys, j, j + {_WIN_W - 1}))
               ))) AS key
        FROM keyed
    )
"""

register(
    "text_winnowing_fingerprints",
    _WINNOW_FPS_CTE
    + """
    SELECT doc_id, 1048575 - (key % 1048576) AS pos, key // 1048576 AS fp
    FROM sel ORDER BY doc_id, pos
    """,
)(_text_winnowing_fingerprints)


# Substring near-dup candidate pairs over the shared fingerprints: the
# winnowing guarantee means every pair sharing a >= K+W-1-char normalized
# substring appears here — minus prints over the stop-fingerprint df cap
# (the synthetic corpus is template-generated, so without the cap common
# phrases make the bucket join near-all-pairs: measured 107k of 125k
# possible pairs at sf0.01).
_WIN_MIN_SHARED = 3
_WIN_MAX_DF = 20


def _dedup_winnowing_pairs(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return D.winnowing_pairs(
        docs, "text", "doc_id",
        k=_WIN_K, w=_WIN_W, cap=_WIN_CAP,
        min_shared=_WIN_MIN_SHARED, max_doc_freq=_WIN_MAX_DF,
    ).orderBy("id_a", "id_b")


register(
    "dedup_winnowing_pairs",
    _WINNOW_FPS_CTE
    + f"""
    , fps0 AS (
        SELECT DISTINCT doc_id, key // 1048576 AS fp FROM sel
    ),
    fps AS (
        SELECT doc_id, fp FROM fps0
        QUALIFY COUNT(*) OVER (PARTITION BY fp) <= {_WIN_MAX_DF}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= {_WIN_MIN_SHARED}
    ORDER BY id_a, id_b
    """,
)(_dedup_winnowing_pairs)


# ---------------------------------------------------------------------------
# Hashed n-gram linear classifier (fastText-style scoring plumbing).
#
# Features = unigrams + adjacent-token bigrams; bucket = md5-hash mod
# 2^12 (the hashing trick); weight(bucket) = (bucket * 2654435761)
# mod 2^16 - 2^15 — a deterministic stand-in for a trained weight
# vector, centered at zero. Document score = mean feature weight (one
# IEEE division of exact integer sums); label = score > 0.
#
# Scale shape: explode features → hash agg by doc — one shuffle, all
# JVM. A trained model swaps the weight expression for a broadcast join
# against a 2^12-row weight table; nothing else changes.
# ---------------------------------------------------------------------------

_CLS_BUCKETS = 4096


def _text_hashed_ngram_classifier(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.expr("split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')").alias(
            "toks"
        ),
    )
    feats = F.expr(
        """
        concat(
          toks,
          CASE WHEN size(toks) < 2 THEN cast(array() as array<string>)
          ELSE transform(sequence(1, size(toks) - 1),
                    i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
          END
        )
        """
    )
    e = d.select("doc_id", F.explode(feats).alias("feat"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("feat")), 1, 8), 16, 10).cast("long")
        % _CLS_BUCKETS
    )
    weight = (bucket * F.lit(2654435761)) % 65536 - 32768
    return (
        e.select("doc_id", weight.alias("w"))
        .groupBy("doc_id")
        .agg(F.sum("w").alias("w_sum"), F.count("*").alias("n_feats"))
        .select(
            "doc_id",
            "w_sum",
            "n_feats",
            (F.col("w_sum").cast("double") / F.col("n_feats")).alias("score"),
            (F.col("w_sum") > 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


register(
    "text_hashed_ngram_classifier",
    f"""
    WITH d AS (
        SELECT doc_id, {SQL_TOKENS} AS toks FROM documents
    ),
    e AS (
        SELECT doc_id,
               unnest(list_concat(
                 toks,
                 list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                                i -> toks[i] || ' ' || toks[i + 1])
               )) AS feat
        FROM d
    ),
    w AS (
        SELECT doc_id,
               (('0x' || substring(md5(feat), 1, 8))::BIGINT % {_CLS_BUCKETS})
                 * 2654435761 % 65536 - 32768 AS w
        FROM e
    )
    SELECT doc_id, CAST(SUM(w) AS BIGINT) AS w_sum, COUNT(*) AS n_feats,
           CAST(SUM(w) AS DOUBLE) / COUNT(*) AS score,
           SUM(w) > 0 AS keep
    FROM w GROUP BY doc_id ORDER BY doc_id
    """,
)(_text_hashed_ngram_classifier)


# ---------------------------------------------------------------------------
# OOV rate against a corpus-derived top-N vocabulary — the tokenizer
# coverage check run before committing to a vocab. Vocab selection is
# TakeOrderedAndProject (top-N by (freq DESC, token), a distributed
# top-k — never a global sort), then a broadcast semi-join back onto the
# exploded token stream. One explode shuffle + one broadcast join.
# ---------------------------------------------------------------------------

_OOV_VOCAB_N = 1000


def _text_oov_rate(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')")
        ).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "tok")
        .limit(_OOV_VOCAB_N)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    scored = toks.join(F.broadcast(vocab), "tok", "left")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


register(
    "text_oov_rate",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({SQL_TOKENS}) AS tok FROM documents
    ),
    vocab AS (
        SELECT tok FROM toks GROUP BY tok
        ORDER BY COUNT(*) DESC, tok LIMIT {_OOV_VOCAB_N}
    )
    SELECT t.doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS oov_rate
    FROM toks t LEFT JOIN vocab v USING (tok)
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
)(_text_oov_rate)


# ---------------------------------------------------------------------------
# BPE trainer loop — THREE merge rounds as ONE lazy plan.
#
# text_bpe_merge_pairs (text_queries.py) is the single pair-statistics
# step; this is the actual training loop: per round, count adjacent
# symbol pairs over the word-frequency table, pick the argmax pair
# (ties: lexicographically smallest — both engines sort identically),
# and apply the merge to every word. The selected pair is NEVER
# collect()ed: each round's argmax is a 1-row DataFrame crossJoin-
# broadcast into the next round's replace expression, so the whole
# trainer is one declarative plan (the driver loop only *builds* it).
#
# Merge application contract: the padded symbol string ' w ' has
# ' x y ' replaced by ' xy ' in P=4 passes of non-overlapping
# left-to-right replace() — pass 1 consumes the separating space of an
# adjacent occurrence ('x y x y'), the next pass picks it up; both
# engines implement replace() with identical left-to-right semantics,
# so the P-pass result is bit-identical (P bounds resolution of
# pathological runs; document-scale words converge in 2).
#
# 100 TB shape: per round one explode→hash-agg (pair stats, map-side
# combinable), one TakeOrdered(1) argmax, one broadcast of a single row
# into a map-only projection. The words table shuffles once at round 0
# (the word-frequency groupBy) and never again.
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3
_BPE_PASSES = 4


def _text_bpe_train_merges(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(
                F.expr("split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')")
            ).alias("w")
        )
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            F.expr("concat_ws(' ', split(w, ''))").alias("sym"),
            "freq",
        )
    )
    merge_rows = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        pair_arr = F.expr(
            """
            CASE WHEN size(split(sym, ' ')) < 2 THEN cast(array() as array<string>)
            ELSE transform(
              sequence(1, size(split(sym, ' ')) - 1),
              j -> concat(element_at(split(sym, ' '), j), ' ',
                          element_at(split(sym, ' '), j + 1))
            ) END
            """
        )
        top = (
            words.select(F.explode(pair_arr).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "pair")
            .limit(1)
        )
        merge_rows.append(
            top.select(
                F.lit(rnd).alias("round"),
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
                "n",
            )
        )
        padded = F.concat(F.lit(" "), F.col("sym"), F.lit(" "))
        target = F.concat(F.lit(" "), F.col("pair"), F.lit(" "))
        repl = F.concat(
            F.lit(" "), F.replace(F.col("pair"), F.lit(" "), F.lit("")), F.lit(" ")
        )
        merged_sym = padded
        for _ in range(_BPE_PASSES):
            merged_sym = F.replace(merged_sym, target, repl)
        words = words.crossJoin(F.broadcast(top)).select(
            F.trim(merged_sym).alias("sym"), "freq"
        )
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out.orderBy("round")


def _bpe_oracle_sql(rounds: int, passes: int) -> str:
    ctes = [
        f"""words0 AS MATERIALIZED (
      SELECT list_aggregate(string_split_regex(w, ''), 'string_agg', ' ') AS sym, freq
      FROM (
        SELECT tok AS w, COUNT(*) AS freq
        FROM (SELECT unnest({{toks}}) AS tok FROM documents)
        GROUP BY tok HAVING LENGTH(tok) >= 2
      )
    )"""
    ]
    selects = []
    for i in range(1, rounds + 1):
        prev = f"words{i - 1}"
        ctes.append(
            f"""pairs{i} AS (
      SELECT s[j] || ' ' || s[j + 1] AS pair, freq
      FROM (SELECT string_split({prev}.sym, ' ') AS s, freq FROM {prev}),
           unnest(generate_series(1, greatest(len(s) - 1, 0))) AS u(j)
    ),
    top{i} AS MATERIALIZED (
      SELECT pair, replace(pair, ' ', '') AS merged, SUM(freq) AS n
      FROM pairs{i} GROUP BY pair
      ORDER BY n DESC, pair LIMIT 1
    ),
    words{i} AS MATERIALIZED (
      SELECT trim({"".join(["replace(" for _ in range(passes)])}' ' || w.sym || ' '{"".join([", ' ' || t.pair || ' ', ' ' || t.merged || ' ')" for _ in range(passes)])}) AS sym,
             w.freq
      FROM {prev} w, top{i} t
    )"""
        )
        selects.append(
            f"SELECT {i} AS round, pair, merged, CAST(n AS BIGINT) AS n FROM top{i}"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY round"
    )


register(
    "text_bpe_train_merges",
    _bpe_oracle_sql(_BPE_ROUNDS, _BPE_PASSES).format(toks=SQL_TOKENS.replace("{", "{{").replace("}", "}}")),
)(_text_bpe_train_merges)


# ---------------------------------------------------------------------------
# Spatial nearest-neighbor via grid blocking — the 2-D analogue of the
# LSH bucket join: points land in CELL×CELL grid cells, each probe joins
# only its 3×3 neighbor cells (candidate generation), and the nearest
# candidate wins by exact integer distance² with an id tie-break. The
# contract is "nearest within one cell ring" (candidates beyond ~CELL are
# out of scope by construction) — deterministic, and the oracle replays
# the identical ring logic. Coordinates are synthesized from customer
# keys so the whole computation is pure 64-bit integer arithmetic — no
# trig, no floats, no cross-engine libm drift.
#
# Scale shape: probes explode ×9 (the ring), corpus maps 1:1 to cells;
# one equi-join on the cell key + one min_by hash agg. At 100 TB choose
# CELL so cell occupancy is O(1)–O(100): fan-out stays 9× probes.
# ---------------------------------------------------------------------------

_GEO_MOD = 10000
_GEO_CELL = 500


def _geo_grid_nearest(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 2654435761) % _GEO_MOD).alias("x"),
        ((F.col("c_custkey") * 40503) % _GEO_MOD).alias("y"),
    )
    corpus = pts.select(
        "id", "x", "y",
        F.expr(f"concat(x div {_GEO_CELL}, ':', y div {_GEO_CELL})").alias("cell"),
    )
    probes = (
        pts.filter(F.col("id") % 50 == 0)
        .select(
            F.col("id").alias("pid"), F.col("x").alias("px"), F.col("y").alias("py")
        )
        .select(
            "pid", "px", "py",
            F.explode(
                F.expr(
                    f"""
                    flatten(transform(sequence(-1, 1), dx ->
                      transform(sequence(-1, 1), dy ->
                        concat(px div {_GEO_CELL} + dx, ':', py div {_GEO_CELL} + dy))))
                    """
                )
            ).alias("cell"),
        )
    )
    cand = probes.join(corpus, "cell").where(F.col("id") != F.col("pid"))
    d2 = (F.col("px") - F.col("x")) * (F.col("px") - F.col("x")) + (
        F.col("py") - F.col("y")
    ) * (F.col("py") - F.col("y"))
    # nearest by (d2, id): packed key keeps the argmin a single max_by-style
    # agg. Shift is 2^40 so ids never alias into d2: candidates come from
    # neighboring 500-wide cells, so d2 < 2*(2*500)^2 = 2e6 and
    # d2 * 2^40 < 2.2e18 < int64 max, while id has 2^40 (~1.1e12) of room
    # (the old 2^20 shift silently corrupted nearest_id once c_custkey
    # reached ~1M, i.e. around sf7 — ADVICE r4).
    key = d2 * F.lit(1 << 40) + F.col("id")
    return (
        cand.groupBy("pid", "px", "py")
        .agg(F.min(key).alias("k"))
        .select(
            "pid", "px", "py",
            F.expr(f"k div {1 << 40}").alias("d2"),
            (F.col("k") % (1 << 40)).alias("nearest_id"),
        )
        .orderBy("pid")
    )


register(
    "geo_grid_nearest",
    f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             (c_custkey * 2654435761) % {_GEO_MOD} AS x,
             (c_custkey * 40503) % {_GEO_MOD} AS y
      FROM customer
    ),
    corpus AS (
      SELECT id, x, y, (x // {_GEO_CELL}) || ':' || (y // {_GEO_CELL}) AS cell
      FROM pts
    ),
    probes AS (
      SELECT p.id AS pid, p.x AS px, p.y AS py,
             ((p.x // {_GEO_CELL}) + dx.d) || ':' || ((p.y // {_GEO_CELL}) + dy.d) AS cell
      FROM pts p, (VALUES (-1), (0), (1)) dx(d), (VALUES (-1), (0), (1)) dy(d)
      WHERE p.id % 50 = 0
    ),
    cand AS (
      SELECT pr.pid, pr.px, pr.py,
             ((pr.px - c.x) * (pr.px - c.x) + (pr.py - c.y) * (pr.py - c.y))
               * {1 << 40} + c.id AS k
      FROM probes pr JOIN corpus c USING (cell)
      WHERE c.id <> pr.pid
    )
    SELECT pid, px, py,
           MIN(k) // {1 << 40} AS d2,
           MIN(k) % {1 << 40} AS nearest_id
    FROM cand GROUP BY pid, px, py ORDER BY pid
    """,
)(_geo_grid_nearest)


# ---------------------------------------------------------------------------
# N-gram novelty score — the redundancy/curriculum signal: for each doc
# (in doc_id ingestion order), the fraction of its distinct shingles
# whose FIRST occurrence in the corpus is this doc. A corpus saturating
# on old n-grams trends toward 0; dedup pipelines read this curve to
# decide when additional data stops adding information.
#
# Shape: one explode → min(doc_id) per shingle (hash agg) → join back on
# shingle → per-doc ratio. No window over the corpus, no ordering shuffle
# — "first occurrence" is just MIN over the ingestion key.
# ---------------------------------------------------------------------------


def _text_ngram_novelty(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    sh = docs.withColumn("_toks", F.expr(
        "split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')"
    )).select(
        "doc_id",
        F.explode_outer(
            F.expr(
                """
                CASE WHEN size(_toks) < 3 THEN cast(array() as array<string>)
                ELSE array_distinct(transform(
                  sequence(1, size(_toks) - 2),
                  i -> concat_ws(' ', slice(_toks, i, 3))
                )) END
                """
            )
        ).alias("shingle"),
    )
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("shingle").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_shingles")).alias(
                "novelty"
            ),
        )
        .orderBy("doc_id")
    )


register(
    "text_ngram_novelty",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKENS} AS tk FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(tk) - 1),
                                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
               AS shingle
      FROM toks
    ),
    first AS (
      SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT s.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS novelty
    FROM sh s JOIN first f USING (shingle)
    GROUP BY s.doc_id ORDER BY s.doc_id
    """,
)(_text_ngram_novelty)


# ---------------------------------------------------------------------------
# Entity resolution over the customer master (operators/resolution.py):
# two blocking passes (16-char name prefix; nation + 2-char name suffix)
# bound the candidate join — block sizes are O(1) in corpus size, so
# candidate volume scales linearly where all-pairs is O(n²) — then a
# levenshtein<=1 verify, large-star/small-star closure into entity
# clusters, and min-id survivor election. The oracle independently
# replays both blocks, the verify, and the closure as a recursive-CTE
# transitive closure — certifying blocking + iterative clustering
# end-to-end.
# ---------------------------------------------------------------------------


def _pipeline_entity_resolution(spark, sf_dir):
    from airflow_postgres_csv_spark.operators.resolution import resolve_entities

    cust = t(spark, sf_dir, "customer")
    return resolve_entities(
        cust,
        id_col="c_custkey",
        name_col="c_name",
        block_keys=[
            F.substring("c_name", 1, 16),
            F.concat(
                F.col("c_nationkey").cast("string"),
                F.lit(":"),
                F.expr("right(c_name, 2)"),
            ),
        ],
        max_dist=1,
    ).orderBy("c_custkey")


register(
    "pipeline_entity_resolution",
    """
    WITH RECURSIVE keyed AS (
      SELECT c_custkey AS id, c_name AS nm, c_nationkey AS nk FROM customer
    ),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b, a.nm AS nm_a, b.nm AS nm_b
      FROM keyed a JOIN keyed b
        ON substring(a.nm, 1, 16) = substring(b.nm, 1, 16) AND a.id < b.id
      UNION
      SELECT a.id, b.id, a.nm, b.nm
      FROM keyed a JOIN keyed b
        ON a.nk = b.nk AND right(a.nm, 2) = right(b.nm, 2) AND a.id < b.id
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM cand
      WHERE levenshtein(nm_a, nm_b) <= 1
    ),
    sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
    walk(node, root) AS (
      SELECT c_custkey, c_custkey FROM customer
      UNION
      SELECT s.v, w.root FROM walk w JOIN sym s ON s.u = w.node
    ),
    assign AS (
      SELECT node AS c_custkey, MIN(root) AS cluster_id FROM walk GROUP BY node
    )
    SELECT c_custkey, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           c_custkey = cluster_id AS is_survivor
    FROM assign
    ORDER BY c_custkey
    """,
)(_pipeline_entity_resolution)
