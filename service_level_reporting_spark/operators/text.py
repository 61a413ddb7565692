"""Text-analysis operators over the `documents` corpus (SURVEY.md §2.8 D5/D6
plus the north-star text family: language-ID, quality scoring, token
counting, fingerprinting).

Origin N — LLM-pipeline mandate (BASELINE.json:6). Everything except the
fingerprint is expressible in both Spark SQL and DuckDB SQL, so these carry
full value-hash oracles.

Note on language-ID: the testdata `lang` column is synthetic and UNCORRELATED
with the text (all langs share one vocabulary — verified at build time), so no
classifier can recover it. The operator is still implemented for real: it
scores each doc against per-language marker-word profiles and argmaxes —
the machinery (profile scoring, tie-breaking) is what the oracle verifies.

Scale notes: token explode → groupBy is the classic map-reduce wordcount
(combiner-friendly, no skew at realistic vocabularies); per-doc stats are
single-pass scans with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("documents",))["documents"]


# ---------------------------------------------------------------------------
# D5 — per-corpus text stats by (lang, source): doc counts, whitespace AND
# regex (BPE-ish subword) token counts, char counts, and validation that the
# redundant n_chars column agrees. (Round-2 consolidation: the regex token
# counter shares this scan, so it is a column here, not a second query.)
# ---------------------------------------------------------------------------

TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n_tok = F.size(F.split("text", " "))
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).cast("long").alias("n_tokens"),
        F.sum(F.size(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0)))
        .cast("long").alias("n_regex_tokens"),
        F.sum(F.length("text")).cast("long").alias("n_chars_total"),
        SF.r6(F.avg(F.length("text"))).alias("avg_chars"),
        F.count(F.when(F.length("text") != F.col("n_chars"), F.lit(1)))
        .alias("n_chars_mismatch"),
    )


# ---------------------------------------------------------------------------
# D6 — corpus token frequency top-k (map-reduce wordcount)
# ---------------------------------------------------------------------------

@register(
    "text_token_topk",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# text_profile_suite — corpus profiling as ONE labeled result (round-3
# consolidation of text_stats + text_quality_language, freeing a registry
# slot inside the driver's 50-row correctness window):
#   'stats'    — per (key1 = lang, key2 = source) volume counters: docs,
#     whitespace tokens, BPE-ish regex tokens, chars, metadata drift.
#   'quality'  — length/stopword/diversity heuristics per doc plus a
#     MassiveText-style repetition signal (fraction of duplicate word
#     2-grams), aggregated per source (key1 = source; the "filter
#     low-quality shards" signal). A quality doc is long enough, diverse
#     enough, and not repetition-dominated (dup-2-gram fraction <= 0.5).
#   'language' — marker-word profile scoring + deterministic argmax,
#     confusion counts per (key1 = predicted, key2 = actual). Labels are
#     synthetic — see module docstring — so this verifies the scoring
#     machinery, not classifier accuracy.
# All three parts are one scan each over documents, partial-aggregated
# before the tiny union — the suite is three wordcount-shaped passes, not a
# per-doc materialization.
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "a", "of", "and", "to")
_STOP_SQL = "('the', 'a', 'of', 'and', 'to')"

LANG_PROFILES = {
    "en": ("the", "a", "value", "fast"),
    "de": ("table", "hash", "join", "group"),
    "es": ("data", "row", "stream", "small"),
    "fr": ("window", "query", "agg", "line"),
    "zh": ("merge", "batch", "big", "slow"),
}


def _profile_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({words})))"


@register(
    "text_profile_suite",
    oracle=f"""
    WITH scored AS (
        SELECT source,
               len(string_split(text, ' ')) AS n_tok,
               len(list_distinct(string_split(text, ' '))) AS n_uniq,
               len(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL}))
                   AS n_stop,
               CASE WHEN len(string_split(text, ' ')) >= 2 THEN
                   1.0 - len(list_distinct(list_transform(
                             generate_series(1, len(string_split(text, ' ')) - 1),
                             i -> string_split(text, ' ')[i] || ' ' ||
                                  string_split(text, ' ')[i + 1])))
                         * 1.0 / (len(string_split(text, ' ')) - 1)
                   ELSE 0.0 END AS dup2
        FROM documents
    ),
    lang_scored AS (
        SELECT doc_id, lang AS actual_lang,
               {_profile_sql('en')} AS s_en,
               {_profile_sql('de')} AS s_de,
               {_profile_sql('es')} AS s_es,
               {_profile_sql('fr')} AS s_fr,
               {_profile_sql('zh')} AS s_zh
        FROM documents
    ),
    best AS (
        SELECT doc_id, actual_lang,
               CASE greatest(s_en, s_de, s_es, s_fr, s_zh)
                   WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
                   WHEN s_fr THEN 'fr' WHEN s_zh THEN 'zh' END AS predicted_lang
        FROM lang_scored
    )
    SELECT 'stats' AS part, lang AS key1, source AS key2,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(len(regexp_extract_all(text, '{TOKEN_REGEX}'))) AS BIGINT)
               AS n_regex_tokens,
           CAST(sum(length(text)) AS BIGINT) AS n_chars_total,
           round(avg(length(text)), 6) AS avg_chars,
           count(CASE WHEN length(text) != n_chars THEN 1 END)
               AS n_chars_mismatch,
           CAST(NULL AS DOUBLE) AS avg_tokens, CAST(NULL AS DOUBLE) AS avg_diversity,
           CAST(NULL AS DOUBLE) AS avg_stopword_ratio,
           CAST(NULL AS DOUBLE) AS avg_dup2_frac,
           CAST(NULL AS BIGINT) AS n_quality_docs
    FROM documents
    GROUP BY lang, source
    UNION ALL
    SELECT 'quality', source, CAST(NULL AS VARCHAR),
           count(*),
           NULL, NULL, NULL, NULL, NULL,
           round(avg(n_tok), 6),
           round(avg(n_uniq / n_tok), 6),
           round(avg(n_stop / n_tok), 6),
           round(avg(dup2), 6),
           count(CASE WHEN n_tok >= 20 AND n_uniq / n_tok >= 0.3
                       AND dup2 <= 0.5 THEN 1 END)
    FROM scored
    GROUP BY source
    UNION ALL
    SELECT 'language', predicted_lang, actual_lang, count(*),
           NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
    FROM best GROUP BY predicted_lang, actual_lang
    """,
)
def text_profile_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    d = _docs(spark, sf_dir)

    def widen(df, **parts):
        """Project onto the suite's common 14-column schema; absent metric
        columns become typed NULLs (merged-suite rule: identical names AND
        casts on both engines)."""
        cols = [F.lit(parts.pop("part")).alias("part")]
        for name, typ in (("key1", "string"), ("key2", "string"),
                          ("n_docs", "long"), ("n_tokens", "long"),
                          ("n_regex_tokens", "long"), ("n_chars_total", "long"),
                          ("avg_chars", "double"), ("n_chars_mismatch", "long"),
                          ("avg_tokens", "double"), ("avg_diversity", "double"),
                          ("avg_stopword_ratio", "double"),
                          ("avg_dup2_frac", "double"), ("n_quality_docs", "long")):
            cols.append((F.col(name) if name in df.columns
                         else F.lit(None).cast(typ)).alias(name))
        return df.select(*cols)

    def member_of(words):
        # Single-arg lambda required: PySpark reads the lambda arity to pick
        # the HOF signature, so a defaulted second arg breaks it.
        return lambda t: t.isin(*words)

    # r13 (guide §2.3): the three parts used to scan documents (and split
    # text) once EACH (plans/r13/text_profile_suite_before.txt: 3 scans).
    # All their inputs are per-doc scalars, so one scan + one tokenize pass
    # computes the lot into a narrow persisted frame; the three labeled
    # aggregates (different group keys — that's 3 tiny shuffles, fine) now
    # read ~60 bytes/doc instead of re-reading and re-splitting `text`.
    # Expressions are IDENTICAL to the former per-part spellings — only the
    # scan is shared; values are hash-checked unchanged.
    dup2 = F.when(
        F.size(F.col("toks")) >= 2,
        1.0 - F.size(F.array_distinct(F.col("grams")))
        / (F.size(F.col("toks")) - 1)).otherwise(F.lit(0.0))
    perdoc = (
        d.select("lang", "source", "n_chars", "text",
                 F.split("text", " ").alias("toks"))
        .withColumn("grams", F.expr(
            "zip_with(slice(toks, 1, size(toks) - 1), "
            "slice(toks, 2, size(toks) - 1), (a, b) -> concat(a, ' ', b))"))
        .select(
            "lang", "source",
            F.size("toks").alias("n_tok"),
            F.size(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0))
            .alias("n_rtok"),
            F.length("text").alias("len_text"),
            (F.length("text") != F.col("n_chars")).alias("mismatch"),
            F.size(F.array_distinct("toks")).alias("n_uniq"),
            F.size(F.filter(F.col("toks"),
                            lambda t: t.isin(*STOPWORDS))).alias("n_stop"),
            dup2.alias("dup2"),
            *[F.size(F.filter(F.col("toks"), member_of(words)))
              .alias(f"s_{lang}") for lang, words in LANG_PROFILES.items()])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    stats = widen(
        perdoc.groupBy(F.col("lang").alias("key1"),
                       F.col("source").alias("key2")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("n_rtok").cast("long").alias("n_regex_tokens"),
            F.sum("len_text").cast("long").alias("n_chars_total"),
            SF.r6(F.avg("len_text")).alias("avg_chars"),
            F.count(F.when(F.col("mismatch"), F.lit(1)))
            .alias("n_chars_mismatch")),
        part="stats")

    diversity = F.col("n_uniq") / F.col("n_tok")
    quality = widen(
        perdoc.groupBy(F.col("source").alias("key1")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            SF.r6(F.avg("n_tok")).alias("avg_tokens"),
            SF.r6(F.avg(diversity)).alias("avg_diversity"),
            SF.r6(F.avg(F.col("n_stop") / F.col("n_tok"))).alias("avg_stopword_ratio"),
            SF.r6(F.avg("dup2")).alias("avg_dup2_frac"),
            F.count(F.when((F.col("n_tok") >= 20) & (diversity >= 0.3)
                           & (F.col("dup2") <= 0.5), F.lit(1)))
            .alias("n_quality_docs"),
        ),
        part="quality")

    scores = {lang: F.col(f"s_{lang}") for lang in LANG_PROFILES}
    best = F.greatest(*scores.values())
    # Tie-break order must match the oracle's CASE order: de,en,es,fr,zh
    predicted = (
        F.when(scores["de"] == best, "de")
        .when(scores["en"] == best, "en")
        .when(scores["es"] == best, "es")
        .when(scores["fr"] == best, "fr")
        .otherwise("zh")
    )
    language = widen(
        perdoc.select(predicted.alias("key1"), F.col("lang").alias("key2"))
        .groupBy("key1", "key2")
        .agg(F.count(F.lit(1)).alias("n_docs")),
        part="language")
    return stats.unionByName(quality).unionByName(language)


# ---------------------------------------------------------------------------
# Document fingerprint: rolling polynomial hash over tokens — deterministic
# across engines ONLY because we define the arithmetic ourselves (mod 2^31-1,
# base 131, over token lengths+first-char codes). SQL-expressible both sides.
# ---------------------------------------------------------------------------

FP_MOD = 2147483647
FP_BASE = 131


@register(
    "text_fingerprint",
    aux=True,   # r8 rotation (VERDICT item 4): subsumed by
    #             text_profile_suite in the driver window; stays
    #             SQL-oracled in the pytest differential
    oracle=f"""
    -- empty tokens (leading/trailing/double spaces) are dropped on BOTH
    -- sides: Spark ascii('') = 0 but DuckDB ord(''[1]) = -1, which would
    -- shift the polynomial hash
    SELECT doc_id,
           CAST(list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(
                       list_filter(string_split(text, ' '), t -> t <> ''),
                       t -> CAST(length(t) * 256 + ord(t[1]) AS BIGINT))),
               (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}
           ) AS BIGINT) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    token_code = lambda t: (F.length(t) * 256 + F.ascii(F.substring(t, 1, 1))).cast("long")  # noqa: E731
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_BASE + token_code(t)) % FP_MOD,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


# ---------------------------------------------------------------------------
# Integrative training-corpus pipeline: the composed form of the LLM-data
# ops — exact-dedup (keep lowest doc_id), quality gate (token count +
# lexical diversity), language gate — with per-source survival accounting
# at each stage. This is the query a data-curation run executes before
# tokenization; every stage is the registered operator's expression reused,
# so the composition carries the same oracle-checked semantics.
# ---------------------------------------------------------------------------

MIN_TOKENS = 8
MIN_DIVERSITY = 0.3


@register(
    "training_corpus_pipeline",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source, lang, text,
               len(string_split(text, ' ')) AS n_tok,
               len(list_distinct(string_split(text, ' ')))
                 * 1.0 / len(string_split(text, ' ')) AS diversity,
               row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM documents
    ),
    flags AS (
        SELECT source,
               rn = 1 AS keep_dedup,
               (rn = 1 AND n_tok >= {MIN_TOKENS}
                AND diversity >= {MIN_DIVERSITY}) AS keep_quality,
               (rn = 1 AND n_tok >= {MIN_TOKENS}
                AND diversity >= {MIN_DIVERSITY} AND lang = 'en') AS keep_final
        FROM ranked
    )
    SELECT source,
           count(*) AS n_total,
           count(CASE WHEN keep_dedup THEN 1 END) AS n_after_dedup,
           count(CASE WHEN keep_quality THEN 1 END) AS n_after_quality,
           count(CASE WHEN keep_final THEN 1 END) AS n_final,
           round(count(CASE WHEN keep_final THEN 1 END) * 1.0 / count(*), 6)
               AS pct_kept
    FROM flags GROUP BY source
    """,
)
def training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    diversity = F.size(F.array_distinct(toks)) / n_tok
    rn = F.row_number().over(Window.partitionBy("text").orderBy("doc_id"))
    ranked = d.select(
        "doc_id", "source", "lang",
        n_tok.alias("n_tok"), diversity.alias("diversity"),
        rn.alias("rn"),
    )
    keep_dedup = F.col("rn") == 1
    keep_quality = (keep_dedup & (F.col("n_tok") >= MIN_TOKENS)
                    & (F.col("diversity") >= MIN_DIVERSITY))
    keep_final = keep_quality & (F.col("lang") == "en")
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(keep_dedup, 1)).alias("n_after_dedup"),
        F.count(F.when(keep_quality, 1)).alias("n_after_quality"),
        F.count(F.when(keep_final, 1)).alias("n_final"),
        SF.r6(F.count(F.when(keep_final, 1)) / F.count(F.lit(1))).alias("pct_kept"),
    )


# ---------------------------------------------------------------------------
# r7 — repetition-based quality filtering (the Gopher/MassiveText rules,
# Rae et al. 2021 §A1.1): documents dominated by repeated n-grams are
# low-quality (boilerplate, keyword stuffing, degenerate generations) and
# get filtered before training. Per doc: duplicate-word fraction, the
# heaviest 2-/3-gram's character share, and the fraction of tokens covered
# by WITHIN-doc duplicated 5-grams (coverage via gaps-and-islands, so
# overlapping occurrences count each token once). ``keep`` applies
# Gopher-shaped thresholds.
#
# Scale notes: dup_word_frac is a pure array expression (zero shuffle);
# the n-gram parts are per-doc wordcounts — groupBy(doc, gram) with
# map-side partial aggregation, key cardinality ~n_tokens per doc, no
# cross-doc skew; the 5-gram coverage window partitions by doc_id, bounded
# by the longest document, not the corpus.
# ---------------------------------------------------------------------------

REP_TOP2_MAX = 0.20     # Gopher: top 2-gram char fraction thresholds
REP_TOP3_MAX = 0.18
REP_DUP5_MAX = 0.30     # duplicated-5-gram token coverage


def _rep_sql() -> str:
    return f"""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               length(text) AS n_chars
        FROM documents
    ), stats AS (
        SELECT doc_id, toks, n_chars,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               round(1.0 - len(list_distinct(toks)) * 1.0 / len(toks), 6)
                   AS dup_word_frac
        FROM base
    ), pos2 AS (
        SELECT doc_id, n_chars, toks,
               CAST(unnest(range(0, len(toks) - 1)) AS BIGINT) AS pos
        FROM stats WHERE len(toks) >= 2
    ), c2 AS (
        SELECT doc_id, array_to_string(toks[pos+1:pos+2], ' ') AS gram,
               count(*) AS c, any_value(n_chars) AS nc
        FROM pos2 GROUP BY doc_id, gram
    ), t2 AS (
        SELECT doc_id,
               round(max(c * length(gram)) * 1.0 / any_value(nc), 6)
                   AS top2_char_frac
        FROM c2 GROUP BY doc_id
    ), pos3 AS (
        SELECT doc_id, n_chars, toks,
               CAST(unnest(range(0, len(toks) - 2)) AS BIGINT) AS pos
        FROM stats WHERE len(toks) >= 3
    ), c3 AS (
        SELECT doc_id, array_to_string(toks[pos+1:pos+3], ' ') AS gram,
               count(*) AS c, any_value(n_chars) AS nc
        FROM pos3 GROUP BY doc_id, gram
    ), t3 AS (
        SELECT doc_id,
               round(max(c * length(gram)) * 1.0 / any_value(nc), 6)
                   AS top3_char_frac
        FROM c3 GROUP BY doc_id
    ), pos5 AS (
        SELECT doc_id, n_tokens, toks,
               CAST(unnest(range(0, len(toks) - 4)) AS BIGINT) AS pos
        FROM stats WHERE len(toks) >= 5
    ), g5 AS (
        SELECT doc_id, n_tokens, pos,
               array_to_string(toks[pos+1:pos+5], ' ') AS gram
        FROM pos5
    ), d5 AS (
        SELECT doc_id, n_tokens, pos,
               count(*) OVER (PARTITION BY doc_id, gram) AS c
        FROM g5
    ), m5 AS (
        SELECT doc_id, n_tokens, pos,
               CASE WHEN pos - lag(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos) <= 5
                    THEN 0 ELSE 1 END AS brk
        FROM d5 WHERE c > 1
    ), i5 AS (
        SELECT doc_id, n_tokens, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM m5
    ), cov AS (
        SELECT doc_id, any_value(n_tokens) AS nt,
               sum(covered) AS covered
        FROM (SELECT doc_id, island, any_value(n_tokens) AS n_tokens,
                     max(pos) + 5 - min(pos) AS covered
              FROM i5 GROUP BY doc_id, island)
        GROUP BY doc_id
    ), t5 AS (
        SELECT doc_id,
               round(least(covered * 1.0 / nt, 1.0), 6) AS dup5_token_frac
        FROM cov
    )
    SELECT s.doc_id, s.n_tokens, s.dup_word_frac,
           coalesce(t2.top2_char_frac, 0.0) AS top2_char_frac,
           coalesce(t3.top3_char_frac, 0.0) AS top3_char_frac,
           coalesce(t5.dup5_token_frac, 0.0) AS dup5_token_frac,
           CAST(CASE WHEN coalesce(t2.top2_char_frac, 0.0) < {REP_TOP2_MAX}
                      AND coalesce(t3.top3_char_frac, 0.0) < {REP_TOP3_MAX}
                      AND coalesce(t5.dup5_token_frac, 0.0) < {REP_DUP5_MAX}
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM stats s
    LEFT JOIN t2 USING (doc_id)
    LEFT JOIN t3 USING (doc_id)
    LEFT JOIN t5 USING (doc_id)
    """


@register(
    "text_repetition_suite",
    # r8 rotation (VERDICT item 4): promoted into the driver's 50-row
    # hash window (slot freed by text_fingerprint)
    oracle=_rep_sql(),
)
def text_repetition_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters, one row per doc: duplicate-word
    fraction (array expression, no shuffle), heaviest 2-/3-gram character
    share (per-doc wordcount, ``max(count * gram_chars) / doc_chars`` —
    the deterministic tie-free form of 'most frequent n-gram'), and the
    token-coverage fraction of within-doc duplicated 5-grams (islands
    merge overlapping occurrences so each token counts once). ``keep`` =
    all three under the Gopher-shaped thresholds."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir).select("doc_id", "text")
    # r13 (guide §2.3): `stats` feeds FOUR consumers (t2, t3, the 5-gram
    # coverage, and the final projection); unpersisted, each one re-scanned
    # documents and re-split text (plans/r13/text_repetition_suite_before
    # .txt: 4 parquet scans + 4 splits). One scan + one split now.
    stats = d.select(
        "doc_id", F.split("text", " ").alias("toks"),
        F.length("text").alias("n_chars")
    ).select(
        "doc_id", "toks", "n_chars",
        F.size("toks").cast("long").alias("n_tokens"),
        SF.r6(1.0 - F.size(F.array_distinct("toks")) / F.size("toks"))
            .alias("dup_word_frac")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    def grams(n: int) -> DataFrame:
        return (stats.filter(F.size("toks") >= n)
                .select("doc_id", "n_chars", "n_tokens",
                        F.explode(F.expr(
                            f"transform(sequence(0, size(toks) - {n}), "
                            f"i -> struct(CAST(i AS BIGINT) AS pos, "
                            f"array_join(slice(toks, i + 1, {n}), ' ') "
                            f"AS gram))")).alias("g"))
                .select("doc_id", "n_chars", "n_tokens",
                        "g.pos", "g.gram"))

    def top_frac(n: int, alias: str) -> DataFrame:
        return (grams(n)
                .groupBy("doc_id", "gram")
                .agg(F.count("*").alias("c"),
                     F.first("n_chars").alias("nc"))
                .groupBy("doc_id")
                .agg(SF.r6(F.max(F.col("c") * F.length("gram"))
                           / F.first("nc")).alias(alias)))

    wd = Window.partitionBy("doc_id").orderBy("pos")
    five = grams(5).withColumn(
        "c", F.count("*").over(Window.partitionBy("doc_id", "gram")))
    cov = (five.filter(F.col("c") > 1)
           .withColumn("brk", F.when(F.col("pos") - F.lag("pos").over(wd)
                                     <= 5, 0).otherwise(1))
           .withColumn("island", F.sum("brk").over(wd))
           .groupBy("doc_id", "island")
           .agg(F.first("n_tokens").alias("nt"),
                (F.max("pos") + 5 - F.min("pos")).alias("covered"))
           .groupBy("doc_id")
           .agg(SF.r6(F.least(F.sum("covered") / F.first("nt"),
                              F.lit(1.0))).alias("dup5_token_frac")))

    t2 = top_frac(2, "top2_char_frac")
    t3 = top_frac(3, "top3_char_frac")
    out = (stats.select("doc_id", "n_tokens", "dup_word_frac")
           .join(t2, "doc_id", "left")
           .join(t3, "doc_id", "left")
           .join(cov, "doc_id", "left")
           .fillna(0.0, subset=["top2_char_frac", "top3_char_frac",
                                "dup5_token_frac"]))
    return out.withColumn(
        "keep",
        ((F.col("top2_char_frac") < REP_TOP2_MAX)
         & (F.col("top3_char_frac") < REP_TOP3_MAX)
         & (F.col("dup5_token_frac") < REP_DUP5_MAX))
        .cast("long"))
