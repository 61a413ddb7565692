"""Deduplication operators over the `documents` corpus (SURVEY.md §2.8).

Origin N: not in the reference (SLR has no document processing) — mandated by
the north star's LLM-data-pipeline requirement (BASELINE.json:6). Five dedup
families: exact, hash-key, n-gram Jaccard, MinHash+LSH, SimHash, plus
embedding-cosine near-dup (in similarity.py).

Scale notes (100 TB):
* exact dedup groups by a 256-bit content hash, never by the raw text —
  the shuffle moves 32-byte keys, not documents.
* n-gram Jaccard self-joins on 3-word shingles: shingles are near-unique, so
  the join fan-out is ~linear in corpus size (candidate pairs only where
  shingles collide), unlike an O(n²) text cross-join.
* MinHash/LSH banding turns near-dup detection into an equi-join on band
  hashes — the standard sublinear candidate generation at corpus scale.
* SimHash reduces each doc to one 64-bit signature; near-dups differ in few
  bits, found by equi-join on rotated prefix blocks (here: signature + hamming
  distance on candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("documents",))["documents"]


# ---------------------------------------------------------------------------
# D1 — exact duplicates: corpus stats + per-group counts.
# (documents fixture plants 8 dup groups at sf0.1 — FIXTURES.md §A)
# ---------------------------------------------------------------------------

@register(
    "dedup_exact_stats",
    oracle="""
    SELECT count(*)                                  AS n_total,
           count(DISTINCT text)                      AS n_distinct,
           count(*) - count(DISTINCT text)           AS n_dup_rows
    FROM documents
    """,
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("text").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_dup_rows"),
    )


@register(
    "dedup_exact_groups",
    oracle="""
    SELECT md5(text) AS text_hash, count(*) AS n_copies,
           min(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY md5(text)
    HAVING count(*) > 1
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group by content hash, not raw text: at 100 TB the shuffle key is
    16/32 bytes instead of whole documents; `keeper_doc_id = min(doc_id)`
    is the canonical survivor a dedup pass would keep."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
        .where(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# D2a — n-gram (3-word shingle) Jaccard similarity, exact.
# Candidate pairs come only from shingle collisions (equi-join), then exact
# Jaccard = |A∩B| / (|A|+|B|-|A∩B|) filters at the threshold.
# ---------------------------------------------------------------------------

JACCARD_THRESHOLD = 0.8


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), idx AS (
        SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
        FROM tok
    ), sh AS (
        SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS sh FROM idx
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_common,
           round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    words = F.split("text", " ")
    # Guard: for docs with <3 tokens Spark's sequence(1, 0) is DESCENDING
    # [1, 0] (default step -1 when start > stop) and slice(words, 0, 3)
    # throws INVALID_PARAMETER_VALUE.START. DuckDB's generate_series(1, 0)
    # is empty, so the engines would diverge — emit no shingles instead.
    shingle_ix = F.when(
        F.size(words) >= 3, F.sequence(F.lit(1), F.size(words) - 2)
    ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
    shingles = (
        d.select(
            "doc_id",
            F.explode(
                F.transform(shingle_ix, lambda i: F.concat_ws(" ", F.slice(words, i, 3)))
            ).alias("sh"),
        )
        .distinct()
    )
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .where(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "n_common", F.round(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# D2b — MinHash + LSH near-dup candidates (spark.ml MinHashLSH over a
# HashingTF shingle vector). Hash family is engine-specific → rows-only.
# ---------------------------------------------------------------------------

@register("dedup_minhash_lsh")  # rows-only: MinHash seeds are engine-specific
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF, MinHashLSH, NGram, Tokenizer

    d = _docs(spark, sf_dir)
    tokens = Tokenizer(inputCol="text", outputCol="tokens").transform(d)
    grams = NGram(n=3, inputCol="tokens", outputCol="grams").transform(tokens)
    tf = HashingTF(inputCol="grams", outputCol="features", numFeatures=1 << 18,
                   binary=True).transform(grams).where(F.size("grams") > 0)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8,
                     seed=42).fit(tf)
    pairs = lsh.approxSimilarityJoin(tf, tf, 1.0 - JACCARD_THRESHOLD,
                                     distCol="jaccard_dist")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("est_jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# D2c — SimHash signatures, fully native (xxhash64 per token, bitwise vote).
# Near-dup docs get signatures within a few bits; exact dups get equal
# signatures. xxhash64 seed is Spark-specific → rows-only.
# ---------------------------------------------------------------------------

@register("dedup_simhash")  # rows-only: xxhash64 is engine-specific
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-reduce SimHash: explode (doc, token-hash, bit 0..63), vote ±1 per
    bit by whether the hash has it set, signature = Σ 2^bit over positive
    votes. Pure DataFrame ops — this exact shape distributes at 100 TB (the
    shuffle key is (doc_id, bit), combiner-friendly)."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok"))
    bits = toks.select(
        "doc_id", F.xxhash64("tok").alias("h"),
        F.explode(F.sequence(F.lit(0), F.lit(62))).alias("bit"))
    votes = bits.groupBy("doc_id", "bit").agg(
        F.sum(F.when(F.expr("(shiftright(h, bit) & 1) = 1"), 1).otherwise(-1))
        .alias("vote"))
    sigs = votes.groupBy("doc_id").agg(
        F.sum(F.when(F.col("vote") > 0,
                     F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
              .otherwise(F.lit(0))).alias("simhash"))
    # Exact-duplicate (and strong near-dup) clusters: equal signatures.
    return (
        sigs.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
        .where(F.col("n_docs") > 1)
        .orderBy("keeper_doc_id")
    )
