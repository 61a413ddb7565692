"""Corpus-curation operators (SURVEY.md §2.8 round-3 additions): TF-IDF
term weighting, canonical-document selection over duplicate clusters, and a
curation suite (deterministic stratified sampling, PII-style redaction,
column profiling, training-sequence packing, source temperature
resampling).

Origin N: not in the reference (SLR has no document processing) — mandated
by the north star's LLM-data-pipeline requirement. These are the remaining
steps a training-data curation run performs between dedup and tokenization:
pick ONE survivor per duplicate cluster, down-sample per stratum to a
target mix, scrub PII-shaped spans, and profile the result.

Scale notes (100 TB):
* TF-IDF is two wordcount-shaped aggregates (tf on (doc, term), df on
  term) + a broadcast of the 1-row corpus count — partial aggregation
  map-side, shuffles carry (doc_id, token) pairs, never documents. The
  per-doc top-k window partitions by doc_id: bounded by one doc's
  vocabulary.
* Canonical selection reuses the connected-component labels
  (dedup.cluster_labels) — one join on the 8-byte doc key + a per-cluster
  window (clusters are small by construction).
* Stratified sampling orders each stratum by md5(doc_id) — a deterministic
  uniform permutation, so "first ceil(f·n) per stratum" is an exact-rate
  sample that is reproducible across engines and runs (no RNG state), and
  the window partitions by stratum, not corpus.
* Redaction/profiling are single-pass scans, no shuffle beyond the final
  tiny aggregate. Regex patterns are restricted to the Java∩RE2 common
  dialect so Spark (java.util.regex) and DuckDB (RE2) agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from service_level_reporting_spark import functions as SF
from service_level_reporting_spark.operators.dedup import (
    LABELS_CTES_SQL, cluster_labels)
from service_level_reporting_spark.registry import register
from service_level_reporting_spark.tables import load_tables


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("documents",))["documents"]


# ---------------------------------------------------------------------------
# TF-IDF top terms per document. idf = ln((N+1)/(df+1)) (smoothed), score =
# tf · idf, top-3 terms per doc with a deterministic tie-break.
# ---------------------------------------------------------------------------

TFIDF_TOPK = 3


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                          t -> t <> '')) AS token
        FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
           GROUP BY doc_id, token),
    df AS (SELECT token, count(*) AS df
           FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token, tf.tf,
               round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6)
                   AS tfidf,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) DESC,
                            tf.token) AS rk
        FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tf, tfidf
    FROM scored WHERE rk <= {TFIDF_TOPK}
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} TF-IDF terms per document. Two map-side-combinable
    aggregates; the corpus size reaches every row as a broadcast 1-row
    frame (BroadcastNestedLoopJoin of a scalar — never a shuffle); the
    rank window partitions by doc_id so its state is one doc's
    vocabulary."""
    from pyspark import StorageLevel

    d = _docs(spark, sf_dir)
    # r13 (guide §2.3): tf and df both consume the exploded token frame —
    # unpersisted, documents was scanned and tokenized twice
    # (plans/r13/text_tfidf_topk_before.txt: 3 scans). df also now derives
    # from the (doc_id, token)-grouped tf frame instead of a separate
    # tok.distinct() pass — count of tf rows per token IS the number of
    # docs containing the token. One scan + one tokenize for both.
    tok = d.select(
        "doc_id",
        F.explode(F.filter(F.split(F.lower("text"), " "),
                           lambda t: t != F.lit(""))).alias("token"))
    tf = (tok.groupBy("doc_id", "token")
          .agg(F.count(F.lit(1)).alias("tf"))
          .persist(StorageLevel.MEMORY_AND_DISK))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
    w = Window.partitionBy("doc_id").orderBy(F.desc(score), F.asc("token"))
    return (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", SF.r6(score))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TFIDF_TOPK)
        .select("doc_id", "token", "tf", "tfidf")
    )


# ---------------------------------------------------------------------------
# Canonical-document selection: ONE survivor per duplicate cluster, chosen
# by quality (longest text wins, doc_id breaks ties) — the step that turns
# dedup_clusters' labels into an actual drop list.
# ---------------------------------------------------------------------------

@register(
    "dedup_canonical",
    oracle=f"""
    WITH RECURSIVE
    {LABELS_CTES_SQL},
    joined AS (
        SELECT l.label, d.doc_id, d.n_chars
        FROM labels l JOIN documents d USING (doc_id)
    ),
    ranked AS (
        SELECT label, doc_id, n_chars,
               row_number() OVER (PARTITION BY label
                                  ORDER BY n_chars DESC, doc_id) AS rk,
               count(*) OVER (PARTITION BY label) AS n_docs,
               sum(n_chars) OVER (PARTITION BY label) AS sum_chars
        FROM joined
    )
    SELECT label AS cluster_id, doc_id AS canonical_doc_id, n_docs,
           n_chars AS chars_kept,
           CAST(sum_chars - n_chars AS BIGINT) AS chars_dropped
    FROM ranked WHERE rk = 1 AND n_docs > 1
    """,
)
def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reuses the connected-component labels fixpoint (cluster_labels);
    the canonical pick is a per-cluster window — cluster sizes are small by
    near-dup construction, so window state is bounded. chars_dropped is the
    volume a curation pass deletes from this cluster."""
    d = _docs(spark, sf_dir)
    labels = cluster_labels(spark, sf_dir)
    joined = labels.join(d.select("doc_id", "n_chars"), "doc_id")
    wrank = Window.partitionBy("label").orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    wall = Window.partitionBy("label")
    return (
        joined
        .withColumn("rk", F.row_number().over(wrank))
        .withColumn("n_docs", F.count(F.lit(1)).over(wall))
        .withColumn("sum_chars", F.sum("n_chars").over(wall))
        .where((F.col("rk") == 1) & (F.col("n_docs") > 1))
        .select(F.col("label").alias("cluster_id"),
                F.col("doc_id").alias("canonical_doc_id"),
                "n_docs",
                F.col("n_chars").alias("chars_kept"),
                (F.col("sum_chars") - F.col("n_chars")).alias("chars_dropped"))
    )


# ---------------------------------------------------------------------------
# Curation suite: five labeled parts over `documents`, one result schema
# (part, key, n, n2, v):
#   'sample'  — deterministic stratified sample: per lang, order by
#     md5(doc_id) (a fixed uniform permutation) and keep the first
#     ceil(SAMPLE_FRAC·n). key=lang, n=n_sampled, n2=n_total,
#     v=sum(doc_id) of the sampled set (value checksum).
#   'redact'  — PII-style span scrubbing via regexp_replace: an
#     email-shaped pattern plus long digit runs ('pii'), and a
#     term-blocklist pattern ('blocklist' — non-zero on this corpus, so
#     the differential actually exercises replacement, not just a no-op).
#     key=pattern, n=total matches, n2=docs touched, v=total redacted
#     length after replacement.
#   'profile' — per-column stats: key=column, n=n_distinct, n2=n_nulls,
#     v=avg length/value where numeric.
#   'pack'    — sequence packing for training batches: concatenate docs in
#     deterministic (doc_id) order per lang and cut every PACK_BUDGET
#     whitespace tokens; a doc lands in the sequence where its cumulative
#     token count BEFORE it falls (doc boundaries respected — the common
#     "greedy fill, no doc splitting" policy). key=lang, n=n_sequences,
#     n2=n_docs_packed, v=mean fill fraction (seq tokens / budget; the
#     overflow doc of a bin can push fill past 1.0 — that surplus is what
#     a real packer truncates). At 100 TB packing is per-shard, never a
#     global order: the per-lang window here IS the per-shard form (state
#     = one stratum's running sum; strata pack independently in parallel).
#   'mix'     — source temperature resampling: per-source sampling weight
#     ∝ n^MIX_ALPHA (temperature < 1 upweights small sources), normalized
#     over sources. key=source, n=n_docs, n2=target docs after resampling
#     to the same corpus size (round(N · w)), v=weight. One tiny grouped
#     frame; the over-() window runs on `n_sources` rows, not the corpus.
#   'chunk'   — overlapping token-window chunking (the step that feeds an
#     embedding model): windows of CHUNK_WIDTH tokens at CHUNK_STRIDE,
#     last window truncated, short docs yield one whole-doc chunk. Chunk
#     COUNTS are computed arithmetically per doc (ceil(max(n-W,0)/S)+1 and
#     a closed form for token totals) — no chunk rows materialize, so the
#     accounting pass is a single scan even where the real chunk table
#     would be 2-3x the corpus. key=lang, n=total chunks, n2=docs,
#     v=avg tokens per chunk.
#   'lmscore' — unigram-LM quality scoring (the CCNet-style filter): score
#     each doc by its cross-entropy under the corpus's own unigram
#     distribution, avg(-ln p(token)) in nats — boilerplate/templated text
#     scores low (common tokens), gibberish scores high; a curation run
#     keeps the middle band. key=source, n=n_docs, n2=total tokens,
#     v=mean per-doc cross-entropy. Two wordcount-shaped aggregates (token
#     freqs, then per-doc join+avg) — the freq table shuffles (token,
#     count) pairs, never documents, and the corpus total reaches rows as
#     a broadcast scalar. At 100 TB the LM is trained once and the scoring
#     pass is one scan + one bounded join against the (broadcastable or
#     bucketed) vocabulary.
# ---------------------------------------------------------------------------

SAMPLE_FRAC = 0.2
PACK_BUDGET = 512
SOURCE_QUOTA = 5
MIX_ALPHA = 0.5
CHUNK_WIDTH = 32
CHUNK_STRIDE = 16
RE_PII = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|[0-9]{3,}"
RE_BLOCKLIST = "\\b(hash|key|value)\\b"
REDACTED = "[X]"


@register(
    "corpus_curation_suite",
    oracle=f"""
    WITH strat AS (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rk,
               count(*) OVER (PARTITION BY lang) AS n_total
        FROM documents
    ),
    sample AS (
        SELECT 'sample' AS part, lang AS key,
               count(CASE WHEN rk <= ceil({SAMPLE_FRAC} * n_total)
                          THEN 1 END) AS n,
               max(n_total) AS n2,
               CAST(sum(CASE WHEN rk <= ceil({SAMPLE_FRAC} * n_total)
                             THEN doc_id END) AS DOUBLE) AS v
        FROM strat GROUP BY lang
    ),
    redact_pii AS (
        SELECT 'redact' AS part, 'pii' AS key,
               CAST(sum(len(regexp_extract_all(text, '{RE_PII}')))
                    AS BIGINT) AS n,
               count(CASE WHEN regexp_matches(text, '{RE_PII}')
                          THEN 1 END) AS n2,
               CAST(sum(length(regexp_replace(text, '{RE_PII}', '[X]', 'g')))
                    AS DOUBLE) AS v
        FROM documents
    ),
    redact_block AS (
        SELECT 'redact' AS part, 'blocklist' AS key,
               CAST(sum(len(regexp_extract_all(text, '{RE_BLOCKLIST}')))
                    AS BIGINT) AS n,
               count(CASE WHEN regexp_matches(text, '{RE_BLOCKLIST}')
                          THEN 1 END) AS n2,
               CAST(sum(length(regexp_replace(text, '{RE_BLOCKLIST}',
                                              '[X]', 'g'))) AS DOUBLE) AS v
        FROM documents
    ),
    profile AS (
        SELECT 'profile' AS part, 'lang' AS key,
               count(DISTINCT lang) AS n,
               count(*) - count(lang) AS n2,
               CAST(round(avg(length(lang)), 6) AS DOUBLE) AS v
        FROM documents
        UNION ALL
        SELECT 'profile', 'source', count(DISTINCT source),
               count(*) - count(source),
               CAST(round(avg(length(source)), 6) AS DOUBLE)
        FROM documents
        UNION ALL
        SELECT 'profile', 'n_chars', count(DISTINCT n_chars),
               count(*) - count(n_chars),
               CAST(round(avg(n_chars), 6) AS DOUBLE)
        FROM documents
    ),
    ptok AS (
        SELECT lang, doc_id,
               len(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS n_tok
        FROM documents
    ),
    pcum AS (
        SELECT lang, n_tok,
               sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
        FROM ptok
    ),
    pseq AS (
        SELECT lang,
               CAST(floor((cum - n_tok) / {PACK_BUDGET}.0) AS BIGINT)
                   AS seq_id,
               sum(n_tok) AS seq_tokens, count(*) AS n_docs
        FROM pcum GROUP BY lang, seq_id
    ),
    pack AS (
        SELECT 'pack' AS part, lang AS key, count(*) AS n,
               CAST(sum(n_docs) AS BIGINT) AS n2,
               CAST(round(avg(seq_tokens / {PACK_BUDGET}.0), 6) AS DOUBLE)
                   AS v
        FROM pseq GROUP BY lang
    ),
    msrc AS (SELECT source, count(*) AS n_docs FROM documents
             GROUP BY source),
    mnorm AS (
        SELECT source, n_docs, pow(n_docs, {MIX_ALPHA}) AS w_raw,
               sum(pow(n_docs, {MIX_ALPHA})) OVER () AS w_sum,
               sum(n_docs) OVER () AS n_total
        FROM msrc
    ),
    mix AS (
        SELECT 'mix' AS part, source AS key, n_docs AS n,
               CAST(round(n_total * w_raw / w_sum) AS BIGINT) AS n2,
               CAST(round(w_raw / w_sum, 6) AS DOUBLE) AS v
        FROM mnorm
    ),
    ctok AS (
        SELECT lang,
               len(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS n_tok
        FROM documents
    ),
    cdoc AS (
        SELECT lang, n_tok,
               CAST(ceil(greatest(n_tok - {CHUNK_WIDTH}, 0) * 1.0
                         / {CHUNK_STRIDE}) AS BIGINT) + 1 AS k
        FROM ctok
    ),
    chunk AS (
        SELECT 'chunk' AS part, lang AS key,
               CAST(sum(k) AS BIGINT) AS n, count(*) AS n2,
               CAST(round(sum(n_tok + (k - 1)
                              * ({CHUNK_WIDTH} - {CHUNK_STRIDE}))
                          * 1.0 / sum(k), 6) AS DOUBLE) AS v
        FROM cdoc GROUP BY lang
    ),
    ltok AS (
        SELECT doc_id, source,
               unnest(list_filter(string_split(lower(text), ' '),
                                  t -> t <> '')) AS token
        FROM documents
    ),
    lfreq AS (SELECT token, count(*) AS n_t FROM ltok GROUP BY token),
    ltot AS (SELECT count(*) AS n_total_tok FROM ltok),
    ldoc AS (
        SELECT doc_id, source,
               avg(-ln(n_t * 1.0 / n_total_tok)) AS nll,
               count(*) AS n_tok
        FROM ltok JOIN lfreq USING (token) CROSS JOIN ltot
        GROUP BY doc_id, source
    ),
    lmscore AS (
        SELECT 'lmscore' AS part, source AS key, count(*) AS n,
               CAST(sum(n_tok) AS BIGINT) AS n2,
               CAST(round(avg(nll), 6) AS DOUBLE) AS v
        FROM ldoc GROUP BY source
    ),
    quota_ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    ),
    quota AS (
        SELECT 'quota' AS part, source AS key, count(*) AS n,
               CAST(sum(CASE WHEN rk <= {SOURCE_QUOTA} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
               CAST(sum(CASE WHEN rk <= {SOURCE_QUOTA} THEN n_chars
                             ELSE 0 END) AS DOUBLE) AS v
        FROM quota_ranked GROUP BY source
    ),
    split_tagged AS (
        SELECT source,
               CASE WHEN substr(md5(source), 1, 1) IN ('d', 'e')
                        THEN 'val'
                    WHEN substr(md5(source), 1, 1) = 'f' THEN 'test'
                    ELSE 'train' END AS split
        FROM documents
    ),
    split_per AS (
        SELECT 'split' AS part, split AS key, count(*) AS n,
               count(DISTINCT source) AS n2,
               CAST(round(count(*) * 1.0 / sum(count(*)) OVER (), 6)
                    AS DOUBLE) AS v
        FROM split_tagged GROUP BY split
    ),
    split_leak AS (
        SELECT 'split' AS part, '_leakage' AS key,
               CAST(count(*) AS BIGINT) AS n, CAST(0 AS BIGINT) AS n2,
               CAST(0 AS DOUBLE) AS v
        FROM (SELECT source FROM split_tagged
              GROUP BY source HAVING count(DISTINCT split) > 1)
    )
    SELECT * FROM sample
    UNION ALL SELECT * FROM redact_pii
    UNION ALL SELECT * FROM redact_block
    UNION ALL SELECT * FROM profile
    UNION ALL SELECT * FROM pack
    UNION ALL SELECT * FROM mix
    UNION ALL SELECT * FROM chunk
    UNION ALL SELECT * FROM lmscore
    UNION ALL SELECT * FROM quota
    UNION ALL SELECT * FROM split_per
    UNION ALL SELECT * FROM split_leak
    """,
)
def corpus_curation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling + redaction + profiling + sequence packing + source-mix
    resampling in labeled parts (see block comment). Hash-checked against
    DuckDB, including the regexp_replace outputs (patterns stay in the
    Java∩RE2 common dialect).

    Plan shape (r13, guide §2.3/§2.4): Catalyst does not share subtrees
    across a Union, so the r5..r12 spelling re-scanned `documents` (and
    re-tokenized `text`) once PER PART — 15 parquet scans in
    plans/r13/corpus_curation_suite_before.txt. Now:
    * ten parts (sample/profile×3/pack/mix/chunk/quota/split×2) read a
      persisted NARROW base (lang, source, doc_id, n_chars, n_tok) — one
      documents scan + ONE tokenize pass for all of them; `text` itself
      never enters the cache;
    * the two redact rows come from one fused aggregate over one text
      scan (stack(2) splits the 6 measures into the two labeled rows);
    * lmscore keeps its exploded-token pipeline but derives the corpus
      token total from the frequency table (sum(n_t) == count of tok —
      one fewer pass) and persists the exploded tok frame for its two
      consumers (freq build + score join).
    Result: 3 documents scans / 2 tokenize passes total, values
    identical row-for-row (differential-verified at sf0.001/0.01/0.1)."""
    from pyspark import StorageLevel

    d = _docs(spark, sf_dir)

    n_tok = F.size(F.filter(F.split("text", " "), lambda t: t != F.lit("")))
    base = (
        d.select("lang", "source", "doc_id", "n_chars", n_tok.alias("n_tok"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    wrk = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
    wtot = Window.partitionBy("lang")
    in_sample = F.col("rk") <= F.ceil(SAMPLE_FRAC * F.col("n_total"))
    sample = (
        base.select("lang", "doc_id")
        .withColumn("rk", F.row_number().over(wrk))
        .withColumn("n_total", F.count(F.lit(1)).over(wtot))
        .groupBy(F.col("lang").alias("key"))
        .agg(F.count(F.when(in_sample, 1)).alias("n"),
             F.max("n_total").alias("n2"),
             F.sum(F.when(in_sample, F.col("doc_id"))).cast("double").alias("v"))
        .select(F.lit("sample").alias("part"), "key", "n", "n2", "v")
    )

    def redact_fused() -> DataFrame:
        """Both redact rows from ONE text scan: six aggregates, then
        stack(2) into the ('pii', 'blocklist') rows — same values as the
        former two single-pattern aggregates."""
        cols = []
        for tag, pattern in (("p", RE_PII), ("b", RE_BLOCKLIST)):
            pat = F.lit(pattern)
            cols += [
                F.sum(F.regexp_count("text", pat)).alias(f"{tag}_n"),
                F.count(F.when(F.regexp_count("text", pat) > 0, 1))
                .alias(f"{tag}_n2"),
                F.sum(F.length(F.regexp_replace("text", pattern, REDACTED)))
                .cast("double").alias(f"{tag}_v"),
            ]
        return d.agg(*cols).selectExpr(
            "'redact' AS part",
            "stack(2, 'pii', p_n, p_n2, p_v, "
            "'blocklist', b_n, b_n2, b_v) AS (key, n, n2, v)")

    def profile(col: str, avg_expr) -> DataFrame:
        return base.agg(
            F.countDistinct(col).alias("n"),
            (F.count(F.lit(1)) - F.count(col)).alias("n2"),
            SF.r6(avg_expr).cast("double").alias("v"),
        ).select(F.lit("profile").alias("part"), F.lit(col).alias("key"),
                 "n", "n2", "v")

    wcum = (Window.partitionBy("lang").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pack = (
        base.select("lang", "doc_id", "n_tok")
        .withColumn("cum", F.sum("n_tok").over(wcum))
        .withColumn("seq_id", F.floor((F.col("cum") - F.col("n_tok"))
                                      / float(PACK_BUDGET)))
        .groupBy("lang", "seq_id")
        .agg(F.sum("n_tok").alias("seq_tokens"),
             F.count(F.lit(1)).alias("n_docs"))
        .groupBy(F.col("lang").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_docs").alias("n2"),
             SF.r6(F.avg(F.col("seq_tokens") / float(PACK_BUDGET)))
             .cast("double").alias("v"))
        .select(F.lit("pack").alias("part"), "key", "n", "n2", "v")
    )

    wall = Window.partitionBy()
    mix = (
        base.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("w_raw", F.pow("n_docs", F.lit(MIX_ALPHA)))
        .withColumn("w_sum", F.sum("w_raw").over(wall))
        .withColumn("n_total", F.sum("n_docs").over(wall))
        .select(F.lit("mix").alias("part"), F.col("source").alias("key"),
                F.col("n_docs").alias("n"),
                F.round(F.col("n_total") * F.col("w_raw") / F.col("w_sum"))
                .cast("long").alias("n2"),
                SF.r6(F.col("w_raw") / F.col("w_sum")).cast("double").alias("v"))
    )

    n_chunks = (F.ceil(F.greatest(F.col("n_tok") - CHUNK_WIDTH, F.lit(0))
                       / float(CHUNK_STRIDE)) + 1).cast("long")
    chunk = (
        base.select("lang", "n_tok")
        .withColumn("k", n_chunks)
        .groupBy(F.col("lang").alias("key"))
        .agg(F.sum("k").alias("n"),
             F.count(F.lit(1)).alias("n2"),
             SF.r6(F.sum(F.col("n_tok") + (F.col("k") - 1)
                         * (CHUNK_WIDTH - CHUNK_STRIDE)) / F.sum("k"))
             .cast("double").alias("v"))
        .select(F.lit("chunk").alias("part"), "key", "n", "n2", "v")
    )

    tok = d.select(
        "doc_id", "source",
        F.explode(F.filter(F.split(F.lower("text"), " "),
                           lambda t: t != F.lit(""))).alias("token")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_t"))
    # corpus token total == sum of the per-token counts — read it off the
    # (much smaller) freq table instead of a third pass over tok; coalesce
    # keeps the former count()-style 0-on-empty semantics (sum is NULL on
    # an empty frame)
    tot = freq.agg(F.coalesce(F.sum("n_t"), F.lit(0))
                   .alias("n_total_tok"))
    lmscore = (
        tok.join(freq, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(F.avg(-F.log(F.col("n_t") / F.col("n_total_tok"))).alias("nll"),
             F.count(F.lit(1)).alias("n_tok"))
        .groupBy(F.col("source").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("n_tok").alias("n2"),
             SF.r6(F.avg("nll")).cast("double").alias("v"))
        .select(F.lit("lmscore").alias("part"), "key", "n", "n2", "v")
    )

    # quota / split: the D30/D31 operators re-expressed onto the suite's
    # 5-col schema so their correctness rides the driver's hash check
    # without consuming a 50-row query slot (same window + agg plans as
    # corpus_source_quota / corpus_split_leakage_safe below).
    wq = Window.partitionBy("source").orderBy(F.desc("n_chars"),
                                              F.asc("doc_id"))
    keptq = F.col("rk") <= SOURCE_QUOTA
    quota = (
        base.select("source", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(wq))
        .groupBy(F.col("source").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(keptq.cast("long")).alias("n2"),
             F.sum(F.when(keptq, F.col("n_chars")).otherwise(0))
             .cast("double").alias("v"))
        .select(F.lit("quota").alias("part"), "key", "n", "n2", "v")
    )

    h1 = F.substring(F.md5(F.col("source")), 1, 1)
    tagged = base.select(
        "source",
        F.when(h1.isin("d", "e"), "val")
         .when(h1 == "f", "test")
         .otherwise("train").alias("split"))
    split_per = (
        tagged.groupBy(F.col("split").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.countDistinct("source").alias("n2"))
        .withColumn("v", SF.r6(F.col("n")
                               / F.sum("n").over(Window.partitionBy()))
                    .cast("double"))
        .select(F.lit("split").alias("part"), "key", "n", "n2", "v")
    )
    split_leak = (
        tagged.groupBy("source")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("split").alias("part"), F.lit("_leakage").alias("key"),
                F.col("n"), F.lit(0).cast("long").alias("n2"),
                F.lit(0.0).alias("v"))
    )

    return (
        sample
        .unionByName(redact_fused())
        .unionByName(profile("lang", F.avg(F.length("lang"))))
        .unionByName(profile("source", F.avg(F.length("source"))))
        .unionByName(profile("n_chars", F.avg("n_chars")))
        .unionByName(pack)
        .unionByName(mix)
        .unionByName(chunk)
        .unionByName(lmscore)
        .unionByName(quota)
        .unionByName(split_per)
        .unionByName(split_leak)
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination — the training-data pass that removes documents
# overlapping a held-out evaluation set (the standard n-gram-overlap rule:
# a training doc is contaminated if it shares any 5-word shingle with any
# benchmark doc). Testdata ships no benchmark corpus, so the held-out set
# is a deterministic slice of documents itself (doc_id % 11 == 0) — the
# machinery under test is the overlap join, not the benchmark's provenance.
#
# Scale notes (100 TB): the benchmark n-gram set is tiny relative to the
# corpus (an eval suite is MBs; the corpus is TBs), so it is BROADCAST and
# the whole pass is one scan over the corpus shingles with a broadcast-hash
# semi-join-shaped probe — no corpus-wide shuffle. Only matching shingles
# (rare by construction) reach the per-doc aggregation. Shingles probe by
# 64-bit hash, same trade as dedup; width 5 matches common practice of
# 8-13-gram character/word windows scaled to the fixture's short docs.
# ---------------------------------------------------------------------------

DECONTAM_NGRAM = 5
DECONTAM_MOD = 11


@register(
    "corpus_decontaminate",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    idx AS (SELECT doc_id, w,
                   unnest(generate_series(1, greatest(len(w) - {DECONTAM_NGRAM - 1}, 0))) AS i
            FROM tok),
    sh AS (SELECT DISTINCT doc_id,
                  concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]) AS sh
           FROM idx),
    bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {DECONTAM_MOD} = 0),
    sizes AS (SELECT doc_id, count(*) AS n_ngrams FROM sh GROUP BY doc_id),
    hits AS (SELECT s.doc_id, count(*) AS n_overlap
             FROM sh s JOIN bench b USING (sh)
             WHERE s.doc_id % {DECONTAM_MOD} <> 0
             GROUP BY s.doc_id)
    SELECT h.doc_id, d.source, h.n_overlap, z.n_ngrams,
           round(h.n_overlap * 1.0 / z.n_ngrams, 6) AS overlap_frac
    FROM hits h
    JOIN sizes z USING (doc_id)
    JOIN documents d USING (doc_id)
    """,
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs sharing >= 1 distinct 5-gram with the held-out
    benchmark slice; n_overlap counts shared distinct shingles, and
    overlap_frac normalizes by the doc's own shingle count (1.0 = the doc
    is entirely inside the benchmark's n-gram set).

    Overlap depends only on a doc's TEXT, so the shingle index is built
    once per distinct text (keyed by the content hash — same clone-collapse
    discipline as the dedup family) and persisted, since it feeds three
    consumers (benchmark set, per-text sizes, overlap probe). Per-doc rows
    come back through the clone map; a text whose copies straddle the
    benchmark/train split contributes its shingles to the benchmark AND
    gets its train copies flagged (overlap 1.0), matching the per-doc rule."""
    from pyspark import StorageLevel

    from service_level_reporting_spark.operators.dedup import _shingle_index

    d = _docs(spark, sf_dir)
    # r13 (guide §2.3): the clone map feeds the benchmark-slice semi-join
    # AND the final per-doc expansion; the doc metadata join adds a third
    # documents scan. Carrying `source` on the persisted clone map serves
    # all three consumers from ONE documents scan (plus the rep-text agg).
    groups = (d.select(F.md5("text").alias("h"), "doc_id", "source")
              .persist(StorageLevel.MEMORY_AND_DISK))
    texts = (
        d.select(F.md5("text").alias("h"), "text")
        .groupBy("h").agg(F.first("text").alias("text"))
    )
    sh = (
        _shingle_index(texts.select(F.col("h").alias("doc_id"), "text"),
                       width=DECONTAM_NGRAM)
        .withColumnRenamed("doc_id", "h")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bench_texts = (
        groups.where(F.col("doc_id") % DECONTAM_MOD == 0).select("h").distinct())
    # The benchmark n-gram set is the broadcast side by DESIGN (a real eval
    # suite is MBs against a TB corpus); bench_texts itself joins without a
    # forced broadcast — the %11 stand-in makes it artificially wide.
    bench_sh = sh.join(bench_texts, "h", "left_semi").select("sh").distinct()
    sizes = sh.groupBy("h").agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = (
        sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        groups.where(F.col("doc_id") % DECONTAM_MOD != 0)
        .join(hits.join(sizes, "h"), "h")
        .select("doc_id", "source", "n_overlap", "n_ngrams",
                SF.r6(F.col("n_overlap") / F.col("n_ngrams")).alias("overlap_frac"))
    )


# ---------------------------------------------------------------------------
# Per-source (domain) quota sampling — crawl-pipeline staple: cap documents
# per source so mega-domains can't dominate the training mix, keeping the
# best K by a deterministic quality key (longest text, doc_id tie-break).
# Reference scope: the ref has no corpus curation at all; this extends the
# engine's LLM-pipeline surface (SURVEY §2.8, D30).
# ---------------------------------------------------------------------------
# (SOURCE_QUOTA is defined with the other suite constants above so the
# suite's oracle f-string can reference it at import time.)

QUOTA_SALTS = 32

_QUOTA_ORACLE = f"""
    WITH ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN rk <= {SOURCE_QUOTA} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rk <= {SOURCE_QUOTA} THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM ranked GROUP BY source
    """


@register("corpus_source_quota", aux=True, oracle=_QUOTA_ORACLE)
def corpus_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota: keep the best SOURCE_QUOTA docs per
    source (n_chars desc, doc_id tie-break), report kept/total per
    source. 100 TB: the shuffle key is `source` and the window state is
    one domain's docs; a mega-domain that skews a partition is exactly
    where the skew-safe twin below (``corpus_source_quota_skewsafe``)
    takes over — same semantics, salted pre-top-K so no single task ever
    sorts the whole domain."""
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"),
                                             F.asc("doc_id"))
    kept = F.col("rk") <= SOURCE_QUOTA
    return (d.select("source", "doc_id", "n_chars")
            .withColumn("rk", F.row_number().over(w))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(kept.cast("long")).alias("n_kept"),
                 F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
                 .alias("kept_chars")))


def quota_skew_safe(d: DataFrame, n_salts: int = QUOTA_SALTS) -> DataFrame:
    """Skew-safe per-source top-K: salt each row by hash(doc_id) into
    ``n_salts`` subgroups, take the top SOURCE_QUOTA within each
    (source, salt) — so the mega-domain's sort is spread over n_salts
    tasks of n/n_salts rows each — then take the exact top SOURCE_QUOTA
    from the ≤ n_salts·K survivors per source. Because every per-salt
    winner set is a superset filter of the global winners (any global
    top-K row is top-K within its own salt group), the two-phase result
    equals the single-window result row-for-row, ties included (the
    (n_chars desc, doc_id asc) order is total). Group counts ride the
    same (source, salt) pass, so the full data shuffles exactly ONCE.

    At 100 TB with one domain = 50% of the corpus, the single-window plan
    sorts that domain in ONE task; this plan never sorts more than
    max(n/n_salts, n_salts·K) rows in a task, and n_salts scales with
    the cluster. Verified equal to the window path in
    tests/test_operator_edges.py and hash-checked against the same DuckDB
    oracle as the window path (pytest differential); the skew probe
    (tools/quota_skew_probe.py → BENCH_QUOTA_SKEW.json) measures both
    paths on a planted 50%-mega-domain corpus."""
    salted = d.select(
        "source", "doc_id", "n_chars",
        F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)).alias("salt"))
    # Phase 1: ONE full-data shuffle, keyed (source, salt). The window's
    # ExternalSorter spills to disk (unlike a collect_list buffer), so the
    # per-task memory stays bounded even before the rk filter; the
    # follow-up groupBy reuses the same partitioning (no new exchange)
    # and reduces each (source, salt) group to one row carrying the group
    # count and its ≤ K winners as a struct array. The struct's leading
    # field is -n_chars so ascending array_sort == (n_chars desc, doc_id
    # asc) — the operator's total order.
    w1 = Window.partitionBy("source", "salt").orderBy(F.desc("n_chars"),
                                                      F.asc("doc_id"))
    kept1 = F.col("rk") <= SOURCE_QUOTA
    g1 = (salted.withColumn("rk", F.row_number().over(w1))
          .groupBy("source", "salt")
          .agg(F.count(F.lit(1)).alias("cnt"),
               F.collect_list(
                   F.when(kept1, F.struct((-F.col("n_chars")).alias("neg"),
                                          F.col("doc_id"),
                                          F.col("n_chars"))))
               .alias("cands")))
    # Phase 2: merge per-salt winners — one row per (source, salt), so
    # this shuffle moves ≤ n_salts rows of ≤ K structs per source.
    top = F.slice(F.array_sort(F.flatten(F.collect_list("cands"))),
                  1, SOURCE_QUOTA)
    return (g1.groupBy("source")
            .agg(F.sum("cnt").alias("n_docs"), top.alias("top"))
            .select(
                "source", "n_docs",
                F.size("top").cast("long").alias("n_kept"),
                F.aggregate("top", F.lit(0).cast("long"),
                            lambda acc, x: acc + x["n_chars"])
                .alias("kept_chars")))


@register("corpus_source_quota_skewsafe", aux=True, oracle=_QUOTA_ORACLE)
def corpus_source_quota_skewsafe(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The salted two-phase twin of ``corpus_source_quota`` (see
    ``quota_skew_safe``), registered with the SAME oracle so the pytest
    differential hash-checks both physical strategies against DuckDB."""
    return quota_skew_safe(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split — assignment by a hash of the SOURCE,
# never the document, so near-duplicate docs from one domain can't straddle
# splits (the standard contamination guard). The split key is the md5 hex
# prefix (identical in Spark and DuckDB), bucketed 13/2/1 of 16.
# ---------------------------------------------------------------------------

@register(
    "corpus_split_leakage_safe",
    aux=True,
    oracle="""
    WITH tagged AS (
        SELECT source, doc_id,
               CASE WHEN substr(md5(source), 1, 1) IN ('d', 'e')
                        THEN 'val'
                    WHEN substr(md5(source), 1, 1) = 'f' THEN 'test'
                    ELSE 'train' END AS split
        FROM documents
    ),
    per AS (
        SELECT split, count(*) AS n_docs,
               count(DISTINCT source) AS n_sources
        FROM tagged GROUP BY split
    ),
    leak AS (
        SELECT '_leakage' AS split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(0 AS BIGINT) AS n_sources
        FROM (SELECT source FROM tagged
              GROUP BY source HAVING count(DISTINCT split) > 1)
    )
    SELECT * FROM per UNION ALL SELECT * FROM leak
    """,
)
def corpus_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-hash split (train/val/test ≈ 13/2/1 of 16
    md5 buckets) with the leakage invariant VERIFIED IN-FRAME: the
    '_leakage' row counts sources assigned to more than one split and
    must read 0 by construction. 100 TB: the split tag is a pure
    per-row projection (no shuffle); the per-split rollup aggregates
    map-side; the leakage audit groups by source once — the same
    shuffle the quota op already pays, and droppable in production
    when the tag is provably a function of source alone."""
    d = _docs(spark, sf_dir)
    h1 = F.substring(F.md5(F.col("source")), 1, 1)
    tagged = d.select(
        "source", "doc_id",
        F.when(h1.isin("d", "e"), "val")
         .when(h1 == "f", "test")
         .otherwise("train").alias("split"))
    per = tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"))
    leak = (tagged.groupBy("source")
            .agg(F.countDistinct("split").alias("ns"))
            .where(F.col("ns") > 1)
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .select(F.lit("_leakage").alias("split"),
                    F.col("n_docs").cast("long"),
                    F.lit(0).cast("long").alias("n_sources")))
    return per.unionByName(leak)
