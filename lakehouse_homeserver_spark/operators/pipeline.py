"""End-to-end training-corpus preparation — the composition story.

Individual operators (dedup, quality, split, token stats) are useful
alone; a real pipeline chains them. This module's single query runs
the canonical pre-training data flow over `documents`:

    exact-dedup (keep lowest doc_id per normalized-text group)
      → benchmark decontamination (5-gram overlap with the held-out
        eval set removed — k8_decontaminate's semantics)
      → quality gate (heuristic score ≥ τ)
      → deterministic train/eval split (md5 bucket of doc_id)
      → per-(split, lang) audit: docs kept, tokens, mean quality

and the DuckDB oracle reproduces the whole chain in SQL — proof that
the composition, not just each stage, is semantically exact.

Scale shape: one hash-partitioned window for the dedup keeper, a
broadcast semi-join + anti-join for decontamination (eval grams are
benchmark-sized), then map-only scoring/splitting and one tiny
groupBy. No skew-prone keys (the dedup partition key is a 128-bit
digest; the anti-join key is doc_id).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table as T
from .dedup import SQL_NORM, _shingles_from_tokens, norm_text
from .sampling import SQL_BUCKET, split_bucket

from .common import make_registry

QUERIES, ORACLES, query = make_registry()

QUALITY_MIN = 0.5

@query(
    "k7_training_corpus",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, {SQL_NORM} AS nt,
             string_split({SQL_NORM}, ' ') AS toks
      FROM documents
    ), dedup AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(nt)
                                     ORDER BY doc_id) AS rn
        FROM base
      ) WHERE rn = 1
    ), grams AS (
      SELECT doc_id,
             unnest(CASE WHEN len(toks) >= 5
                    THEN list_distinct(list_transform(
                           range(1, len(toks) - 3),
                           i -> array_to_string(toks[i:i+4], ' ')))
                    ELSE [array_to_string(toks, ' ')] END) AS gram
      FROM base
    ), ev AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % 29 = 0
    ), bad AS (
      SELECT DISTINCT g.doc_id
      FROM grams g JOIN ev USING (gram)
      WHERE g.doc_id % 29 <> 0
    ), decon AS (
      SELECT * FROM dedup
      WHERE doc_id % 29 <> 0
        AND doc_id NOT IN (SELECT doc_id FROM bad)
    ), scored AS (
      SELECT doc_id, lang, toks,
             (CAST(CASE WHEN LENGTH(nt) BETWEEN 100 AND 5000 THEN 1.0
                        WHEN LENGTH(nt) BETWEEN 30 AND 20000 THEN 0.5
                        ELSE 0.0 END AS DOUBLE)
              + CAST(LEN(list_distinct(toks)) AS DOUBLE) / LEN(toks)
              + LEAST(4.0 * CAST(LEN(list_filter(toks,
                    x -> list_contains(['the','a','of','and','to','in','is'], x)))
                    AS DOUBLE) / LEN(toks), 1.0)) / 3 AS quality
      FROM decon
    ), gated AS (
      SELECT *, CASE WHEN {SQL_BUCKET.format(key="doc_id")} < 80
                     THEN 'train' ELSE 'eval' END AS split
      FROM scored WHERE quality >= {QUALITY_MIN}
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(LEN(toks)) AS BIGINT) AS total_tokens,
           ROUND(SUM(quality) / COUNT(*), 6) AS mean_quality
    FROM gated GROUP BY split, lang
    """,
)
def k7_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pre-training pipeline (SURVEY K1+K4+K6 chained);
    audit rollup per (split, lang). Every stage is the library
    operator's exact semantics — the oracle runs the identical chain
    in SQL, so composition correctness is hash-checked, not assumed.
    """
    d = T(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "lang", norm_text(F.col("text")).alias("nt")
    ).withColumn("toks", F.split("nt", " "))

    # stage 1 — exact dedup, keep lowest doc_id per content group
    w = Window.partitionBy(F.md5("nt")).orderBy("doc_id")
    deduped = (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    # stage 1.5 — benchmark decontamination (k8_decontaminate's exact
    # semantics): docs ≡0 mod 29 play the held-out benchmark; corpus
    # docs sharing a word 5-gram with it are dropped, and the
    # benchmark docs themselves never enter the corpus. Eval grams
    # broadcast; corpus side map-only + anti-join.
    grams = base.select(
        "doc_id",
        F.explode(_shingles_from_tokens(F.col("toks"), 5)).alias("gram"),
    )
    ev = grams.filter(F.col("doc_id") % 29 == 0).select("gram").distinct()
    bad = (
        grams.filter(F.col("doc_id") % 29 != 0)
        .join(F.broadcast(ev), "gram")
        .select("doc_id")
        .distinct()
    )
    decon = deduped.filter(F.col("doc_id") % 29 != 0).join(
        bad, "doc_id", "left_anti"
    )

    # stage 2 — heuristic quality score (same formula as k4_quality_score)
    toks = F.col("toks")
    n_words = F.size(toks)
    stop = F.array([F.lit(x) for x in ["the", "a", "of", "and", "to", "in", "is"]])
    stop_ratio = (
        F.size(F.filter(toks, lambda x: F.array_contains(stop, x))).cast("double")
        / n_words
    )
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_words
    ln = F.length("nt")
    len_score = (
        F.when(ln.between(100, 5000), 1.0)
        .when(ln.between(30, 20000), 0.5)
        .otherwise(0.0)
    )
    quality = (len_score + ttr + F.least(4.0 * stop_ratio, F.lit(1.0))) / 3
    scored = decon.withColumn("quality", quality)

    # stage 3 — quality gate + deterministic split
    gated = scored.filter(F.col("quality") >= QUALITY_MIN).withColumn(
        "split",
        F.when(split_bucket("doc_id") < 80, "train").otherwise("eval"),
    )

    # stage 4 — audit rollup
    return gated.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).cast("bigint").alias("total_tokens"),
        F.round(F.sum("quality") / F.count(F.lit(1)), 6).alias("mean_quality"),
    )


SEQ_BUDGET = 512  # tokens per packed training sequence
N_SHARDS = 8


@query(
    "k7_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             {SQL_BUCKET.format(key="doc_id")} % {N_SHARDS} AS shard,
             LEN(string_split({SQL_NORM}, ' ')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT shard, doc_id, n_tokens,
             CAST((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                  // {SEQ_BUDGET} AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT shard, pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY shard, pack_id
    """,
)
def k7_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (SURVEY K7 ext.): assign documents to
    fixed-token-budget training sequences — the standard pretraining
    step that turns a ragged corpus into ~uniform model inputs.

    Packing is contiguous-with-overflow within a SHARD: documents are
    md5-sharded (deterministic, engine-portable), ordered by doc_id
    inside the shard, and a doc starts a new pack when the running
    token total crosses the budget. The shard is what makes this
    scale: the only window runs PARTITIONED BY shard — thousands of
    independent partitions on a cluster, never a global sort — which
    is exactly how production packers shard work across files. The
    oracle replays the identical shard/cumsum/bucket arithmetic (all
    integer-derived, so cross-engine hash-exact).
    """
    d = T(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (split_bucket("doc_id") % N_SHARDS).alias("shard"),
        F.size(F.split(norm_text(F.col("text")), " "))
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / SEQ_BUDGET),
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "k7_incremental_dedup",
    oracle=f"""
    WITH base AS (
      SELECT md5({SQL_NORM}) AS digest FROM documents
      WHERE doc_id % 3 < 2
    ),
    incr AS (
      SELECT doc_id, lang, source, md5({SQL_NORM}) AS digest,
             ROW_NUMBER() OVER (PARTITION BY md5({SQL_NORM})
                                ORDER BY doc_id) AS rn
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT i.doc_id, i.lang, i.source
    FROM incr i
    WHERE i.rn = 1
      AND NOT EXISTS (SELECT 1 FROM base b WHERE b.digest = i.digest)
    """,
)
def k7_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup (SURVEY K7 ext.): dedupe a NEW batch
    against the existing corpus without touching the old text — the
    shape every continuously-ingesting training pipeline needs (the
    base corpus is 100 TB; tonight's crawl is 100 GB; re-running
    k1_dedup_exact over the union would re-shuffle everything).

    Mechanism: the base side is only its DIGEST set (16 bytes/doc —
    in production a bookkept digest table maintained exactly like
    `metadata.<t>_loaded_files`, or the increment consumed via
    `added_between`); the increment first dedupes within itself
    (digest window, keep lowest doc_id) and then anti-joins the base
    digests. Work: O(increment) scan + one digest-keyed join; the
    base corpus text is never read. Fixture split: base = doc_id%3<2,
    increment = the rest, derived identically in the oracle.
    """
    d = T(spark, sf_dir, "documents")
    digest = F.md5(norm_text(F.col("text")))
    base_digests = (
        d.filter(F.col("doc_id") % 3 < 2).select(digest.alias("digest"))
    )
    w = Window.partitionBy("digest").orderBy("doc_id")
    incr = (
        d.filter(F.col("doc_id") % 3 == 2)
        .select("doc_id", "lang", "source", digest.alias("digest"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return incr.join(base_digests, "digest", "left_anti").select(
        "doc_id", "lang", "source"
    )


MANIFEST_SHARDS = 16


@query(
    "k7_shard_manifest",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id,
             CAST(CAST('0x' || SUBSTRING(md5('shard:' || doc_id), 1, 8)
                  AS BIGINT) % {MANIFEST_SHARDS} AS INTEGER) AS shard_id,
             LEN(string_split({SQL_NORM}, ' ')) AS n_tokens,
             md5({SQL_NORM}) AS digest
      FROM documents
    )
    SELECT shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           md5(string_agg(digest, '' ORDER BY digest)) AS shard_digest
    FROM per_doc GROUP BY shard_id
    """,
)
def k7_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export manifest (the webdataset/JSONL-shards
    stage that hands a corpus to the training job): every document is
    assigned to one of {MANIFEST_SHARDS} shards by a deterministic md5
    bucket (the k6_hash_split contract — reproducible on re-run, no
    global sort), and each shard's manifest row carries its document
    count, token budget, and a CONTENT digest (md5 over the shard's
    doc digests in digest order — arrival-order-independent). The
    manifest is what downstream integrity checks diff: a changed
    shard digest pinpoints exactly which shard needs re-export.

    100 TB design: shard assignment is map-only; the manifest
    aggregate shuffles 16-byte digests keyed by shard (bounded,
    uniform); the actual payload write would ride the same
    partitioning (`partitionBy(shard_id)`) without any extra
    exchange. Every column is hash-checked by the oracle's identical
    derivation.
    """
    d = T(spark, sf_dir, "documents")
    nt = norm_text(F.col("text"))
    shard = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("shard:"), F.col("doc_id"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % MANIFEST_SHARDS
    ).cast("int")
    per_doc = d.select(
        shard.alias("shard_id"),
        F.size(F.split(nt, " ")).alias("n_tokens"),
        F.md5(nt).alias("digest"),
    )
    return per_doc.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.md5(
            F.concat_ws("", F.sort_array(F.collect_list("digest")))
        ).alias("shard_digest"),
    )
