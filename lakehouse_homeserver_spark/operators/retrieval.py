"""Full-text retrieval operators over `documents` — §2.K extension.

BM25 ranked search and a segmented inverted-index build: the search
side of a training-data pipeline (eval-set retrieval, contamination
probes, nearest-neighbour text lookup without embeddings). The
reference stack exposes this shape through Trino full-scans; here it
is a first-class bounded-shuffle operator family.

Everything is built-in expressions (JVM codegen); the only shuffles
are the (doc, term) word-count aggregate — the classic map-side-
combine shape, skew-free because keys embed doc_id — and the tiny
vocabulary-sized term aggregates.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table as T
from .dedup import SQL_NORM, norm_text

from .common import make_registry

QUERIES, ORACLES, query = make_registry()


# The benchmark query workload: multi-term keyword queries over the
# corpus vocabulary. Deterministic literals — the same set is embedded
# in the SQL oracle.
BM25_QUERIES: list[tuple[int, str]] = [
    (1, "table scan"),
    (2, "hash join"),
    (3, "stream window"),
    (4, "sort merge batch"),
    (5, "customer query"),
    (6, "vector filter"),
    (7, "spark data column"),
    (8, "slow query"),
]
BM25_K1, BM25_B, BM25_TOPK = 1.2, 0.75, 5


def _bm25_values_sql() -> str:
    rows = []
    for qid, text in BM25_QUERIES:
        for term in text.split(" "):
            rows.append(f"({qid}, '{term}')")
    return ", ".join(rows)


@query(
    "k10_bm25",
    oracle=f"""
    WITH q(query_id, term) AS (VALUES {_bm25_values_sql()}),
    docs AS (
      SELECT doc_id, string_split({SQL_NORM}, ' ') AS toks FROM documents
    ),
    totals AS (
      SELECT COUNT(*) AS n_docs, SUM(LEN(toks)) AS t_dl FROM docs
    ),
    tok AS (
      SELECT doc_id, LEN(toks) AS dl, t.term
      FROM docs, UNNEST(toks) AS t(term)
    ),
    tf AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf
      FROM tok JOIN (SELECT DISTINCT term FROM q) USING (term)
      GROUP BY 1, 2, 3
    ),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             CAST(ROUND(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * 2.2)
                 / (tf + {BM25_K1} * (1 - {BM25_B}
                        + {BM25_B} * dl / (CAST(t_dl AS DOUBLE) / n_docs))),
               8) AS DECIMAL(20,8)) AS s
      FROM tf JOIN dft USING (term) JOIN q USING (term) CROSS JOIN totals
    ),
    agg AS (
      SELECT query_id, doc_id, COUNT(*) AS n_terms, SUM(s) AS score_dec
      FROM scored GROUP BY 1, 2
    )
    SELECT query_id, doc_id, n_terms, CAST(score_dec AS DOUBLE) AS score
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score_dec DESC, doc_id) AS rn
      FROM agg
    ) WHERE rn <= {BM25_TOPK}
    """,
)
def k10_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k keyword retrieval (Robertson-Sparck Jones / Lucene
    default ranking; §2.K extension): score every (query, document)
    pair under Okapi BM25 and keep the top-{k} docs per query.

    100 TB design: see `_bm25_scored` (shared with `k10_hybrid_rrf`);
    final top-k is a WindowGroupLimit over the bounded scored table.

    Float contract: per-term scores are one fixed IEEE expression
    rounded to 8 dp and summed as DECIMAL(20,8) (order-free), so
    ranking ties and hashes are bit-stable across engines/partitions.
    """
    agg = _bm25_scored(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_dec").desc(), F.col("doc_id")
    )
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BM25_TOPK)
        .select(
            "query_id",
            "doc_id",
            "n_terms",
            F.col("score_dec").cast("double").alias("score"),
        )
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Okapi-BM25 scoring pipeline: (query_id, doc_id,
    n_terms, score_dec DECIMAL(20,8)) for every candidate pair —
    consumed by `k10_bm25` (top-k) and `k10_hybrid_rrf` (rank pool).
    Extracted r7 (review finding: the two bodies had drifted into
    ~40 duplicated lines; a df-window fix applied to one would
    silently skip the other).

    100 TB design: the corpus token stream is filtered by a BROADCAST
    hash join against the (tiny) query-term list BEFORE the tf
    aggregate, so the shuffle is bounded by matching (doc, term)
    pairs, not the corpus; document frequencies aggregate the
    already-filtered tf table (vocabulary-sized). The corpus pays two
    passes — the tokenize→explode→tf scan, and one column-pruned
    aggregate for the two corpus scalars (N, Σdl) collected to the
    driver here (collect guarantees it runs ONCE; the previous
    crossJoin(broadcast(totals)) form re-executed that subtree on
    every materialization of the final plan, since Spark doesn't CSE
    across broadcast-exchange boundaries). A production deployment
    maintains those two scalars as table stats and drops the second
    pass entirely.
    """
    qterms = spark.createDataFrame(
        [(qid, t) for qid, text in BM25_QUERIES for t in text.split(" ")],
        "query_id int, term string",
    )
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.split(norm_text(F.col("text")), " ").alias("toks")
    )
    totals = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("t_dl"),
    ).first()
    # empty corpus: SUM is NULL and avgdl would be 0/0 — any scalar
    # works because tf has no rows to score; keep the plan buildable.
    n_docs = int(totals["n_docs"]) or 1
    t_dl = int(totals["t_dl"]) if totals["t_dl"] is not None else 1
    tok = docs.select(
        "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
    )
    tf = (
        tok.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # Document frequency as a count-over-window on the SAME tf
    # pipeline — a groupBy+broadcast-join here would re-execute the
    # whole scan→explode→agg subtree as a second job (Spark does not
    # dedupe common subtrees across a broadcast boundary; measured
    # ~2× the query's cost). (doc, term) is unique in tf, so
    # count(*) over the term partition IS df. Bounded by the
    # query-vocabulary's posting sizes, not the corpus.
    tf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    # Literal scalars: Python's t_dl/n_docs is the same IEEE division
    # Spark would run on the same ints — values bit-identical to the
    # old in-plan form.
    avgdl = F.lit(t_dl).cast("double") / F.lit(n_docs)
    idf = F.log(1 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    s = F.round(
        idf
        * (F.col("tf") * 2.2)
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / avgdl)
        ),
        8,
    ).cast("decimal(20,8)")
    return (
        tf.join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id", s.alias("s"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("s").alias("score_dec"),
        )
    )


# Lucene-style segmentation: postings are built per (term, segment)
# so no single output row grows with the corpus — a stopword term at
# 100 TB otherwise produces one multi-GB postings row (the classic
# inverted-index skew). Segment = doc_id range, the doc-partition
# shape Lucene shards by.
INDEX_SEGMENT_DOCS = 100


@query(
    "k10_inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, doc_id // {INDEX_SEGMENT_DOCS} AS segment, t.term
      FROM (SELECT doc_id, string_split({SQL_NORM}, ' ') AS toks
            FROM documents), UNNEST(toks) AS t(term)
    ),
    tf AS (
      SELECT term, segment, doc_id, COUNT(*) AS tf
      FROM tok GROUP BY 1, 2, 3
    )
    SELECT term, segment,
           COUNT(*) AS df,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
    FROM tf GROUP BY 1, 2
    """,
)
def k10_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmented inverted-index build (the Lucene/ES index shape;
    §2.K extension): per (term, doc-range segment), the document
    frequency, total term frequency, and the doc-ordered postings
    list serialized as `doc:tf,...`.

    100 TB design: one (doc, term) word-count aggregate (map-side
    combine, doc_id in the key → skew-free), then a (term, segment)
    aggregate whose output rows are bounded by the segment size —
    postings for a stopword term split across segments instead of
    concentrating in one unbounded row. Postings are emitted ordered
    (sort_array on (doc_id, tf) structs) so the string is
    deterministic under any partitioning.
    """
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        # Integer `div`, not double `/`+cast: the double form loses
        # exactness past doc_id 2^53 and rounds rather than floors,
        # putting a doc in the wrong segment (r7 review; same
        # overflow class as the r6 dedup canon-key fix). The oracle's
        # `//` is integer floor-div — identical for non-negative ids.
        F.expr(f"doc_id div {INDEX_SEGMENT_DOCS}").alias("segment"),
        F.explode(F.split(norm_text(F.col("text")), " ")).alias("term"),
    )
    tf = d.groupBy("term", "segment", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    postings = F.concat_ws(
        ",",
        F.transform(
            F.sort_array(F.collect_list(F.struct("doc_id", "tf"))),
            lambda x: F.concat_ws(":", x["doc_id"], x["tf"]),
        ),
    )
    return tf.groupBy("term", "segment").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        postings.alias("postings"),
    )


CHUNK_TOKENS, CHUNK_STRIDE = 64, 48  # 16-token overlap between chunks


@query(
    "k10_chunk_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({SQL_NORM}, ' ') AS tk FROM documents
    )
    SELECT doc_id,
           CAST(c.s // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           CAST(c.s AS BIGINT) AS token_start,
           CAST(LEAST(c.s + {CHUNK_TOKENS}, LEN(tk)) - c.s AS BIGINT)
             AS n_tokens,
           md5(array_to_string(tk[c.s + 1 : LEAST(c.s + {CHUNK_TOKENS}, LEN(tk))], ' '))
             AS chunk_digest
    FROM toks,
         UNNEST(range(0, GREATEST(LEN(tk) - {CHUNK_TOKENS - CHUNK_STRIDE}, 1),
                      {CHUNK_STRIDE})) AS c(s)
    """,
)
def k10_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking — the RAG/embedding-ingest
    stage (LangChain/LlamaIndex token-window splitter, {CHUNK_TOKENS}
    tokens per chunk, {CHUNK_TOKENS - CHUNK_STRIDE}-token overlap):
    each document explodes into its chunk spans with stable ids,
    token offsets, and a content digest (the key an embedding/vector
    store joins back on; also the dedup key for chunk-level caching).

    Chunk-boundary contract, pinned by the digest hash in BOTH
    engines: starts advance by the stride; the final chunk truncates
    at the document end; a document shorter than one chunk still
    yields its single (shorter) chunk.

    100 TB design: map-only — one explode of a bounded index
    sequence per document, no shuffle at all; chunk rows flow
    straight to the embedding stage (`j_normalize_embeddings`) or
    the vector index build (`k3_*`) without re-keying.
    """
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.split(norm_text(F.col("text")), " ").alias("tk")
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.size("tk") - (CHUNK_TOKENS - CHUNK_STRIDE) - 1, F.lit(0)
        ),
        F.lit(CHUNK_STRIDE),
    )
    d = d.select("doc_id", "tk", F.explode(starts).alias("s"))
    n_tokens = F.least(F.col("s") + CHUNK_TOKENS, F.size("tk")) - F.col("s")
    chunk = F.slice(F.col("tk"), F.col("s") + 1, n_tokens)
    return d.select(
        "doc_id",
        (F.col("s") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.col("s").cast("bigint").alias("token_start"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_digest"),
    )


PHRASES: list[tuple[int, str]] = [
    (1, "table scan"),
    (2, "hash join"),
    (3, "sort merge"),
    (4, "the line"),
]


def _phrase_values_sql() -> str:
    return ", ".join(
        f"({pid}, '{p.split(' ')[0]}', '{p.split(' ')[1]}')"
        for pid, p in PHRASES
    )


@query(
    "k10_phrase_search",
    oracle=f"""
    WITH p(phrase_id, t1, t2) AS (VALUES {_phrase_values_sql()}),
    toks AS (
      SELECT doc_id, string_split({SQL_NORM}, ' ') AS tk FROM documents
    ),
    hits AS (
      SELECT p.phrase_id, t.doc_id,
             LEN(list_filter(range(1, LEN(tk)),
                 i -> tk[i] = p.t1 AND tk[i + 1] = p.t2)) AS n_hits
      FROM toks t CROSS JOIN p
    )
    SELECT phrase_id, doc_id, CAST(n_hits AS BIGINT) AS n_hits
    FROM hits WHERE n_hits > 0
    """,
)
def k10_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search (the Lucene phrase-query shape; §2.K
    extension): find every document containing an exact two-token
    phrase, with occurrence counts, via the POSITIONAL index join —
    postings carry (doc, position), and a phrase hit is an equi-join
    of consecutive positions (`pos₂ = pos₁ + 1` folded into the join
    key), the way a search engine intersects position lists. The
    oracle recomputes hits by scanning each document's token array
    directly, so the positional join's correctness (including
    OVERLAPPING occurrences, which substring-replace counting would
    miss) is hash-checked.

    100 TB design: the token stream is broadcast-filtered to the
    phrase vocabulary BEFORE any join (same gate as BM25); the
    position intersection is then an equi-join on
    (doc, phrase, adjusted-position) over only matching postings —
    bounded by the phrase terms' posting sizes, never the corpus.
    """
    terms = spark.createDataFrame(
        [
            (pid, i, t)
            for pid, p in PHRASES
            for i, t in enumerate(p.split(" "))
        ],
        "phrase_id int, term_idx int, term string",
    )
    d = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(F.split(norm_text(F.col("text")), " ")).alias(
            "pos", "term"
        ),
    )
    # keep only postings for phrase vocabulary (broadcast gate), and
    # normalize each posting to its phrase-START position: term i of
    # a phrase at position p belongs to the occurrence starting at
    # p - i. A full occurrence = one (phrase, doc, start) group with
    # ALL term slots present.
    hits = (
        d.join(F.broadcast(terms), "term")
        .select(
            "phrase_id",
            "doc_id",
            (F.col("pos") - F.col("term_idx")).alias("start"),
            "term_idx",
        )
        .groupBy("phrase_id", "doc_id", "start")
        .agg(F.count_distinct("term_idx").alias("n_slots"))
        .filter(F.col("n_slots") == 2)
    )
    return hits.groupBy("phrase_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )


# -- Hybrid retrieval: BM25 + vector ranks fused by RRF --------------------

RRF_K = 60  # the standard Cormack/Clarke/Buettcher constant
RRF_POOL = 20  # per-source candidate pool
RRF_TOPK = 10

_SQL_COS_HY = """
  list_sum(list_transform(list_zip(e.embedding, qv.embedding),
      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
  / (sqrt(list_sum(list_transform(e.embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform(qv.embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


@query(
    "k10_hybrid_rrf",
    oracle=f"""
    WITH q(query_id, term) AS (VALUES {_bm25_values_sql()}),
    docs AS (
      SELECT doc_id, string_split({SQL_NORM}, ' ') AS toks FROM documents
    ),
    totals AS (
      SELECT COUNT(*) AS n_docs, SUM(LEN(toks)) AS t_dl FROM docs
    ),
    tok AS (
      SELECT doc_id, LEN(toks) AS dl, t.term
      FROM docs, UNNEST(toks) AS t(term)
    ),
    tf AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf
      FROM tok JOIN (SELECT DISTINCT term FROM q) USING (term)
      GROUP BY 1, 2, 3
    ),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             CAST(ROUND(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * 2.2)
                 / (tf + {BM25_K1} * (1 - {BM25_B}
                        + {BM25_B} * dl / (CAST(t_dl AS DOUBLE) / n_docs))),
               8) AS DECIMAL(20,8)) AS s
      FROM tf JOIN dft USING (term) JOIN q USING (term) CROSS JOIN totals
    ),
    lex AS (
      SELECT query_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY SUM(s) DESC, doc_id) AS lex_rank
      FROM (SELECT query_id, doc_id, s FROM scored) GROUP BY query_id, doc_id
      QUALIFY lex_rank <= {RRF_POOL}
    ),
    vec AS (
      SELECT qv.vec_id AS query_id, e.vec_id AS doc_id,
             ROW_NUMBER() OVER (PARTITION BY qv.vec_id
                                ORDER BY ROUND({_SQL_COS_HY}, 8) DESC,
                                         e.vec_id) AS vec_rank
      FROM (SELECT vec_id, embedding FROM embeddings
            WHERE vec_id IN (SELECT DISTINCT query_id FROM q)) qv
      JOIN embeddings e ON e.vec_id <> qv.vec_id
      QUALIFY vec_rank <= {RRF_POOL}
    ),
    fused AS (
      SELECT COALESCE(l.query_id, v.query_id) AS query_id,
             COALESCE(l.doc_id, v.doc_id) AS doc_id,
             COALESCE(l.lex_rank, 0) AS lex_rank,
             COALESCE(v.vec_rank, 0) AS vec_rank,
             ROUND(
               (CASE WHEN l.lex_rank IS NULL THEN 0.0
                     ELSE 1.0 / ({RRF_K} + l.lex_rank) END)
               + (CASE WHEN v.vec_rank IS NULL THEN 0.0
                       ELSE 1.0 / ({RRF_K} + v.vec_rank) END), 8) AS rrf
      FROM lex l
      FULL OUTER JOIN vec v
        ON l.query_id = v.query_id AND l.doc_id = v.doc_id
    )
    SELECT query_id, doc_id,
           CAST(lex_rank AS BIGINT) AS lex_rank,
           CAST(vec_rank AS BIGINT) AS vec_rank,
           CAST(rrf AS DOUBLE) AS rrf
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, doc_id) AS rn
      FROM fused
    ) WHERE rn <= {RRF_TOPK}
    ORDER BY query_id, rrf DESC, doc_id
    """,
)
def k10_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al.
    SIGIR'09 — the fusion every modern RAG stack runs: lexical BM25
    candidates and dense-vector candidates merged by 1/(k+rank), no
    score normalization needed because RRF only consumes RANKS): per
    query, the BM25 top-{RRF_POOL} over `documents` fuse with the
    cosine top-{RRF_POOL} over `embeddings` (fixture convention:
    vec_id and doc_id share an id space, and the BM25_QUERIES ids
    double as query vector ids), RRF = sum of reciprocal ranks with
    k={RRF_K}, top-{RRF_TOPK} kept.

    100 TB design: each branch is the already-certified bounded
    shape — BM25's corpus scan is filtered by a broadcast query-term
    gate before any aggregate (k10_bm25), the vector branch
    broadcasts {{n_queries}} query vectors into ONE scan of the
    embedding corpus with a WindowGroupLimit top-pool (k3 brute
    force; swap in the IVF probe for the ANN path at scale) — and
    the fusion itself joins two POOL-sized rank lists per query:
    corpus-independent work. A production stack fuses more sources
    (phrase, recency, click models) by adding rank lists to the same
    outer-join-and-sum; nothing about the shape changes.

    Float contract: per-source ranks are integers; the two
    reciprocal terms are single IEEE divisions summed in one fixed
    expression and rounded to 8 dp — bit-stable across engines,
    partitionings, and join order.
    """
    # -- lexical branch: BM25 ranks (the SHARED k10_bm25 scoring
    # pipeline, pool-deep — extracted r7, review finding: this body
    # was a near-verbatim 40-line copy that would drift)
    w_lex = Window.partitionBy("query_id").orderBy(
        F.col("score_dec").desc(), F.col("doc_id")
    )
    lex = (
        _bm25_scored(spark, sf_dir)
        .withColumn("lex_rank", F.row_number().over(w_lex))
        .filter(F.col("lex_rank") <= RRF_POOL)
        .select("query_id", "doc_id", "lex_rank")
    )
    # -- dense branch: cosine ranks, one corpus scan, broadcast queries
    from ..functions.vectors import cosine_sim

    emb = T(spark, sf_dir, "embeddings")
    qids = sorted({qid for qid, _ in BM25_QUERIES})
    qv = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    w_vec = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("doc_id")
    )
    vec = (
        emb.select(F.col("vec_id").alias("doc_id"), "embedding")
        .join(F.broadcast(qv), F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(cosine_sim(F.col("embedding"), F.col("q_emb")), 8).alias(
                "cos"
            ),
        )
        .withColumn("vec_rank", F.row_number().over(w_vec))
        .filter(F.col("vec_rank") <= RRF_POOL)
        .select("query_id", "doc_id", "vec_rank")
    )
    # -- fusion: pool-sized outer join, fixed-order reciprocal sum
    fused = (
        lex.join(vec, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).cast("bigint").alias("lex_rank"),
            F.coalesce("vec_rank", F.lit(0)).cast("bigint").alias("vec_rank"),
            F.round(
                F.when(
                    F.col("lex_rank").isNull(), F.lit(0.0)
                ).otherwise(F.lit(1.0) / (RRF_K + F.col("lex_rank")))
                + F.when(
                    F.col("vec_rank").isNull(), F.lit(0.0)
                ).otherwise(F.lit(1.0) / (RRF_K + F.col("vec_rank"))),
                8,
            ).alias("rrf"),
        )
    )
    w_out = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rn", F.row_number().over(w_out))
        .filter(F.col("rn") <= RRF_TOPK)
        .select("query_id", "doc_id", "lex_rank", "vec_rank", "rrf")
        .orderBy("query_id", F.col("rrf").desc(), "doc_id")
    )
