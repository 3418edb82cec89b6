"""Text-analysis operators for LLM training-data pipelines (greenfield
— beyond the reference's surface, per the project north star).

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd): splits, regex counts, higher-order array
functions, md5. No Python UDFs anywhere — at 100 TB these run at scan
speed with full predicate pushdown, and every operator has a DuckDB
oracle for hash-checked correctness.

Tokenization contract (shared with the oracles): split on single
space, drop empty tokens. Shingling contract: character 12-grams at
every position (a rolling fingerprint window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as SqlWindow

from smart_meter_data_pipeline_spark.plans.registry import register
from smart_meter_data_pipeline_spark.sources.readers import load_table

SHINGLE_WIDTH = 12
# Marker vocabularies for the language-ID heuristic. On a real corpus
# these are per-language stopword lists; the synthetic docs draw from a
# query-engine vocabulary, so the "languages" here are topical dialects
# — the operator mechanics (tokenize → marker hits → argmax) are
# identical.
MARKERS = {
    "sqlish": ("join", "merge", "scan", "sort", "query", "filter", "agg"),
    "pipelineish": ("batch", "stream", "window", "spark", "group"),
    "dataish": ("data", "value", "row", "column", "table", "key"),
}
STOPWORDS = ("the", "a", "and", "of", "small", "big")


def tokens(col: str = "text") -> Column:
    """Space-split tokens with empties removed (matches DuckDB
    ``list_filter(string_split(text,' '), x -> x <> '')``)."""
    return F.filter(F.split(F.col(col), " "), lambda x: x != "")


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex pieces
    (letter-runs / digit-runs / single punctuation), char + byte
    lengths, punctuation count."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chars"),
        F.octet_length("text").alias("n_bytes"),
        F.size(toks).alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).alias(
            "n_bpeish_pieces"
        ),
        F.length(F.regexp_replace("text", "[^.!?,;:]", "")).alias("n_punct"),
        (
            F.length(F.regexp_replace("text", " ", "")).cast("double")
            / F.size(toks).cast("double")
        ).alias("mean_token_len"),
    )


register(
    "doc_token_stats",
    """
SELECT doc_id, lang, source,
       length(text) AS n_chars,
       octet_length(encode(text)) AS n_bytes,
       CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT)
         AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT)
         AS n_bpeish_pieces,
       length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
       CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
         / CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE)
         AS mean_token_len
FROM documents
""",
)(doc_token_stats)


def _marker_hits(marker_words: tuple[str, ...]) -> Column:
    """Distinct-token hits against a marker vocabulary (JVM-side
    array_intersect — no shuffle, no UDF)."""
    return F.size(
        F.array_intersect(
            F.array_distinct(tokens()), F.array(*[F.lit(w) for w in marker_words])
        )
    )


def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-vocabulary hit counts → argmax
    with deterministic precedence (sqlish > pipelineish > dataish)."""
    docs = load_table(spark, sf_dir, "documents")
    h = {name: _marker_hits(words) for name, words in MARKERS.items()}
    pred = (
        F.when(
            (h["sqlish"] >= h["pipelineish"]) & (h["sqlish"] >= h["dataish"]), "sqlish"
        )
        .when(h["pipelineish"] >= h["dataish"], "pipelineish")
        .otherwise("dataish")
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        h["sqlish"].alias("hits_sqlish"),
        h["pipelineish"].alias("hits_pipelineish"),
        h["dataish"].alias("hits_dataish"),
        pred.alias("predicted_dialect"),
    )


def _hits_sql(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        "CAST(len(list_intersect(list_distinct(list_filter(string_split(text, ' '),"
        f" x -> x <> '')), [{lst}])) AS INT)"
    )


register(
    "doc_lang_id",
    f"""
WITH h AS (
  SELECT doc_id, lang AS labeled_lang,
         {_hits_sql(MARKERS["sqlish"])} AS hits_sqlish,
         {_hits_sql(MARKERS["pipelineish"])} AS hits_pipelineish,
         {_hits_sql(MARKERS["dataish"])} AS hits_dataish
  FROM documents
)
SELECT *,
       CASE WHEN hits_sqlish >= hits_pipelineish AND hits_sqlish >= hits_dataish
              THEN 'sqlish'
            WHEN hits_pipelineish >= hits_dataish THEN 'pipelineish'
            ELSE 'dataish' END AS predicted_dialect
FROM h
""",
)(doc_lang_id)


def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword-ratio / token-shape component
    scores composed into [0,1] — the usual cheap pre-filter before
    expensive dedup/train steps."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_hits = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    stop_ratio = stop_hits.cast("double") / n_tokens.cast("double")
    mean_len = (
        F.length(F.regexp_replace("text", " ", "")).cast("double")
        / n_tokens.cast("double")
    )
    len_score = F.when((n_tokens >= 20) & (n_tokens <= 2000), 0.5).otherwise(0.0)
    stop_score = F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.5), 0.3).otherwise(0.0)
    shape_score = F.when((mean_len >= 2.0) & (mean_len <= 12.0), 0.2).otherwise(0.0)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        mean_len.alias("mean_token_len"),
        (len_score + stop_score + shape_score).alias("quality_score"),
    )


_Q_STOP = ", ".join(f"'{w}'" for w in STOPWORDS)

# Reusable CTE chain ending in `quality(doc_id, n_tokens, stopword_ratio,
# mean_token_len, quality_score)` — shared by the doc_quality_score
# oracle and composite oracles (dedup_keep_best) so the scoring rule
# can never drift between them. CTE names are q*-prefixed to avoid
# collisions when embedded next to other chains.
QUALITY_SQL_CTES = f"""qt AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT)
           AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> list_contains([{_Q_STOP}], x))) AS INT)
           AS stop_hits,
         length(regexp_replace(text, ' ', '', 'g')) AS n_nonspace
  FROM documents
), qs AS (
  SELECT doc_id, n_tokens,
         CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
         CAST(n_nonspace AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_token_len
  FROM qt
), quality AS (
  SELECT doc_id, n_tokens, stopword_ratio, mean_token_len,
         (CASE WHEN n_tokens >= 20 AND n_tokens <= 2000 THEN 0.5 ELSE 0.0 END)
         + (CASE WHEN stopword_ratio >= 0.01 AND stopword_ratio <= 0.5
                 THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN mean_token_len >= 2.0 AND mean_token_len <= 12.0
                 THEN 0.2 ELSE 0.0 END) AS quality_score
  FROM qs
)"""

register(
    "doc_quality_score",
    f"""
WITH {QUALITY_SQL_CTES}
SELECT doc_id, n_tokens, stopword_ratio, mean_token_len, quality_score
FROM quality
""",
)(doc_quality_score)


def shingles(
    docs: DataFrame,
    width: int = SHINGLE_WIDTH,
    *,
    distribute_by_shingle: bool = False,
) -> DataFrame:
    """(doc_id, shingle): DISTINCT character ``width``-grams at every
    position — the rolling window the fingerprint/dedup family shares.
    Explode is linear in text size and partition-local (no shuffle
    until the downstream aggregation).

    ``distribute_by_shingle`` (r14, guide §2.4): hash-distribute the
    stream by ``shingle`` BEFORE the distinct. hashpartitioning
    on ``shingle`` satisfies the distinct's (doc_id, shingle)
    clustering requirement AND a downstream shingle-keyed window/agg,
    so both ride ONE exchange instead of two. Worth it only when the
    consumer is shingle-keyed (doc_ngram_novelty).

    Skew bound on that exchange (r15, guide §2.5 — VERDICT r14 #3):
    the r14 shape shipped RAW occurrences, so a hyper-common shingle
    concentrated Σ occurrences on one partition where the old
    partial-agg path concentrated only Σ distinct docs. The stream is
    now deduped WITHIN EACH DOC before the exchange
    (``array_distinct`` over the per-doc shingle array — docs are
    single rows, so per-doc dedup IS the per-partition partial dedup),
    which restores the Σ-distinct-docs bound — the minimum any exact
    shingle-keyed df computation must ship — while keeping the single
    shared exchange. Cost: the per-doc shingle array is materialized
    per row (~width× the text bytes, transient) instead of streamed
    through explode."""
    if distribute_by_shingle:
        return (
            _doc_distinct_shingles(docs, width)
            .repartition("shingle")
            .distinct()
        )
    raw = (
        docs.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("text") - (width - 1))
            ).alias("pos"),
            "text",
        )
        .select(
            "doc_id", F.expr(f"substr(text, pos, {width})").alias("shingle")
        )
    )
    return raw.distinct()


def _doc_distinct_shingles(docs: DataFrame, width: int) -> DataFrame:
    """(doc_id, shingle) with shingles deduped PER DOC, before any
    shuffle: the element set per doc is identical to the explode+substr
    stream (same ``sequence`` positions, same ``substr`` semantics),
    minus within-doc repeats. One row per (input doc row, distinct
    shingle) — the bounded exchange input the hot-shingle fixture
    test pins."""
    return docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, length(text) - {width - 1}),"
                    f" p -> substr(text, p, {width}))"
                )
            )
        ).alias("shingle"),
    )


def _shingles_sql(width: int = SHINGLE_WIDTH, relation: str = "documents") -> str:
    """DuckDB twin of :func:`shingles`. DuckDB's range() cannot be
    laterally correlated, so cross-join a fixed range and filter."""
    return f"""
  SELECT doc_id, substr(text, CAST(pos AS INT), {width}) AS shingle
  FROM {relation}, range(1, 100000) t(pos)
  WHERE pos <= length(text) - {width - 1}
  GROUP BY 1, 2"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-text md5 plus a rolling-window
    min-hash (min md5 over all char-12-gram shingles — winnowing's
    global-min special case). Identical prefixes/suffixes collide on
    the min-shingle even when the full-text hash differs."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles(docs)
    min_sh = sh.groupBy("doc_id").agg(
        F.min(F.md5("shingle")).alias("min_shingle_md5"),
        F.count(F.lit(1)).alias("n_shingles"),
    )
    return (
        docs.select("doc_id", F.md5("text").alias("content_md5"))
        .join(min_sh, "doc_id", "left")
        .select("doc_id", "content_md5", "min_shingle_md5", "n_shingles")
    )


register(
    "doc_fingerprint",
    f"""
WITH sh AS ({_shingles_sql()}),
m AS (
  SELECT doc_id, min(md5(shingle)) AS min_shingle_md5, COUNT(*) AS n_shingles
  FROM sh GROUP BY 1
)
SELECT d.doc_id, md5(d.text) AS content_md5, m.min_shingle_md5, m.n_shingles
FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
""",
)(doc_fingerprint)


def doc_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition quality signal: token count, distinct
    token count, repetition ratio (1 − distinct/total) and the mass of
    the single most frequent token. High repetition / high top-token
    mass are the classic spam and boilerplate markers a corpus filter
    cuts on.

    Plan shape: explode → two-level hash agg keyed (doc_id, token) then
    doc_id. Both levels partial-aggregate map-side, and the second agg
    reuses the first's hash partitioning on the doc_id prefix, so the
    whole op is one shuffle of (doc, token) partial counts — no row
    explosion crosses the wire."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens()).alias("tok"))
    per_tok = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.max("c").alias("top_token_count"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct_tokens",
            (
                F.lit(1.0)
                - F.col("n_distinct_tokens").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("repetition_ratio"),
            (
                F.col("top_token_count").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("top_token_frac"),
        )
    )


register(
    "doc_repetition_ratio",
    """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
         AS tok
  FROM documents
),
per_tok AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
p AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_distinct_tokens, MAX(c) AS top_token_count
  FROM per_tok GROUP BY 1
)
SELECT doc_id, n_tokens, n_distinct_tokens,
       1.0 - CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         AS repetition_ratio,
       CAST(top_token_count AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         AS top_token_frac
FROM p
""",
)(doc_repetition_ratio)


def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus novelty: for each doc, the fraction of its distinct
    char-shingles that occur in NO other document. Low novelty means
    the doc is assembled from corpus-common fragments (template /
    boilerplate); high novelty marks genuinely fresh text worth
    keeping.

    Plan shape: document frequency is attached with a COUNT window
    over `shingle` instead of a self-join against a separate df index —
    that saves re-computing the shingle set a second time (Spark does
    not reuse the subtree) and the join's extra exchange: one distinct
    on (doc, shingle), one shuffle+sort on shingle for the window, one
    re-key to doc_id. r14: the distinct and the window share one
    shingle-keyed exchange (``distribute_by_shingle`` — two exchanges
    total on the shingle table instead of three; measured −25% at
    sf0.1 with hash-identical output). r15: the shared exchange's
    input is deduped per doc BEFORE the shuffle, so a hyper-common
    shingle's partition receives at most one row per containing doc —
    the same Σ-distinct-docs concentration the window fundamentally
    requires, never Σ raw occurrences (see :func:`shingles`)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles(docs, distribute_by_shingle=True)
    dfd = sh.withColumn(
        "df", F.count(F.lit(1)).over(SqlWindow.partitionBy("shingle"))
    )
    return (
        dfd.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias(
                "n_unique_shingles"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique_shingles",
            (
                F.col("n_unique_shingles").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("novelty"),
        )
    )


register(
    "doc_ngram_novelty",
    f"""
WITH sh AS ({_shingles_sql()}),
dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
p AS (
  SELECT s.doc_id, COUNT(*) AS n_shingles,
         CAST(SUM(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unique_shingles
  FROM sh s JOIN dfreq ON s.shingle = dfreq.shingle
  GROUP BY 1
)
SELECT doc_id, n_shingles, n_unique_shingles,
       CAST(n_unique_shingles AS DOUBLE) / CAST(n_shingles AS DOUBLE)
         AS novelty
FROM p
""",
)(doc_ngram_novelty)


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Conservative patterns valid in BOTH Java regex (Spark) and RE2
# (DuckDB): explicit classes, no lookaround, no \d shorthand.
PII_PATTERNS = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
)


def scrub_expr(col):
    """(clean_text, n_redactions) column pair: chained regexp_replace
    over the PII patterns — pure scan-time expressions, no shuffle, no
    Python; the order is fixed so engines agree when patterns overlap
    (an IP inside an email is masked as part of the email first)."""
    clean = F.col(col) if isinstance(col, str) else col
    n = F.lit(0)
    for _, pat, repl in PII_PATTERNS:
        n = n + F.regexp_count(clean, F.lit(pat))
        clean = F.regexp_replace(clean, pat, repl)
    return clean, n


def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass over the corpus: emails, phone numbers and
    IPv4 literals are masked with typed placeholders; the audit columns
    (redaction count, length delta) feed the curation dashboard. On
    this synthetic corpus the scrub is a verified no-op — the unit
    tests drive the same expression over planted PII."""
    docs = load_table(spark, sf_dir, "documents")
    clean, n = scrub_expr("text")
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_redactions"),
        F.length("text").alias("raw_len"),
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


def _scrub_sql(col: str) -> tuple[str, str]:
    clean, counts = col, []
    for _, pat, repl in PII_PATTERNS:
        counts.append(f"len(regexp_extract_all({clean}, '{pat}'))")
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return clean, " + ".join(counts)


_CLEAN_SQL, _NRED_SQL = _scrub_sql("text")

register(
    "doc_pii_scrub",
    f"""
SELECT doc_id,
       CAST({_NRED_SQL} AS BIGINT) AS n_redactions,
       length(text) AS raw_len,
       length({_CLEAN_SQL}) AS clean_len,
       md5({_CLEAN_SQL}) AS clean_md5
FROM documents
""",
)(doc_pii_scrub)


# ---------------------------------------------------------------------------
# BM25-style lexical retrieval (more-like-this)
# ---------------------------------------------------------------------------

BM25_K1 = "1.2"  # saturation constants as DECIMAL LITERAL STRINGS so the
BM25_K1P1 = "2.2"  # SAME literal parses to the SAME IEEE double in both
BM25_B = "0.75"  # engines (Python-side 1.2 + 1 would differ from a SQL
BM25_1MB = "0.25"  # "2.2" in the last bit; 0.75 / 0.25 are exact dyadics)
BM25_QUERY_DOCS = 3
BM25_TOP_K = 10
BM25_MAX_DF_MULT = 4  # skip query terms with df > N/4: near-stopwords
# carry ~zero idf weight but fan the posting join out to a large slice
# of the corpus — the same hot-key discipline as the dedup shingle cap.


def doc_bm25_mlt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this retrieval: each query doc (doc_id <
    {BM25_QUERY_DOCS}) scores every other doc by BM25 over their shared
    terms, top-{BM25_TOP_K} per query.

    Cross-engine determinism: tf/df/dl/N are exact integers, the
    per-term score is a chain of per-row IEEE double ops (deterministic
    given identical inputs and identical literal constants — see the
    constant-string note above), each term score is rounded to 9 and
    summed as DECIMAL(18,9) (order-insensitive), and the ranking
    tie-breaks on doc_id. The classic ln() idf is NOT used: JVM and
    libm ln() differ in the last bit on ~9% of arguments (measured),
    which would be a latent hash break — the rank-equivalent rational
    Robertson idf (N - df + 0.5)/(df + 0.5) replaces it (production
    could swap ln back in where bit-stable ranking across engines
    isn't a requirement).

    Scale shape: postings/df/dl are one groupBy each over the token
    explode; the query-term table is tiny and broadcast; the hot-term
    cap (df ≤ N/{BM25_MAX_DF_MULT}) bounds the posting join's fan-out
    the same way MAX_SHINGLE_DF bounds the dedup pair path; corpus
    stats ride a 1-row broadcast crossJoin."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens()).alias("term"))
    # The inverted index is built ONCE and checkpointed: five plan
    # branches (dl, stats, df, query terms, candidates) read it, and
    # without the checkpoint each would re-scan + re-explode the
    # corpus (12 scans at 100 TB). This is the "index build" half of
    # the operator; production persists it as a table.
    postings = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        postings.agg(F.sum("tf").alias("total_tokens"))
    )
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = postings.filter(F.col("doc_id") < BM25_QUERY_DOCS).select(
        F.col("doc_id").alias("query_id"), "term"
    )
    cand = (
        F.broadcast(qterms)
        .join(postings, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .filter(F.col("df") * BM25_MAX_DF_MULT <= F.col("n_docs"))
    )
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs")
    idf_r = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    norm = F.lit(float(BM25_1MB)) + F.lit(float(BM25_B)) * (
        F.col("dl") / avgdl
    )
    sat = (F.col("tf") * F.lit(float(BM25_K1P1))) / (
        F.col("tf") + F.lit(float(BM25_K1)) * norm
    )
    scored = (
        cand.select(
            "query_id",
            "doc_id",
            F.round(idf_r * sat, 9).cast("decimal(18,9)").alias("term_score"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").cast("double").alias("score"))
    )
    w = SqlWindow.partitionBy("query_id").orderBy(
        F.col("score").desc(), "doc_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("query_id", "doc_id", "score", "rank")
    )


register(
    "doc_bm25_mlt",
    f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
postings AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM postings GROUP BY 1),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT COUNT(*) FROM tok) AS total_tokens
),
dft AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY 1),
q AS (
  SELECT doc_id AS query_id, term FROM postings
  WHERE doc_id < {BM25_QUERY_DOCS}
),
cand AS (
  SELECT q.query_id, p.doc_id, p.tf, d.df, l.dl, s.n_docs, s.total_tokens
  FROM q
  JOIN postings p USING (term)
  JOIN dft d USING (term)
  JOIN dl l ON p.doc_id = l.doc_id
  CROSS JOIN stats s
  WHERE p.doc_id <> q.query_id AND d.df * {BM25_MAX_DF_MULT} <= s.n_docs
),
scored AS (
  SELECT query_id, doc_id,
         CAST(SUM(CAST(round(
           ((n_docs - df + 0.5) / (df + 0.5)) *
           ((tf * {BM25_K1P1}) / (tf + {BM25_K1} *
             ({BM25_1MB} + {BM25_B} *
              (dl / (CAST(total_tokens AS DOUBLE) / n_docs))))),
           9) AS DECIMAL(18,9))) AS DOUBLE) AS score
  FROM cand GROUP BY 1, 2
)
SELECT query_id, doc_id, score, rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
WHERE rank <= {BM25_TOP_K}
""",
)(doc_bm25_mlt)


# ---------------------------------------------------------------------------
# Fixed-token chunking with overlap
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the context-window prep step
    of a training/RAG pipeline: each doc becomes ceil((n_tokens -
    overlap) / stride) chunks of {CHUNK_TOKENS} tokens starting every
    {CHUNK_STRIDE} (16-token overlap carries context across cuts; the
    final chunk is the short remainder). Pure built-ins: one explode
    over chunk indexes, slice + array_join to materialize chunk text —
    scan-shaped, no shuffle at all until a consumer aggregates.

    Chunk count: n_chunks = max(1, ceil((n_tokens - (CHUNK_TOKENS -
    CHUNK_STRIDE)) / CHUNK_STRIDE)) so the last window starts inside
    the doc (no empty trailing chunk), and every token is covered."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens().alias("toks")
    ).withColumn("n_tokens", F.size("toks"))
    overlap = CHUNK_TOKENS - CHUNK_STRIDE
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil(
            (F.col("n_tokens") - F.lit(overlap)).cast("double")
            / F.lit(CHUNK_STRIDE)
        ).cast("int"),
    )
    return (
        toks.withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)),
        )
        .select(
            "doc_id",
            "n_tokens",
            "chunk_idx",
            (F.col("chunk_idx") * CHUNK_STRIDE).alias("start_token"),
            F.array_join(
                F.slice(
                    "toks",
                    F.col("chunk_idx") * CHUNK_STRIDE + 1,
                    F.lit(CHUNK_TOKENS),
                ),
                " ",
            ).alias("chunk_text"),
        )
        .withColumn("chunk_md5", F.md5("chunk_text"))
        .withColumn(
            "chunk_n_tokens",
            F.least(
                F.lit(CHUNK_TOKENS),
                F.col("n_tokens") - F.col("start_token"),
            ),
        )
    )


register(
    "doc_chunk_overlap",
    f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS tk
  FROM documents
),
sized AS (
  SELECT doc_id, tk, CAST(len(tk) AS INT) AS n_tokens,
         GREATEST(1, CAST(ceil(CAST(len(tk) - {CHUNK_TOKENS - CHUNK_STRIDE}
           AS DOUBLE) / {CHUNK_STRIDE}) AS INT)) AS n_chunks
  FROM toks
),
expanded AS (
  SELECT doc_id, tk, n_tokens, CAST(i AS INT) AS chunk_idx
  FROM sized, range(0, 100000) t(i)
  WHERE i < n_chunks
)
SELECT doc_id, n_tokens, chunk_idx,
       chunk_idx * {CHUNK_STRIDE} AS start_token,
       array_to_string(
         list_slice(tk, chunk_idx * {CHUNK_STRIDE} + 1,
                    chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' ')
         AS chunk_text,
       md5(array_to_string(
         list_slice(tk, chunk_idx * {CHUNK_STRIDE} + 1,
                    chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' '))
         AS chunk_md5,
       LEAST({CHUNK_TOKENS}, n_tokens - chunk_idx * {CHUNK_STRIDE})
         AS chunk_n_tokens
FROM expanded
""",
)(doc_chunk_overlap)


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (log-free idf surrogate)
# ---------------------------------------------------------------------------

TFIDF_TOPK = 3


def doc_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOPK} characteristic terms per document by tf·idf.

    The idf is the RATIONAL surrogate N/df rather than ln(N/df):
    ln() is not correctly-rounded and differs between JVM and libm in
    the last bit on ~9%% of arguments (measured — see doc_bm25_mlt),
    while N/df keeps the score inside exact int→double division, so
    the ranking and the emitted score are bit-identical cross-engine.
    Ranking by tf·N/df is order-equivalent to tf·ln(N/df) only up to
    monotonicity in df — it is a deliberately sharper down-weight of
    common terms, which is what keyword extraction wants.

    Scale shape: term frequencies combine map-side on (doc_id, token);
    the df table is vocab-sized and BROADCASTS back onto it; the
    top-k window partitions by doc_id — already the layout of the tf
    aggregation, so the sort is per-doc-vocabulary local. The corpus
    is scanned once."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_tbl), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf").cast("double")
                * F.col("n_docs").cast("double")
                / F.col("df").cast("double"),
                9,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOPK)
        .select("doc_id", "token", "tf", "df", "score", "rank")
    )


register(
    "doc_tfidf_keywords",
    f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dft AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dft.df,
         round(CAST(tf.tf AS DOUBLE) * CAST(n_docs AS DOUBLE)
               / CAST(dft.df AS DOUBLE), 9) AS score
  FROM tf JOIN dft ON tf.token = dft.token CROSS JOIN nd
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score DESC, token) AS rank
  FROM scored
)
SELECT doc_id, token, tf, df, score, rank
FROM ranked WHERE rank <= {TFIDF_TOPK}
""",
)(doc_tfidf_keywords)


def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval confusion matrix for the language-ID heuristic:
    labeled lang × predicted dialect with counts and the within-label
    share — the eval table every model-backed filter in a data
    pipeline needs before its verdicts gate documents (here evaluating
    ``doc_lang_id``'s dialect predictor against the labeled lang
    column). Share is an int-ratio rounded at 9.

    Scale shape: rides the one-scan lang-ID projection; the matrix is
    |labels|×|classes| rows and the share window runs over it, never
    the corpus."""
    pred = doc_lang_id(spark, sf_dir)
    cells = pred.groupBy(
        F.col("labeled_lang"), F.col("predicted_dialect")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    tot = Window.partitionBy("labeled_lang")
    return cells.select(
        "labeled_lang",
        "predicted_dialect",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(tot).cast("double"),
            9,
        ).alias("share_of_label"),
    )


def _confusion_oracle() -> str:
    from smart_meter_data_pipeline_spark.plans.registry import ORACLES

    return f"""
WITH pred AS ({ORACLES["doc_lang_id"]}),
cells AS (
  SELECT labeled_lang, predicted_dialect, COUNT(*) AS n_docs
  FROM pred GROUP BY 1, 2
)
SELECT labeled_lang, predicted_dialect, n_docs,
       round(CAST(n_docs AS DOUBLE)
             / CAST(SUM(n_docs) OVER (PARTITION BY labeled_lang)
                    AS DOUBLE), 9) AS share_of_label
FROM cells
"""


register("lang_confusion_matrix", _confusion_oracle())(lang_confusion_matrix)


def doc_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio (lexical diversity): distinct words over total
    words per document, binned to integer permille — the classic
    quality signal for detecting templated/repetitive text that
    length or punctuation ratios miss (a 10k-word page of the same 20
    words has high length-quality but TTR ≈ 2‰). Integer outputs
    (counts + floor permille) hash exactly; the per-doc distinct is an
    explode → two-level aggregate, partial-combining on (doc, word)
    before the distinct merge."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    words = docs.select(
        "doc_id",
        "source",
        F.explode(tokens()).alias("word"),
    )
    return (
        words.groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.countDistinct("word").alias("n_distinct_words"),
        )
        .withColumn(
            "ttr_permille",
            F.floor(
                F.col("n_distinct_words") * 1000 / F.col("n_words")
            ).cast("bigint"),
        )
    )


_TTR_SQL = """
WITH words AS (
  SELECT doc_id, source, unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS word
  FROM documents
)
SELECT doc_id, source,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_words,
       CAST(FLOOR(COUNT(DISTINCT word) * 1000.0 / COUNT(*)) AS BIGINT)
           AS ttr_permille
FROM words
GROUP BY doc_id, source
"""

register("doc_ttr", _TTR_SQL)(doc_ttr)


VOCAB_GROWTH_STEP = 100  # doc_id checkpoint spacing


def doc_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct tokens
    vs cumulative token count at doc_id checkpoints — the measurement
    behind tokenizer sizing and dedup-payoff estimates (a flattening
    curve means new documents stop contributing vocabulary).

    One corpus scan, no per-checkpoint rescans and no theta-joins:
    both curves reduce to per-BUCKET rollups (bucket = doc_id //
    step; a token's vocab bucket is its first containing doc's
    bucket) followed by ONE cumulative window over the bucket spine.
    A doc in bucket b has doc_id < (b+1)*step exactly, so the running
    sum over buckets ≤ b equals the strict-< checkpoint semantics.
    The window is unpartitioned but runs on n_docs/step rows (the
    bucket rollup), never the corpus — linear at 100×, where the old
    ``doc_id < checkpoint`` theta-join was O(n²/step)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select("doc_id", F.explode(tokens()).alias("word"))
    first_seen = words.groupBy("word").agg(
        F.min("doc_id").alias("first_doc")
    )
    bucket_of = lambda c: F.floor(F.col(c) / VOCAB_GROWTH_STEP)
    # bucket spine derived from the data (scale-proof, and DuckDB
    # range() cannot take subquery bounds): every occupied doc_id
    # bucket — including ones whose docs tokenize to nothing
    buckets = docs.select(bucket_of("doc_id").alias("bucket")).distinct()
    tok_b = (
        words.groupBy(bucket_of("doc_id").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("b_toks"))
    )
    voc_b = (
        first_seen.groupBy(bucket_of("first_doc").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("b_vocab"))
    )
    w = SqlWindow.orderBy("bucket").rowsBetween(
        SqlWindow.unboundedPreceding, SqlWindow.currentRow
    )
    return (
        buckets.join(tok_b, "bucket", "left")
        .join(voc_b, "bucket", "left")
        .select(
            ((F.col("bucket") + 1) * VOCAB_GROWTH_STEP)
            .cast("bigint")
            .alias("checkpoint"),
            F.sum(F.coalesce(F.col("b_toks"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("cum_tokens"),
            F.sum(F.coalesce(F.col("b_vocab"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("cum_distinct_tokens"),
        )
    )


_VOCAB_GROWTH_SQL = f"""
WITH words AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS word
  FROM documents
),
first_seen AS (
  SELECT word, MIN(doc_id) AS first_doc FROM words GROUP BY word
),
tok_counts AS (
  SELECT doc_id, COUNT(*) AS n_toks FROM words GROUP BY doc_id
),
tok_b AS (
  SELECT doc_id // {VOCAB_GROWTH_STEP} AS bucket, COUNT(*) AS b_toks
  FROM words GROUP BY 1
),
voc_b AS (
  SELECT first_doc // {VOCAB_GROWTH_STEP} AS bucket, COUNT(*) AS b_vocab
  FROM first_seen GROUP BY 1
),
buckets AS (
  SELECT DISTINCT doc_id // {VOCAB_GROWTH_STEP} AS bucket FROM documents
)
SELECT CAST((bucket + 1) * {VOCAB_GROWTH_STEP} AS BIGINT) AS checkpoint,
       CAST(SUM(COALESCE(b_toks, 0)) OVER (
              ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(b_vocab, 0)) OVER (
              ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS BIGINT) AS cum_distinct_tokens
FROM buckets
LEFT JOIN tok_b USING (bucket)
LEFT JOIN voc_b USING (bucket)
"""

register("doc_vocab_growth", _VOCAB_GROWTH_SQL)(doc_vocab_growth)


FLUENCY_TOP_K = 50


def doc_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM fluency surrogate: score each document by how COMMON
    its word bigrams are in the corpus — the cheap stand-in for an
    n-gram language-model likelihood that curation pipelines use to
    surface boilerplate-heavy (very high score) and garbled (very
    low score) documents without a trained LM. Top-K by score.

    All-integer scoring (a true LM score needs log-probabilities and
    ln() is not cross-engine bit-stable — see doc_bm25_mlt's rational
    surrogate note): fluency_micro = (1e6 · Σ corpus_count(bigram))
    div n_bigrams, i.e. the average corpus frequency of the doc's
    bigrams in micro-units, exact in int64.

    Scale shape: one corpus scan → per-doc bigrams via LEAD over the
    (doc, pos) window (partitioned by doc — thousands of tiny
    partitions, perfectly parallel); corpus counts are one
    partial-combined rollup; the score join shuffles on the bigram
    string once; top-K is a TakeOrdered, never a global sort."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.posexplode(tokens()).alias("pos", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        words.withColumn("nxt", F.lead("word").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", "word", "nxt").alias("bg"),
        )
    )
    counts = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        bigrams.join(counts, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("cnt").alias("sum_cnt"),
        )
        .select(
            "doc_id",
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            F.expr(
                "CAST((1000000 * sum_cnt) div n_bigrams AS BIGINT)"
            ).alias("fluency_micro"),
        )
        .orderBy(F.col("fluency_micro").desc(), F.col("doc_id"))
        .limit(FLUENCY_TOP_K)
    )


_BIGRAM_FLUENCY_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS arr
  FROM documents
),
words AS (
  SELECT doc_id,
         generate_subscripts(arr, 1) AS pos,
         unnest(arr) AS word
  FROM toks
),
bigrams AS (
  SELECT doc_id, word || ' ' || nxt AS bg
  FROM (
    SELECT doc_id, word,
           LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM words
  )
  WHERE nxt IS NOT NULL
),
counts AS (
  SELECT bg, COUNT(*) AS cnt FROM bigrams GROUP BY bg
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST((1000000 * SUM(cnt)) // COUNT(*) AS BIGINT)
           AS fluency_micro
FROM bigrams JOIN counts USING (bg)
GROUP BY doc_id
ORDER BY fluency_micro DESC, doc_id
LIMIT {FLUENCY_TOP_K}
"""

register("doc_bigram_fluency", _BIGRAM_FLUENCY_SQL)(doc_bigram_fluency)


ZIPF_TOP_K = 100


def corpus_zipf_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostic over the corpus vocabulary: for the top-K
    tokens by frequency, rank·count — constant under ideal Zipf — in
    one integer column, the quick shape check (alongside
    doc_vocab_growth's Heaps' curve) that flags boilerplate-flooded
    or template-heavy corpora before training (a flat head means a
    few templates dominate).

    No logs, no doubles: rank·count is exact int64, and the global
    ranking uses the centroid-outliers pattern — TakeOrdered to the
    K-row head first, THEN a rank window over ≤K rows — never a
    single-partition sort of the (corpus-scaled) vocabulary."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("text")
    counts = (
        docs.select(F.explode(tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    head = counts.orderBy(F.col("cnt").desc(), F.col("word")).limit(
        ZIPF_TOP_K
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("word"))
    return head.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        "word",
        F.col("cnt").cast("bigint").alias("cnt"),
        (F.col("rank") * F.col("cnt")).cast("bigint").alias("rank_cnt"),
    )


_ZIPF_SQL = f"""
WITH words AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS word
  FROM documents
),
counts AS (
  SELECT word, COUNT(*) AS cnt FROM words GROUP BY 1
),
head AS (
  SELECT word, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rank
  FROM counts
  ORDER BY cnt DESC, word
  LIMIT {ZIPF_TOP_K}
)
SELECT rank, word, CAST(cnt AS BIGINT) AS cnt,
       CAST(rank * cnt AS BIGINT) AS rank_cnt
FROM head
"""

register("corpus_zipf_check", _ZIPF_SQL)(corpus_zipf_check)


BPE_TOP_K = 30
BPE_MAX_WORD = 64  # char-pair scan cap per word (both engines)


def corpus_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of BPE tokenizer training: count every
    adjacent CHARACTER pair across the corpus, weighted by word
    frequency, and rank the top merge candidates — the step a
    tokenizer-training pipeline runs repeatedly (here once, making it
    oracle-checkable; later iterations just re-run it on the merged
    symbol stream).

    Scale shape: the heavy corpus scan collapses to the VOCABULARY
    first (word → frequency, one partial-combined rollup); character
    pairs explode from the vocab only (vocab-sized × word length, not
    corpus-sized), weighted by the frequency column; the pair rollup
    is bounded by |alphabet|² and the top-K is a TakeOrdered with the
    rank window above it. Words are scanned up to ``BPE_MAX_WORD``
    chars (identically in both engines — the oracle's lateral range
    has a static bound).

    All-integer weights; strings only as group keys."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("text")
    vocab = (
        docs.select(F.explode(tokens()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = vocab.select(
        "freq",
        F.explode(
            F.expr(
                f"transform(sequence(1, least(length(word) - 1,"
                f" {BPE_MAX_WORD - 1})), i -> substring(word, i, 2))"
            )
        ).alias("pair"),
    ).filter(F.length("pair") == 2)
    totals = pairs.groupBy("pair").agg(F.sum("freq").alias("total_freq"))
    head = totals.orderBy(
        F.col("total_freq").desc(), F.col("pair")
    ).limit(BPE_TOP_K)
    w = Window.orderBy(F.col("total_freq").desc(), F.col("pair"))
    return head.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        "pair",
        F.col("total_freq").cast("bigint").alias("total_freq"),
    )


_BPE_SQL = f"""
WITH words AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS word
  FROM documents
),
vocab AS (
  SELECT word, COUNT(*) AS freq FROM words GROUP BY 1
),
pairs AS (
  SELECT substring(word, CAST(i AS INT), 2) AS pair, freq
  FROM vocab, range(1, {BPE_MAX_WORD}) t(i)
  WHERE i <= length(word) - 1
),
totals AS (
  SELECT pair, SUM(freq) AS total_freq
  FROM pairs WHERE length(pair) = 2 GROUP BY 1
),
head AS (
  SELECT pair, total_freq,
         ROW_NUMBER() OVER (ORDER BY total_freq DESC, pair) AS rank
  FROM totals
  ORDER BY total_freq DESC, pair
  LIMIT {BPE_TOP_K}
)
SELECT rank, pair, CAST(total_freq AS BIGINT) AS total_freq FROM head
"""

register("corpus_bpe_merge_candidates", _BPE_SQL)(
    corpus_bpe_merge_candidates
)


def doc_length_magnitude_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-of-magnitude length profile per source: documents bucketed
    by the DIGIT COUNT of their character length (1 → 1-9 chars, 2 →
    10-99, …) — the log-free histogram a corpus audit uses to spot
    truncation spikes and length outliers per provider (log10 binning
    is the textbook form, but log10 is not cross-engine bit-stable;
    decimal digit count is the same partition computed exactly:
    integer→string length is identical in every engine).

    One rollup over (source, magnitude) + per-source totals joined
    back by broadcast; micro-share output."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.length("text").alias("n_chars")
    )
    bucketed = docs.select(
        "source",
        F.length(F.col("n_chars").cast("string")).alias("magnitude"),
    ).groupBy("source", "magnitude").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = bucketed.groupBy("source").agg(
        F.sum("n_docs").alias("total")
    )
    return bucketed.join(F.broadcast(totals), "source").select(
        "source",
        F.col("magnitude").cast("int").alias("magnitude"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.expr("CAST((1000000 * n_docs) div total AS BIGINT)").alias(
            "share_micro"
        ),
    )


register(
    "doc_length_magnitude_profile",
    """
WITH bucketed AS (
  SELECT source,
         LENGTH(CAST(LENGTH(text) AS VARCHAR)) AS magnitude,
         COUNT(*) AS n_docs
  FROM documents GROUP BY 1, 2
),
totals AS (
  SELECT source, SUM(n_docs) AS total FROM bucketed GROUP BY 1
)
SELECT source, CAST(magnitude AS INT) AS magnitude,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST((1000000 * n_docs) // total AS BIGINT) AS share_micro
FROM bucketed JOIN totals USING (source)
""",
)(doc_length_magnitude_profile)


COVERAGE_KS = [10, 100, 1000]


def corpus_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage curve for tokenizer sizing: what share of
    ALL bigram occurrences do the top-10 / top-100 / top-1000 bigram
    types cover? A steep curve says a small merge table captures the
    corpus; a flat one says the long tail dominates (the
    Zipf/BPE-sizing companion to corpus_zipf_check and
    corpus_bpe_merge_candidates).

    Scale shape: bigram rollup (partial-combined) → TakeOrdered head
    of max(K) rows → cumulative window over ≤1000 rows → three
    fixed-rank selections; the total is a 1-row broadcast. All
    integers: coverage_micro = (1e6·cum_topk) div total."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.posexplode(tokens()).alias("pos", "word")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        words.withColumn("nxt", F.lead("word").over(w_doc))
        .filter(F.col("nxt").isNotNull())
        .select(F.concat_ws(" ", "word", "nxt").alias("bg"))
    )
    counts = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    head = counts.orderBy(F.col("cnt").desc(), F.col("bg")).limit(
        max(COVERAGE_KS)
    )
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("bg")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_rn = Window.orderBy(F.col("cnt").desc(), F.col("bg"))
    cum = head.select(
        F.row_number().over(w_rn).alias("rank"),
        F.sum("cnt").over(w_rank).alias("cum_cnt"),
    )
    picked = cum.filter(
        F.col("rank").isin([k for k in COVERAGE_KS])
    )
    return picked.crossJoin(F.broadcast(total)).select(
        F.col("rank").cast("int").alias("top_k"),
        F.col("cum_cnt").cast("bigint").alias("cum_occurrences"),
        F.expr("CAST((1000000 * cum_cnt) div total AS BIGINT)").alias(
            "coverage_micro"
        ),
    )


def _bigram_coverage_sql() -> str:
    ks = ", ".join(str(k) for k in COVERAGE_KS)
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS arr
  FROM documents
),
words AS (
  SELECT doc_id, generate_subscripts(arr, 1) AS pos, unnest(arr) AS word
  FROM toks
),
bigrams AS (
  SELECT word || ' ' || nxt AS bg
  FROM (
    SELECT doc_id, word,
           LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM words
  ) WHERE nxt IS NOT NULL
),
counts AS (SELECT bg, COUNT(*) AS cnt FROM bigrams GROUP BY bg),
total AS (SELECT SUM(cnt) AS total FROM counts),
head AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, bg) AS rank
  FROM counts ORDER BY cnt DESC, bg LIMIT {max(COVERAGE_KS)}
),
cum AS (
  SELECT rank,
         SUM(cnt) OVER (ORDER BY rank
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum_cnt
  FROM head
)
SELECT CAST(rank AS INT) AS top_k,
       CAST(cum_cnt AS BIGINT) AS cum_occurrences,
       CAST((1000000 * cum_cnt) // total AS BIGINT) AS coverage_micro
FROM cum, total
WHERE rank IN ({ks})
"""


register("corpus_bigram_coverage", _bigram_coverage_sql())(
    corpus_bigram_coverage
)


RARE_MAX_COUNT = 2  # corpus count at or below which a token is "rare"


def doc_lm_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score without transcendentals: build the
    corpus unigram model, then score each document by the
    occurrence-weighted mean corpus frequency of its tokens
    (micro-units) plus the share of its tokens that are corpus-rare
    (count ≤ {RARE_MAX_COUNT}). This is the rational-arithmetic stand-in
    for the classic per-doc LM perplexity filter: garbled or
    off-distribution documents score low commonness / high rare-share,
    exactly the rows a pretraining curation pass drops or
    down-weights. (True log-perplexity is deliberately avoided — ln()
    is not cross-engine bit-stable; see the verify notes.)

    Scale shape: per-doc token counts aggregate BEFORE the vocabulary
    join (so the join volume is distinct (doc, word) pairs, not raw
    occurrences) and the join is an equi-join keyed by word — both
    sides partitioned by the same key, no broadcast of anything
    corpus-sized; the 1-row total rides a scalar broadcast. All
    integer arithmetic: f_micro = (1e6·cnt) div total, per-doc means
    by int64 floor division."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.explode(tokens()).alias("word")
    )
    dw = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("c"))
    vocab = dw.groupBy("word").agg(F.sum("c").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    f = vocab.crossJoin(F.broadcast(total)).select(
        "word",
        "cnt",
        F.expr(f"({_MICRO_LM} * cnt) div total").alias("f_micro"),
    )
    scored = (
        dw.join(f, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("f_micro")).alias("wsum"),
            F.sum(
                F.when(F.col("cnt") <= RARE_MAX_COUNT, F.col("c")).otherwise(
                    F.lit(0)
                )
            ).alias("n_rare"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.expr("wsum div n_tokens").cast("bigint").alias(
            "mean_commonness_micro"
        ),
        F.expr(f"({_MICRO_LM} * n_rare) div n_tokens").cast("bigint").alias(
            "rare_share_micro"
        ),
    )


_MICRO_LM = 1_000_000


register(
    "doc_lm_commonness",
    f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS arr
  FROM documents
),
words AS (SELECT doc_id, unnest(arr) AS word FROM toks),
dw AS (SELECT doc_id, word, COUNT(*) AS c FROM words GROUP BY 1, 2),
vocab AS (SELECT word, SUM(c) AS cnt FROM dw GROUP BY 1),
tot AS (SELECT SUM(cnt) AS total FROM vocab),
f AS (
  SELECT word, cnt,
         CAST(({_MICRO_LM} * cnt) // total AS BIGINT) AS f_micro
  FROM vocab, tot
)
SELECT d.doc_id,
       CAST(SUM(d.c) AS BIGINT) AS n_tokens,
       CAST(SUM(d.c * f.f_micro) // SUM(d.c) AS BIGINT)
         AS mean_commonness_micro,
       CAST(({_MICRO_LM} * SUM(CASE WHEN f.cnt <= {RARE_MAX_COUNT}
                                    THEN d.c ELSE 0 END))
            // SUM(d.c) AS BIGINT) AS rare_share_micro
FROM dw d JOIN f ON d.word = f.word
GROUP BY d.doc_id
""",
)(doc_lm_commonness)


_HEXD = "0123456789abcdef"
HASH_BUCKETS = 64
# Frozen "trained" weights as a closed-form integer schedule over the
# bucket id: w(b) = ((b·40503) mod 1001) − 500 ∈ [−500, 500]. A real
# deployment loads learned weights; the schedule keeps the pipeline
# deterministic and oracle-checkable while exercising the identical
# plan (hash → bucket → weight → per-doc sum).
_W_MUL, _W_MOD, _W_SHIFT = 40503, 1001, 500


def doc_hashed_ngram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FastText-shaped quality classifier: feature-hash every token
    into {HASH_BUCKETS} buckets (first two hex digits of md5 — the
    same portable hex→int idiom as SimHash), look up a frozen integer
    weight per bucket, and score each document by the
    occurrence-weighted sum; verdict = keep iff the sum is positive.
    This is the linear text-classifier filter (fastText / logistic
    over hashed n-grams) that large-scale curation stacks run after
    the cheap heuristics — mechanically identical to serving a real
    weight vector.

    Scale shape: explode → per-token constant-time bucket/weight
    arithmetic (no vocabulary join at all — hashing is what makes the
    classifier O(tokens) with O(buckets) state) → one partial-combined
    per-doc aggregation. Everything int64; no division anywhere, so
    Spark's truncating `div` vs DuckDB's flooring `//` never meet a
    negative operand."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(tokens()).alias("tok"))
    scored = tok.select(
        "doc_id",
        F.expr(
            f"((instr('{_HEXD}', substr(md5(tok), 1, 1)) - 1) * 16"
            f" + (instr('{_HEXD}', substr(md5(tok), 2, 1)) - 1))"
            f" % {HASH_BUCKETS}"
        ).alias("bucket"),
    ).select(
        "doc_id",
        F.expr(
            f"((bucket * {_W_MUL}) % {_W_MOD}) - {_W_SHIFT}"
        ).alias("w"),
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("w").alias("feat_sum"),
    )
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("feat_sum").cast("bigint").alias("feat_sum"),
        F.when(F.col("feat_sum") > 0, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("verdict"),
    )


register(
    "doc_hashed_ngram_score",
    f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS arr
  FROM documents
),
words AS (SELECT doc_id, unnest(arr) AS tok FROM toks),
b AS (
  SELECT doc_id,
         ((strpos('{_HEXD}', substr(md5(tok), 1, 1)) - 1) * 16
          + (strpos('{_HEXD}', substr(md5(tok), 2, 1)) - 1))
           % {HASH_BUCKETS} AS bucket
  FROM words
),
w AS (
  SELECT doc_id,
         ((bucket * {_W_MUL}) % {_W_MOD}) - {_W_SHIFT} AS w
  FROM b
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(w) AS BIGINT) AS feat_sum,
       CASE WHEN SUM(w) > 0 THEN 'keep' ELSE 'drop' END AS verdict
FROM w
GROUP BY doc_id
""",
)(doc_hashed_ngram_score)


WINNOW_W = 8  # winnowing guarantee window (in shingle positions)


def doc_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every char-{SHINGLE_WIDTH}-gram at its position,
    slide a window of {WINNOW_W} consecutive hashes, keep each
    window's minimum — the selected-fingerprint density is
    2/(w+1) yet any shared substring of length
    {SHINGLE_WIDTH}+{WINNOW_W}-1 is GUARANTEED to collide on at least
    one fingerprint. This is the local-fingerprint generalization of
    doc_fingerprint's global-min and the standard plagiarism /
    near-dup screen for code and text corpora. Output per doc:
    window count, distinct-fingerprint count, and the lexicographic
    min/max fingerprint (set summary).

    Scale shape: the explode is partition-local; ONE shuffle keys by
    doc_id for the position-ordered window (frames are row-bounded,
    ROWS CURRENT..{WINNOW_W}-1 FOLLOWING); the distinct and rollup
    reuse the same doc_id partitioning. Fingerprint selection cuts
    the downstream set to ~2/(w+1) of the shingle volume — the point
    of winnowing at 100 TB."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pos_h = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - (SHINGLE_WIDTH - 1))
        ).alias("pos"),
        "text",
    ).select(
        "doc_id",
        "pos",
        F.md5(F.expr(f"substr(text, pos, {SHINGLE_WIDTH})")).alias("h"),
    )
    win = (
        SqlWindow.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, WINNOW_W - 1)
    )
    full = (
        pos_h.withColumn("n_in_win", F.count("h").over(win))
        .withColumn("wmin", F.min("h").over(win))
        .filter(F.col("n_in_win") == WINNOW_W)
    )
    fps = full.select("doc_id", "pos", "wmin")
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.countDistinct("wmin").cast("bigint").alias("n_fingerprints"),
        F.min("wmin").alias("min_fingerprint"),
        F.max("wmin").alias("max_fingerprint"),
    )


register(
    "doc_winnowing",
    f"""
WITH pos_h AS (
  SELECT doc_id, CAST(pos AS INT) AS pos,
         md5(substr(text, CAST(pos AS INT), {SHINGLE_WIDTH})) AS h
  FROM documents, range(1, 100000) t(pos)
  WHERE pos <= length(text) - {SHINGLE_WIDTH - 1}
),
win AS (
  SELECT doc_id, pos,
         COUNT(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW
                        AND {WINNOW_W - 1} FOLLOWING) AS n_in_win,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW
                      AND {WINNOW_W - 1} FOLLOWING) AS wmin
  FROM pos_h
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(COUNT(DISTINCT wmin) AS BIGINT) AS n_fingerprints,
       MIN(wmin) AS min_fingerprint,
       MAX(wmin) AS max_fingerprint
FROM win
WHERE n_in_win = {WINNOW_W}
GROUP BY doc_id
""",
)(doc_winnowing)


def doc_char_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level repetition screen (the compressibility proxy
    from the Gopher-rules family): per doc, total vs distinct
    char-{SHINGLE_WIDTH}-gram counts and their ratio — a document
    whose shingle stream is mostly repeats compresses well and is the
    classic generated/boilerplate spam signature. Token-level TTR
    (doc_ttr, doc_repetition_ratio) misses this when the repetition
    unit is longer than a word or crosses word boundaries.

    Scale shape: the positional explode is partition-local; both
    counts come from ONE (doc, shingle) rollup (count + count distinct
    share the doc_id partitioning); integer micro ratio."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pos_sh = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - (SHINGLE_WIDTH - 1))
        ).alias("pos"),
        "text",
    ).select(
        "doc_id", F.expr(f"substr(text, pos, {SHINGLE_WIDTH})").alias("sh")
    )
    return pos_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.countDistinct("sh").cast("bigint").alias("n_distinct"),
        F.expr(
            "CAST((1000000 * count(DISTINCT sh)) div count(1) AS BIGINT)"
        ).alias("diversity_micro"),
    )


register(
    "doc_char_ngram_diversity",
    f"""
WITH sh AS (
  SELECT doc_id, substr(text, CAST(pos AS INT), {SHINGLE_WIDTH}) AS sh
  FROM documents, range(1, 100000) t(pos)
  WHERE pos <= length(text) - {SHINGLE_WIDTH - 1}
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_distinct,
       CAST((1000000 * COUNT(DISTINCT sh)) // COUNT(*) AS BIGINT)
         AS diversity_micro
FROM sh
GROUP BY doc_id
""",
)(doc_char_ngram_diversity)


def corpus_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by (source, lang): BPE-ish pieces per
    whitespace word in micro-units — THE tokenizer-evaluation metric
    (fertility ≫ 1 on a slice means the tokenizer fragments that
    slice's text and its effective context shrinks; the per-slice
    view shows which sources/languages pay the fragmentation tax).

    Scale shape: per-doc counts are scan-speed regex/size expressions
    (shared contract with doc_token_stats); one (source, lang) rollup
    of two integer sums; fertility by int64 floor division."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    per = docs.select(
        "source",
        "lang",
        F.size(toks).alias("n_words"),
        F.regexp_count(
            F.col("text"), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")
        ).alias("n_pieces"),
    )
    return (
        per.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "n_words",
            "n_pieces",
            F.expr("(1000000 * n_pieces) div n_words")
            .cast("bigint")
            .alias("fertility_micro"),
        )
    )


register(
    "corpus_tokenizer_fertility",
    """
WITH per AS (
  SELECT source, lang,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
              AS BIGINT) AS n_pieces
  FROM documents
)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
       CAST((1000000 * SUM(n_pieces)) // SUM(n_words) AS BIGINT)
         AS fertility_micro
FROM per
GROUP BY 1, 2
""",
)(corpus_tokenizer_fertility)


# ---------------------------------------------------------------------------
# LIX readability index
# ---------------------------------------------------------------------------

LIX_LONG_WORD = 7  # chars; Björnsson's original threshold


def doc_lix_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Björnsson's LIX readability index per document, in exact milli
    units: LIX = words/sentences + 100·longwords/words, computed as
    (1000·W) div S + (100000·L) div W (integer floor division both
    engines agree on; the floored-terms variant is documented rather
    than the float formula, keeping the score under the hash gate
    with zero FP steps). Sentences = terminal-punctuation runs
    (.!?), minimum 1; long words = tokens over {LIX_LONG_WORD} chars.
    A named, thresholdable readability score for the curation rules —
    the classic complement to the ratio features in
    ``doc_quality_score`` (LIX > 60 ≈ very hard text; < 25 ≈
    children's text).

    Scale shape: per-row expressions only — one scan, no joins, no
    windows, no aggregation at all."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    n_words = F.size(toks)
    n_long = F.size(
        F.filter(toks, lambda t: F.length(t) > LIX_LONG_WORD)
    )
    n_sent = F.greatest(
        F.regexp_count(F.col("text"), F.lit("[.!?]+")), F.lit(1)
    )
    return docs.select(
        "doc_id",
        "lang",
        n_words.cast("bigint").alias("n_words"),
        n_sent.cast("bigint").alias("n_sentences"),
        n_long.cast("bigint").alias("n_long_words"),
        F.expr(
            f"CAST((1000 * size(filter(split(text, ' '), x -> x <> '')))"
            f" div greatest(regexp_count(text, '[.!?]+'), 1)"
            f" + (100000 * size(filter(split(text, ' '),"
            f" x -> x <> '' AND length(x) > {LIX_LONG_WORD})))"
            f" div greatest(size(filter(split(text, ' '),"
            f" x -> x <> '')), 1) AS BIGINT)"
        ).alias("lix_milli"),
    )


register(
    "doc_lix_readability",
    f"""
WITH feat AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), x -> x <> ''))
           AS n_words,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
           AS n_sentences,
         len(list_filter(string_split(text, ' '),
             x -> x <> '' AND length(x) > {LIX_LONG_WORD}))
           AS n_long_words
  FROM documents
)
SELECT doc_id, lang,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_long_words AS BIGINT) AS n_long_words,
       CAST(CAST((1000 * n_words) // n_sentences AS BIGINT)
            + CAST((100000 * n_long_words) // GREATEST(n_words, 1)
              AS BIGINT) AS BIGINT) AS lix_milli
FROM feat
""",
)(doc_lix_readability)


FEAT_DIMS = 32  # hashing-trick feature width


def doc_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HASHING TRICK (feature hashing, Weinberger et al.) — the
    fixed-width featurizer every large-scale linear/GBDT pipeline
    uses when the vocabulary is unbounded: each token hashes to one
    of {FEAT_DIMS} dimensions (first two md5 nibbles) with a signed
    contribution (third nibble's parity), so collisions cancel in
    expectation and no vocabulary dictionary ever exists — the whole
    featurizer is stateless and embarrassingly parallel, which is
    exactly why it scales where a fitted CountVectorizer (a
    vocab-sized broadcast + a fit pass) does not.

    Output: sparse (doc_id, dim, weight) rows, zero-weight cells
    omitted. Everything integer (portable nibble decode, signed
    counts) — no float anywhere, so the hash gate is exact.

    Scale shape: explode → (doc, dim) partial-agg; one shuffle keyed
    by (doc_id, dim); no fit pass, no dictionary join."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(tokens()).alias("tok"))
    dim = F.expr(
        f"(((instr('{_HEXD}', substr(md5(tok), 1, 1)) - 1) * 16"
        f" + (instr('{_HEXD}', substr(md5(tok), 2, 1)) - 1))"
        f" % {FEAT_DIMS})"
    )
    sign = F.expr(
        f"CASE WHEN (instr('{_HEXD}', substr(md5(tok), 3, 1)) - 1) % 2 = 0"
        " THEN 1 ELSE -1 END"
    )
    return (
        tok.select(
            "doc_id", dim.cast("int").alias("dim"), sign.alias("s")
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("s").cast("bigint").alias("weight"))
        .filter(F.col("weight") != 0)
    )


register(
    "doc_hashed_features",
    f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS tok
  FROM documents
),
scored AS (
  SELECT doc_id,
         CAST((((instr('{_HEXD}', substr(md5(tok), 1, 1)) - 1) * 16
               + (instr('{_HEXD}', substr(md5(tok), 2, 1)) - 1))
              % {FEAT_DIMS}) AS INT) AS dim,
         CASE WHEN (instr('{_HEXD}', substr(md5(tok), 3, 1)) - 1) % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM tok
)
SELECT doc_id, dim, CAST(SUM(s) AS BIGINT) AS weight
FROM scored GROUP BY 1, 2 HAVING SUM(s) <> 0
""",
)(doc_hashed_features)


def corpus_text_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index full-text search under the driver gate (round
    12, sources/index.py:refresh_text_index / text_index_search): the
    documents corpus lands in a manifest table, a token→file posting
    index is built ONCE (the per-file tokenization cost paid at
    refresh, never per search), and a two-token ALL-mode search
    ('dup' AND 'vector') is served through it — candidate files are
    the INTERSECTION of the tokens' posting sets (a file holding a
    matching doc must contain every token), unindexed files are
    always candidates (the staleness rule), and the row-level token
    predicate applies on top, so the result hash-equals the plain
    whitespace-token filter. The posting table pruning ITSELF is
    asserted in-query (token-range-clustered postings + string zone
    maps — the round-12 self-indexing rule): at a million-file corpus
    the posting table is the size the index must not scan.

    This is the lakehouse needle-in-a-haystack primitive a 100 TB
    text corpus needs: "which files mention TOKEN" from metadata +
    one bounded posting lookup, not a corpus scan."""
    import os
    import shutil
    import tempfile

    from smart_meter_data_pipeline_spark.sources.index import (
        refresh_text_index,
        text_index_search,
    )
    from smart_meter_data_pipeline_spark.sources.manifest import (
        ManifestTable,
    )

    workdir = tempfile.mkdtemp(prefix="corpus_text_idx_q_")
    try:
        t = ManifestTable(os.path.join(workdir, "docs"))
        docs = load_table(spark, sf_dir, "documents")
        t.idempotent_append(
            spark,
            docs,
            pk=["doc_id"],
            cluster_by=["doc_id"],
            cluster_partitions=8,
        )
        res = refresh_text_index(
            t, spark, "text", posting_partitions=8
        )
        if res["postings"] == 0:
            raise AssertionError("text refresh produced no postings")
        out, rep = text_index_search(
            t, spark, "text", ["dup", "vector"], mode="all"
        )
        if not (
            0
            < rep["posting_files_read"]
            < rep["posting_files_live"]
        ):
            raise AssertionError(
                f"posting table skipped nothing on itself: {rep}"
            )
        if rep["files_unindexed"] != 0:
            raise AssertionError(f"index stale after refresh: {rep}")
        return out.select(
            "doc_id", "text", "lang", "source", "n_chars"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


register(
    "corpus_text_index_search",
    """
SELECT doc_id, text, lang, source, n_chars
FROM documents
WHERE list_contains(string_split(text, ' '), 'dup')
  AND list_contains(string_split(text, ' '), 'vector')
""",
)(corpus_text_index_search)


def corpus_text_index_hot_token(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The df-cap under the driver gate (round 13,
    sources/index.py:_posting_df_caps): the corpus's single MOST
    FREQUENT token — picked deterministically in-query (highest
    count, ties by token) so both engines choose the same word — is
    posted in ~every file, and its posting list would be an
    O(n_files) driver collect that prunes nothing; the lookup must
    COUNT first and serve it as "all indexed files" (asserted:
    ``df_capped_tokens >= 1``). The other search term is a sentinel
    token carried only by 20 deterministic "needle" documents
    (derived from the 20 lowest doc_ids, re-keyed and re-texted
    identically in both engines) appended as their own commit — so
    in ALL mode the capped token contributes "all files" to the
    intersection while the needle postings keep the read bounded to
    the appended files (asserted: a strict-subset read, at ANY scale
    factor — the closed synthetic vocabulary makes every REAL token
    near-every-file, which is itself why the cap exists). The cap is
    EXPLICIT (round 14, advisor): the needle commit is pinned to 2
    files, every needle text contains the hot token, and the hot
    token occurs in >=1 base file by definition of "most frequent",
    so ``df(hot) >= 3 > df(zzqneedle) = 2`` holds by construction —
    ``df_cap=3`` caps exactly the hot token at any corpus
    distribution, instead of betting the default 90% threshold on
    the natural top token reaching ~every base file (a driver-time
    AssertionError if it missed a couple). Capping is a sound
    superset whatever the occupancy, and the row predicate applies
    on top, so the result hash-equals the plain two-token filter —
    the cap is a pure IO decision, invisible in the relation."""
    import os
    import shutil
    import tempfile

    from smart_meter_data_pipeline_spark.sources.index import (
        refresh_text_index,
        text_index_search,
    )
    from smart_meter_data_pipeline_spark.sources.manifest import (
        ManifestTable,
    )

    workdir = tempfile.mkdtemp(prefix="corpus_text_hot_q_")
    try:
        t = ManifestTable(os.path.join(workdir, "docs"))
        docs = load_table(spark, sf_dir, "documents")
        hot = (
            docs.select(
                F.explode(F.split(F.col("text"), " +")).alias("tok")
            )
            .filter(F.col("tok") != "")
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.col("tok"))
            .limit(1)
            .collect()[0]["tok"]
        )
        needles = (
            docs.orderBy("doc_id")
            .limit(20)
            .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
            .withColumn(
                "text",
                F.concat(
                    F.lit(hot + " zzqneedle x"),
                    F.col("doc_id").cast("string"),
                ),
            )
            .withColumn("n_chars", F.length("text").cast("bigint"))
        )
        t.idempotent_append(
            spark,
            docs,
            pk=["doc_id"],
            cluster_by=["doc_id"],
            cluster_partitions=8,
        )
        t.idempotent_append(
            spark,
            needles,
            pk=["doc_id"],
            cluster_by=["doc_id"],
            cluster_partitions=2,
        )
        refresh_text_index(t, spark, "text", posting_partitions=8)
        out, rep = text_index_search(
            t, spark, "text", [hot, "zzqneedle"], mode="all", df_cap=3
        )
        if rep["df_capped_tokens"] < 1:
            raise AssertionError(
                f"most frequent token {hot!r} was not df-capped: {rep}"
            )
        if not (0 < rep["files_read"] < rep["files_live"]):
            raise AssertionError(
                f"needle postings pruned nothing: {rep}"
            )
        return out.select(
            "doc_id", "text", "lang", "source", "n_chars"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


register(
    "corpus_text_index_hot_token",
    """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
hot AS (
  SELECT tok FROM toks WHERE tok <> ''
  GROUP BY tok ORDER BY COUNT(*) DESC, tok LIMIT 1
),
base AS (
  SELECT * FROM documents ORDER BY doc_id LIMIT 20
),
needles AS (
  SELECT b.doc_id + 10000000 AS doc_id,
         h.tok || ' zzqneedle x'
           || CAST(b.doc_id + 10000000 AS VARCHAR) AS text,
         b.lang, b.source
  FROM base b, hot h
)
SELECT doc_id, text, lang, source,
       CAST(length(text) AS BIGINT) AS n_chars
FROM needles
""",
)(corpus_text_index_hot_token)
