"""Text analysis (SURVEY.md §2.13 X4): token statistics, language-ID
heuristic, quality scoring, token counting, document fingerprinting —
the LLM-training-data operators, all built-in-function pipelines
(split/explode/regexp/md5), no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import prep, table
from ..registry import query


@query(
    "text_token_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    filtered AS (SELECT doc_id, t FROM toks WHERE t <> '')
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT t) AS n_distinct,
           CAST(SUM(length(t)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_token_len,
           CAST(COUNT(DISTINCT t) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS type_token_ratio
    FROM filtered GROUP BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: per-document token statistics (count, vocabulary, TTR)."""
    prep(spark)
    toks = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") != "")
    )
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("t").alias("n_distinct"),
        (F.sum(F.length("t")).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_token_len"
        ),
        (F.countDistinct("t").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "type_token_ratio"
        ),
    )


@query(
    "text_lang_id",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    scores AS (
      SELECT doc_id,
             COUNT(CASE WHEN t IN ('the', 'a', 'of') THEN 1 END) AS s_article,
             COUNT(CASE WHEN t IN ('data', 'table', 'row', 'column') THEN 1 END) AS s_data,
             COUNT(CASE WHEN t IN ('query', 'scan', 'join', 'filter') THEN 1 END) AS s_query
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id,
           CASE WHEN s_article >= s_data AND s_article >= s_query THEN 'article-heavy'
                WHEN s_data >= s_query THEN 'data-heavy'
                ELSE 'query-heavy' END AS pred_class,
           s_article, s_data, s_query
    FROM scores
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: n-gram/marker-token language-ID heuristic.

    Scores each document against marker-token sets and picks the argmax
    with a deterministic tie order — the standard stopword-profile
    language detector. (The fixture corpus shares one vocabulary across
    its `lang` labels, so classes here are register profiles; on real
    multilingual data the marker sets are per-language stopword lists.)
    """
    prep(spark)
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    )
    scores = toks.groupBy("doc_id").agg(
        F.count(F.when(F.col("t").isin("the", "a", "of"), 1)).alias("s_article"),
        F.count(F.when(F.col("t").isin("data", "table", "row", "column"), 1)).alias("s_data"),
        F.count(F.when(F.col("t").isin("query", "scan", "join", "filter"), 1)).alias("s_query"),
    )
    pred = (
        F.when(
            (F.col("s_article") >= F.col("s_data")) & (F.col("s_article") >= F.col("s_query")),
            "article-heavy",
        )
        .when(F.col("s_data") >= F.col("s_query"), "data-heavy")
        .otherwise("query-heavy")
    )
    return scores.select("doc_id", pred.alias("pred_class"), "s_article", "s_data", "s_query")


@query(
    "text_quality_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    stats AS (
      SELECT doc_id,
             COUNT(*) AS n_tokens,
             COUNT(DISTINCT t) AS n_distinct,
             COUNT(CASE WHEN t IN ('the', 'a', 'of') THEN 1 END) AS n_stop
      FROM toks WHERE t <> '' GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(s.n_distinct AS DOUBLE) / CAST(s.n_tokens AS DOUBLE) * 0.5
             + (1.0 - CAST(s.n_stop AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)) * 0.3
             + LEAST(CAST(d.n_chars AS DOUBLE) / 500.0, 1.0) * 0.2 AS quality
    FROM documents d JOIN stats s ON s.doc_id = d.doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: composite quality score — lexical diversity + stopword ratio +
    length saturation (the usual pre-training heuristic filter trio).
    Pure double arithmetic on integer counts: deterministic cross-engine.
    """
    prep(spark)
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t")).where(
        F.col("t") != ""
    )
    stats = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("t").alias("n_distinct"),
        F.count(F.when(F.col("t").isin("the", "a", "of"), 1)).alias("n_stop"),
    )
    quality = (
        F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double") * 0.5
        + (F.lit(1.0) - F.col("n_stop").cast("double") / F.col("n_tokens").cast("double"))
        * 0.3
        + F.least(F.col("n_chars").cast("double") / 500.0, F.lit(1.0)) * 0.2
    )
    return docs.select("doc_id", "n_chars").join(stats, "doc_id").select(
        "doc_id", quality.alias("quality")
    )


@query(
    "token_count",
    oracle="""
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_word_tokens
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: BPE-ish regex token counting (word/number pieces)."""
    prep(spark)
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit("[a-z]+|[0-9]+")).cast("long").alias(
            "n_word_tokens"
        ),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id, md5(lower(text)) AS fingerprint FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: normalized content fingerprint (md5 over lowercased text) —
    the join key for exact dedup across shards; md5 agrees across engines
    so it is oracle-checkable, unlike xxhash64."""
    prep(spark)
    return table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.lower(F.col("text")).cast("binary")).alias("fingerprint")
    )


@query(
    "text_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t AS term FROM (
        SELECT doc_id,
               UNNEST(string_split_regex(LOWER(text), '[^a-z]+')) AS t
        FROM documents
      ) WHERE t <> ''
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf, df, score FROM (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df), 6) DESC,
                        tf.term) AS rn
      FROM tf JOIN df USING (term) CROSS JOIN n
    ) WHERE rn <= 3
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: TF-IDF top-3 terms per document.

    tf and df are exact integers from two hash aggregations; only the
    final score touches floats, and it is rounded to 6 decimals on both
    engines before ranking so the cross-engine order (and the value
    hash) is deterministic. At 100 TB: both aggs are partial+final
    combines on (doc, term) / (term); the scalar N literal-folds into
    the plan, and the (term, df) join is left unhinted — a web-scale
    raw-token vocabulary (typos, numbers) runs to billions of rows and
    is NOT broadcastable, so AQE decides at runtime from the exchange's
    measured size (it broadcasts here at test scale; past the threshold
    it stays a co-partitioned shuffle join on `term`).
    """
    prep(spark)
    docs = table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
        )
        .where(F.col("term") != "")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()  # scalar; literal-folded into the plan
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("score"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


@query(
    "text_clean",
    oracle="""
    SELECT doc_id,
           TRIM(REGEXP_REPLACE(
             REGEXP_REPLACE(
               REGEXP_REPLACE(text, 'https?://[^ ]+', '<URL>', 'g'),
               '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
             ' +', ' ', 'g')) AS cleaned,
           LENGTH(text) - LENGTH(TRIM(REGEXP_REPLACE(
             REGEXP_REPLACE(
               REGEXP_REPLACE(text, 'https?://[^ ]+', '<URL>', 'g'),
               '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
             ' +', ' ', 'g'))) AS removed_chars
    FROM documents
    """,
)
def text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: corpus cleaning — URL and e-mail scrubbing to placeholder
    tokens plus whitespace normalization, the standard pre-tokenization
    pass of a training-data pipeline. Pure JVM regexp_replace chain (one
    codegen'd projection, no shuffle); the regex subset is chosen to
    mean the same thing in Java regex and RE2 so the oracle matches
    byte-for-byte."""
    prep(spark)
    docs = table(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), r"https?://[^ ]+", "<URL>"),
                r"[A-Za-z0-9.]+@[A-Za-z0-9.]+",
                "<EMAIL>",
            ),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        cleaned.alias("cleaned"),
        (F.length("text") - F.length(cleaned)).alias("removed_chars"),
    )


@query(
    "text_ngram_freq",
    oracle="""
    WITH toks AS (
      SELECT lang,
             list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS ts
      FROM documents
    ),
    bi AS (
      SELECT lang, ts[CAST(t.i AS BIGINT)] || ' ' || ts[CAST(t.i AS BIGINT) + 1] AS bigram
      FROM toks, UNNEST(range(1, len(ts))) AS t(i)
    ),
    cnt AS (SELECT lang, bigram, COUNT(*) AS n FROM bi GROUP BY 1, 2)
    SELECT lang, bigram, CAST(n AS BIGINT) AS n
    FROM (
      SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rn
      FROM cnt
    ) WHERE rn <= 10
    """,
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: per-language top-10 bigram frequencies — the n-gram LM
    statistic under contamination sniffing and boilerplate discovery.

    Bigrams are built INSIDE the token array with a vectorized
    transform-over-slice (toks[i] + ' ' + toks[i+1]) — no window, no
    self-join; the only explode is the bigram stream feeding one
    (lang, bigram) count whose partial aggregation happens map-side.
    The top-10 cut compiles to WindowGroupLimit, so each language ships
    at most 10 candidate rows per partition past the final exchange.
    Ties at the cut break by bigram text — deterministic on both
    engines.
    """
    prep(spark)
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != F.lit("")
    )
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.slice(toks, 1, F.size(toks) - 1),
            lambda x, i: F.concat_ws(" ", x, F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array(F.lit(None).cast("string")))
    cnt = (
        table(spark, sf_dir, "documents")
        .select("lang", F.explode(bigrams).alias("bigram"))
        .where(F.col("bigram").isNotNull())
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("lang", "bigram", F.col("n").cast("long").alias("n"))
    )


@query(
    "vocab_coverage",
    oracle="""
    WITH toks AS (
      SELECT t AS term FROM (
        SELECT UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t
        FROM documents
      ) WHERE t <> ''
    ),
    cnt AS (SELECT term, COUNT(*) AS n FROM toks GROUP BY term),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt),
    top AS (SELECT term, n FROM cnt ORDER BY n DESC, term LIMIT 100)
    SELECT CAST(row_number() OVER (ORDER BY n DESC, term) AS BIGINT) AS rnk,
           term,
           CAST(n AS BIGINT) AS n,
           ROUND(CAST(SUM(n) OVER (ORDER BY n DESC, term
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / (SELECT total FROM tot), 6) AS cum_coverage
    FROM top
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: vocabulary coverage curve — the top-100 tokens with the
    cumulative fraction of the corpus they cover, the statistic behind
    tokenizer-vocab sizing ("how many types cover 95% of tokens?").

    Term counts aggregate map-side; the top-100 cut is orderBy+limit →
    TakeOrderedAndProject (per-partition top-k, no global sort of the
    vocabulary); the cumulative window and rank run over the 100
    surviving rows only. The corpus-total token count rides in as a
    broadcast 1-row cross join, never a collect. Integer counts divide
    once into a double, ROUND(6) on both engines.
    """
    prep(spark)
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z]+"),
                    lambda x: x != F.lit(""),
                )
            ).alias("term")
        )
    )
    cnt = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    total = cnt.agg(F.sum("n").alias("total"))
    top = cnt.orderBy(F.col("n").desc(), "term").limit(100)
    w = W.orderBy(F.col("n").desc(), "term")
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("long").alias("rnk"),
            "term",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.sum("n")
                .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
                .cast("double")
                / F.col("total"),
                6,
            ).alias("cum_coverage"),
        )
    )
