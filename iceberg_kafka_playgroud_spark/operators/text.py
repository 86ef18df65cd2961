"""Text-analysis operators (SURVEY §2.9 X3) over the documents fixture.

Training-data-pipeline primitives: token counting, quality scoring,
language ID (stopword heuristic), document fingerprinting. All pure
built-in expressions — at 100 TB these run scan-local with zero
shuffle (narrow transformations), so they scale linearly with
executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import load_table

# minimal English function-word list for the stopword heuristics
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empty-token removal (robust to
    repeated separators)."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda w: F.lower(w).isin(*STOPWORDS)))


def normalized(text: Column) -> Column:
    """Casefold + whitespace collapse — the canonical form used for
    fingerprinting and exact dedup."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def text_token_count(spark: SparkSession, sf: str) -> DataFrame:
    # tokenize ONCE in its own projection — lambda/expr reuse would
    # re-run split+filter per reference (see dedup.shingle_set note)
    d = load_table(spark, sf, "documents").select(
        "doc_id",
        F.length("text").cast("bigint").alias("len_chars"),
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "len_chars",
        (
            (F.col("len_chars") - F.col("n_tokens") + 1).cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("avg_token_len"),
    )


def text_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic quality features: length, token stats, stopword ratio,
    and a composite score — the usual pre-training filter inputs."""
    base = load_table(spark, sf, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks"),
        (F.length("text") >= 100).cast("int").alias("length_ok"),
    )
    toks = F.col("toks")
    counted = base.select(
        "doc_id",
        "length_ok",
        F.size(toks).cast("double").alias("n_tok"),
        stopword_count(toks).cast("double").alias("n_stop"),
        F.size(F.array_distinct(toks)).cast("double").alias("n_uniq"),
    )
    stop_ratio = F.col("n_stop") / F.col("n_tok")
    uniq_ratio = F.col("n_uniq") / F.col("n_tok")
    ok_d = F.col("length_ok").cast("double")
    return counted.select(
        "doc_id",
        F.col("n_tok").cast("bigint").alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        uniq_ratio.alias("unique_ratio"),
        "length_ok",
        F.round(
            (uniq_ratio * 0.5 + stop_ratio * 0.3) * ok_d + F.lit(0.2) * ok_d, 6
        ).alias("quality_score"),
    )


def text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """n-gram/function-word language heuristic: English function-word
    density → en/other decision plus the raw evidence columns."""
    base = load_table(spark, sf, "documents").select(
        "doc_id", "lang", tokens(F.col("text")).alias("toks")
    )
    counted = base.select(
        "doc_id",
        "lang",
        (
            stopword_count(F.col("toks")).cast("double")
            / F.size("toks").cast("double")
        ).alias("en_stopword_ratio"),
    )
    return counted.select(
        "doc_id",
        "lang",
        "en_stopword_ratio",
        F.when(F.col("en_stopword_ratio") >= 0.05, "en")
        .otherwise("other")
        .alias("lang_pred"),
    )


def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic document fingerprints: md5 over the normalized
    text plus a coarse 16-hex-char prefix bucket (the shard key a
    100 TB dedup would partition on)."""
    d = load_table(spark, sf, "documents")
    norm = normalized(F.col("text"))
    fp = F.md5(norm)
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 4).alias("shard_bucket"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )


def doc_stats_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus rollup per source×lang (coverage/monitoring query)."""
    d = load_table(spark, sf, "documents")
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (
                F.sum("n_chars").cast("double") / F.count("*").cast("double")
            ).alias("avg_chars"),
        )
    )


def text_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-ish tokenization: letter runs, digit runs, and single
    punctuation marks each count as one token (the pre-tokenizer split
    every byte-pair encoder applies before merges). Narrow regexp work
    — scan-local at any scale; contrast with the whitespace count in
    ``text_token_count``."""
    d = load_table(spark, sf, "documents")
    pieces = F.expr(r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")
    toks = d.select("doc_id", pieces.alias("pieces"))
    return toks.select(
        "doc_id",
        F.size("pieces").alias("n_bpe_tokens"),
        F.size(F.expr("filter(pieces, p -> p rlike '^[a-z]+$')")).alias("n_word_runs"),
        F.size(F.expr("filter(pieces, p -> p rlike '^[0-9]+$')")).alias("n_digit_runs"),
    )


QUERIES = {
    "text_token_count": text_token_count,
    "text_bpe_token_count": text_bpe_token_count,
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "doc_stats_by_source": doc_stats_by_source,
}

_TOKS = "list_filter(string_split(text, ' '), x -> x != '')"
_NSTOP = (
    "len(list_filter(" + _TOKS + ", w -> list_contains("
    "['the','a','an','and','of','to','in','is','it','for'], lower(w))))"
)

ORACLES = {
    "text_bpe_token_count": r"""
        WITH p AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')
                   AS pieces
          FROM documents
        )
        SELECT doc_id,
               len(pieces) AS n_bpe_tokens,
               len(list_filter(pieces, x -> regexp_matches(x, '^[a-z]+$')))
                 AS n_word_runs,
               len(list_filter(pieces, x -> regexp_matches(x, '^[0-9]+$')))
                 AS n_digit_runs
        FROM p
    """,
    "text_token_count": f"""
        SELECT doc_id,
               CAST(len({_TOKS}) AS INTEGER) AS n_tokens,
               CAST(length(text) AS BIGINT) AS len_chars,
               CAST(length(text) - len({_TOKS}) + 1 AS DOUBLE)
                 / CAST(len({_TOKS}) AS DOUBLE) AS avg_token_len
        FROM documents
    """,
    "text_quality_score": f"""
        WITH t AS (
          SELECT doc_id, text,
                 CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
                 CAST({_NSTOP} AS DOUBLE) AS n_stop,
                 CAST(len(list_distinct({_TOKS})) AS DOUBLE) AS n_uniq,
                 CASE WHEN length(text) >= 100 THEN 1 ELSE 0 END AS length_ok
          FROM documents)
        SELECT doc_id,
               CAST(n_tok AS BIGINT) AS n_tokens,
               n_stop / n_tok AS stopword_ratio,
               n_uniq / n_tok AS unique_ratio,
               CAST(length_ok AS INTEGER) AS length_ok,
               round((n_uniq / n_tok * 0.5 + n_stop / n_tok * 0.3)
                     * CAST(length_ok AS DOUBLE)
                     + 0.2 * CAST(length_ok AS DOUBLE), 6) AS quality_score
        FROM t
    """,
    "text_lang_id": f"""
        SELECT doc_id, lang,
               CAST({_NSTOP} AS DOUBLE) / CAST(len({_TOKS}) AS DOUBLE)
                 AS en_stopword_ratio,
               CASE WHEN CAST({_NSTOP} AS DOUBLE) / CAST(len({_TOKS}) AS DOUBLE) >= 0.05
                    THEN 'en' ELSE 'other' END AS lang_pred
        FROM documents
    """,
    "text_fingerprint": """
        WITH n AS (SELECT doc_id,
                          trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
                   FROM documents)
        SELECT doc_id, md5(norm) AS fingerprint,
               substring(md5(norm), 1, 4) AS shard_bucket,
               CAST(length(norm) AS BIGINT) AS norm_len
        FROM n
    """,
    "doc_stats_by_source": """
        SELECT source, lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars
        FROM documents GROUP BY source, lang
    """,
}
