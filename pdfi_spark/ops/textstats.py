"""Text analysis operators: language-ID signal, quality scoring, token
counting, document fingerprinting. All built-in-function expressions
(regexp/array/aggregate) — fully codegen'd, no Python in the path."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EN_STOPWORDS = ["the", "a", "of", "and", "in", "to", "is"]
BPE_ISH_RE = "[a-z]{1,4}"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def lang_stopword_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-free language-ID signal: English stopword occurrences vs
    total words (a real classifier thresholds the ratio)."""
    docs = _docs(spark, sf_dir)
    words = F.split("text", " ")
    n_stop = F.size(F.filter(words, lambda w: w.isin(EN_STOPWORDS)))
    return docs.select(
        "doc_id",
        "lang",
        n_stop.alias("n_stopwords"),
        F.size(words).alias("n_words"),
    )


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap quality features: counts, distinct ratio inputs, max word
    length (all integers => engine-exact)."""
    docs = _docs(spark, sf_dir)
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.array_max(F.transform(words, F.length)).alias("max_word_len"),
    )


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish greedy [a-z]{1,4} chunk count."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_RE), 0)).alias("n_bpe_tokens"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-doc md5 plus a winnowing-style fingerprint: min md5 over
    5-word shingles (docs shorter than 5 words fall back to the doc md5)."""
    docs = _docs(spark, sf_dir)
    words = F.split("text", " ")
    shingle_hashes = F.transform(
        F.sequence(F.lit(0), F.size(words) - 5),
        lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, 5))),
    )
    return docs.filter(F.size(words) >= 5).select(
        "doc_id",
        F.md5("text").alias("md5"),
        F.array_min(shingle_hashes).alias("winnow_min"),
    )
