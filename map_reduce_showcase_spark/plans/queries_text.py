"""Text-analysis queries over ``documents`` — the training-data-
pipeline text surface (language ID, quality scoring, token stats,
fingerprints). All pure column expressions (functions/text.py); the
DuckDB oracles replay the identical rules so the driver hash-checks
them end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from .registry import register, t

# DuckDB twins of functions/text.py primitives ---------------------------
# tokens: lowercase letter/digit runs; DuckDB regex class mirrors
# TOKEN_SPLIT. list_filter drops empties like F.filter(length>0).
_TOKENS_SQL = (
    "list_filter(string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'), x -> len(x) > 0)"
)


def _in_list_sql(var: str, words: tuple[str, ...]) -> str:
    return "(" + " OR ".join(f"{var} = '{w}'" for w in words) + ")"


_STOP_HITS_SQL = f"len(list_filter({_TOKENS_SQL}, x -> {_in_list_sql('x', T.STOPWORDS)}))"
_NTOK_SQL = f"len({_TOKENS_SQL})"
_PUNCT_SQL = (
    "CAST(len(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g')) AS DOUBLE)"
    " / CAST(greatest(len(text), 1) AS DOUBLE)"
)
_STOPRATIO_SQL = (
    f"CAST({_STOP_HITS_SQL} AS DOUBLE) / CAST(greatest({_NTOK_SQL}, 1) AS DOUBLE)"
)


def _lang_score_sql(lang: str) -> str:
    return (
        f"len(list_filter({_TOKENS_SQL}, x -> {_in_list_sql('x', T.LANG_MARKERS[lang])}))"
    )


def _lang_case_sql() -> str:
    clauses = []
    for lang in T.LANG_PRECEDENCE:
        others = [f"s_{o}" for o in T.LANG_PRECEDENCE if o != lang]
        clauses.append(
            f"WHEN s_{lang} > 0 AND s_{lang} >= greatest({', '.join(others)}) THEN '{lang}'"
        )
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST({_NTOK_SQL} AS INT) AS n_tokens,
           CAST(len(list_distinct({_TOKENS_SQL})) AS INT) AS n_distinct_tokens,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    """,
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts (whitespace/punct tokenizer) —
    the unit-economics column every corpus pipeline needs."""
    toks = T.tokens(F.col("text"))
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )


@register(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           round({_PUNCT_SQL}, 6) AS punct_ratio,
           round({_STOPRATIO_SQL}, 6) AS stopword_ratio,
           round(greatest(least(
             0.5 * least(CAST({_NTOK_SQL} AS DOUBLE) / 64.0, 1.0)
             + 0.5 * ({_STOPRATIO_SQL})
             - ({_PUNCT_SQL}), 1.0), 0.0), 6) AS quality
    FROM documents
    """,
    tags=("text", "quality"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal scoring: punctuation ratio, stopword ratio and
    a combined [0,1] score. Every signal is a scan-speed expression;
    at 100 TB this is a single pass with zero shuffles."""
    txt = F.col("text")
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.round(T.punct_ratio(txt), 6).alias("punct_ratio"),
        F.round(T.stopword_ratio(txt), 6).alias("stopword_ratio"),
        T.quality_score(txt).alias("quality"),
    )


@register(
    "text_language_id",
    oracle=f"""
    SELECT lang AS labeled_lang, pred_lang, COUNT(*) AS n_docs
    FROM (
      SELECT lang, {_lang_case_sql()} AS pred_lang
      FROM (
        SELECT lang,
               {_lang_score_sql('en')} AS s_en,
               {_lang_score_sql('de')} AS s_de,
               {_lang_score_sql('es')} AS s_es,
               {_lang_score_sql('fr')} AS s_fr
        FROM documents
      )
    )
    GROUP BY labeled_lang, pred_lang
    """,
    tags=("text", "langid"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: labeled lang × predicted lang
    (marker-lexicon heuristic). The synthetic corpus is same-script,
    so the heuristic's behavior — not its accuracy — is under test."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.col("lang").alias("labeled_lang"), T.language_id(F.col("text")).alias("pred_lang"))
        .groupBy("labeled_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string({_TOKENS_SQL}, ' ')) AS fingerprint,
           {T.portable_hash60_sql("array_to_string(" + _TOKENS_SQL + ", ' ')")} AS fingerprint60
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-robust document fingerprints: md5 over the
    token-normalized text plus the portable 60-bit variant used by
    the sketch operators. The exact-dedup join key at any scale."""
    normalized = F.concat_ws(" ", T.tokens(F.col("text")))
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(normalized).alias("fingerprint"),
        T.portable_hash60(normalized).alias("fingerprint60"),
    )


@register(
    "text_word_doc_freq",
    oracle=f"""
    SELECT word,
           COUNT(*) AS doc_freq,
           round(ln((1.0 + (SELECT COUNT(*) FROM documents)) / (1.0 + COUNT(*))), 6) AS idf
    FROM (
      SELECT DISTINCT doc_id, unnest({_TOKENS_SQL}) AS word FROM documents
    )
    GROUP BY word
    """,
    tags=("text", "tfidf"),
)
def text_word_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency + smoothed IDF per word — the IDF half of
    TF-IDF as a plain aggregation (the TF half is ``wc_word_count``).
    One explode + distinct + count; partial aggregation bounds the
    shuffle by vocabulary size."""
    docs = t(spark, sf_dir, "documents")
    # corpus size as a broadcast 1-row aggregate, keeping the
    # builder a lazy plan (no job at build time)
    nd = docs.agg(F.count(F.lit(1)).alias("_nd"))
    return (
        docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("word"))
        .distinct()
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .crossJoin(F.broadcast(nd))
        .select(
            "word",
            "doc_freq",
            F.round(
                F.log((F.lit(1.0) + F.col("_nd")) / (F.lit(1.0) + F.col("doc_freq"))),
                6,
            ).alias("idf"),
        )
    )
