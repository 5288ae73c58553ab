"""Text-analysis column expressions — all native Catalyst expressions.

Everything here is a ``Column``-in → ``Column``-out builder using only
built-in ``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd);
no Python UDFs in any hot path. The reference's text surface was
lowercase + split (``src/app/wc.rs:13-18``); this module adds what a
training-data pipeline needs: token stats, quality signals, language
ID, shingles, fingerprints, and a portable 60-bit hash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tokens = maximal runs of letters/digits (BPE-ish pre-tokenization
#: boundary); keep in sync with the DuckDB oracle regexes.
TOKEN_SPLIT = r"[^\p{L}\p{N}]+"

#: Tiny per-language marker lexicons for the n-gram/stopword
#: language-ID heuristic. Deterministic and SQL-portable.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "des", "une"),
    "de": ("der", "die", "und", "das", "ein"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens_sql(text: str) -> str:
    """:func:`tokens` as SQL text over a column-name fragment — ONE
    parsed expression instead of a py4j-built lambda tree (~20 ms of
    driver round trips per build; r18 build profile). The regex
    backslashes are doubled because the SQL parser unescapes string
    literals, where the Column API passes the pattern through
    verbatim."""
    pattern = TOKEN_SPLIT.replace("\\", "\\\\")
    return f"filter(split(lower({text}), '{pattern}'), t -> length(t) > 0)"


def tokens(text: Column | str) -> Column:
    """Lowercase letter/digit tokens, empties dropped. Accepts a
    Column, or SQL text (a column name) for the one-parse path."""
    if isinstance(text, str):
        return F.expr(tokens_sql(text))
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT), lambda t: F.length(t) > 0)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def _punct_ratio_sql(text: str) -> str:
    pattern = r"[\p{L}\p{N}\s]".replace("\\", "\\\\")
    return (
        f"(CAST(length(regexp_replace({text}, '{pattern}', '')) AS DOUBLE)"
        f" / CAST(greatest(length({text}), 1) AS DOUBLE))"
    )


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not letter/digit/whitespace —
    a classic boilerplate/garbage signal. SQL-text inputs take the
    one-parse path (r18 build profile: lambda construction costs
    ~20 ms of py4j round trips each)."""
    if isinstance(text, str):
        return F.expr(_punct_ratio_sql(text))
    stripped = F.regexp_replace(text, r"[\p{L}\p{N}\s]", "")
    return F.length(stripped).cast("double") / F.greatest(F.length(text), F.lit(1)).cast(
        "double"
    )


def _stopword_ratio_sql(text: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS)
    tk = tokens_sql(text)
    return (
        f"(CAST(size(filter({tk}, t -> t IN ({words}))) AS DOUBLE)"
        f" / CAST(greatest(size({tk}), 1) AS DOUBLE))"
    )


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are stopwords — low values flag
    keyword-stuffed or non-linguistic text."""
    if isinstance(text, str):
        return F.expr(_stopword_ratio_sql(text))
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword
    presence − punctuation noise. A stand-in for model-based quality
    classifiers; the *shape* (pure column expr, no UDF) is the point:
    it runs at scan speed over 100 TB."""
    if isinstance(text, str):
        return F.expr(
            f"round(greatest(least("
            f"(0.5D * least(CAST(size({tokens_sql(text)}) AS DOUBLE) / 64.0D, 1.0D))"
            f" + (0.5D * {_stopword_ratio_sql(text)})"
            f" - {_punct_ratio_sql(text)}, 1.0D), 0.0D), 6)"
        )
    n = token_count(text).cast("double")
    length_component = F.least(n / F.lit(64.0), F.lit(1.0))
    return F.round(
        F.greatest(
            F.least(
                F.lit(0.5) * length_component
                + F.lit(0.5) * stopword_ratio(text)
                - punct_ratio(text),
                F.lit(1.0),
            ),
            F.lit(0.0),
        ),
        6,
    )


#: CASE-chain precedence for language-ID ties (first wins).
LANG_PRECEDENCE: tuple[str, ...] = ("en", "de", "es", "fr")


def lang_marker_score(text: Column, lang: str) -> Column:
    """Count of marker-lexicon token hits for one language."""
    return F.size(
        F.filter(tokens(text), lambda t: t.isin(*LANG_MARKERS[lang]))
    )


def language_id(text: Column) -> Column:
    """Marker-lexicon language ID: count marker-token hits per
    language; the argmax is an explicit CASE chain in
    :data:`LANG_PRECEDENCE` order (ties → earlier language), no hits
    → 'und'. The identical CASE chain is replayed by the DuckDB
    oracle. Pure expression → scan-speed at 100 TB; swap in a real
    n-gram model via pandas_udf if needed."""
    scores = {lang: lang_marker_score(text, lang) for lang in LANG_PRECEDENCE}
    expr = F.lit("und")
    for lang in reversed(LANG_PRECEDENCE):
        others = [scores[o] for o in LANG_PRECEDENCE if o != lang]
        cond = (scores[lang] > 0) & (
            scores[lang] >= F.greatest(*others) if len(others) > 1 else scores[lang] >= others[0]
        )
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def top_token_count(toks: Column) -> Column:
    """Multiplicity of the most frequent element of ``toks`` (NULL on
    an empty array, matching ``array_max``'s convention and DuckDB's
    ``list_max``).

    Sorted-run-max: sort the array, then one linear fold tracking the
    current run length and the best run — O(n log n) per document,
    replacing the naive distinct × filter scan whose O(v·n) goes
    quadratic exactly on the degenerate-repetition docs this signal
    exists to catch (a 10k-token doc with 5k distinct tokens costs
    50M comparisons naive, ~140k sorted)."""
    folded = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc.prev.isNotNull() & (acc.prev == x), acc.run + F.lit(1))
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc.best,
                F.when(acc.prev.isNotNull() & (acc.prev == x), acc.run + F.lit(1))
                .otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    return F.when(F.size(toks) > 0, folded)


def ngrams(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams; empty when < n tokens."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.expr("CAST(array() AS ARRAY<STRING>)")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles — the MinHash/Jaccard unit."""
    return F.array_distinct(ngrams(text, n))


def portable_hash60(s: Column) -> Column:
    """Deterministic 60-bit hash portable across Spark and DuckDB:
    first 15 hex chars of md5 as a BIGINT.

    Spark:  ``cast(conv(substr(md5(s),1,15),16,10) as bigint)``
    DuckDB: ``cast('0x' || substr(md5(s),1,15) as bigint)``

    Used by MinHash/SimHash so the DuckDB oracle can replay the
    exact signatures. (Spark's native ``xxhash64`` is faster but not
    reproducible in the oracle; swap it in for production.)"""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def portable_hash60_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`portable_hash60`."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text — the exact-dedup key that survives formatting noise."""
    normalized = F.concat_ws(" ", tokens(text))
    return F.md5(normalized)
