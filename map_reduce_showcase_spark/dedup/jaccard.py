"""Exact n-gram Jaccard near-dup pairs via an inverted shingle index.

The scalable exact algorithm (and the verification stage behind
MinHash): explode each document into its distinct word-n-gram
shingles, self-join the inverted index on the shingle, count shared
shingles per pair, then Jaccard = |∩| / (|A|+|B|−|∩|).

Scale: the self-join shuffles on the shingle — high-frequency
shingles (boilerplate) are the skew risk; drop shingles with
document-frequency above a cap first (standard practice — a shingle
shared by millions of docs carries no dedup signal but creates a
quadratic bucket). ``max_shingle_df`` implements that cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens


def shingle_rows(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shingle) inverted-index rows, distinct per doc.

    Two-stage plan: tokenize below an exchange, shingle above it.
    The exchange (a) rebalances small low-partition inputs across
    all cores — a single parquet file otherwise pins the expensive
    higher-order shingle expressions to one task — and (b) stops
    CollapseProject from inlining the tokenize regex into every one
    of the shingle expression's references to the token array."""
    from ..functions.util import rebalance

    # rebalance the raw text FIRST so tokenize itself runs on all
    # cores (tokenizing below the exchange would serialize it into
    # the source's partition count)
    docs = rebalance(docs)
    toks_df = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks")
    )
    tk = F.col("_toks")
    if n == 2:
        # bigram fast path: one linear zip of the array with its own
        # tail (the indexed transform+slice form is O(n) per gram).
        # zip_with pads the shorter side with null and concat
        # propagates it, so the trailing (and single-token) null
        # grams filter out — no size guard needed. ONE parsed
        # expression (the lambda form costs ~20 ms/lambda of py4j
        # round trips per plan build — r18 build profile).
        shingles = F.expr(
            "filter(zip_with(_toks, "
            "slice(_toks, 2, greatest(size(_toks) - 1, 0)), "
            "(a, b) -> concat(a, ' ', b)), g -> g IS NOT NULL)"
        )
    else:
        idx = F.sequence(F.lit(0), F.size(tk) - n)
        grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i + 1, n)))
        shingles = F.when(F.size(tk) >= n, grams).otherwise(
            F.expr("CAST(array() AS ARRAY<STRING>)")
        )
    return toks_df.select(
        "doc_id", F.explode(F.array_distinct(shingles)).alias("shingle")
    )


def cap_shingle_df(sh: DataFrame, max_shingle_df: int | None) -> DataFrame:
    """Drop shingles whose corpus document frequency exceeds the cap
    (boilerplate defense — a shingle shared by millions of docs
    carries no dedup signal but creates a quadratic join bucket).
    None = no cap."""
    if max_shingle_df is None:
        return sh
    w = Window.partitionBy("shingle")
    return (
        sh.withColumn("_df", F.count(F.lit(1)).over(w))
        .filter(F.col("_df") <= max_shingle_df)
        .drop("_df")
    )


def jaccard_filter(
    inter: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """Shared verify tail: (d1, d2, inter) + per-doc shingle sizes →
    pairs with Jaccard ≥ threshold, rounded to 6. Used by both the
    exhaustive pair scan and the LSH candidate-verify stage so their
    semantics can never drift apart."""
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("sz2"))
    jac = F.col("inter") * F.lit(1.0) / (F.col("sz1") + F.col("sz2") - F.col("inter"))
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .filter(jac >= threshold)
        .select("d1", "d2", F.round(jac, 6).alias("jaccard"))
    )


def shingle_sizes(sh: DataFrame) -> DataFrame:
    return sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 2,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All pairs with n-gram Jaccard ≥ threshold:
    ``(d1, d2, jaccard)``, d1 < d2, jaccard rounded to 6 places."""
    sh = cap_shingle_df(shingle_rows(docs, n, text_col, id_col), max_shingle_df)
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return jaccard_filter(inter, shingle_sizes(sh), threshold)


def containment_pairs(
    docs: DataFrame,
    n: int = 2,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: int | None = None,
    hash_shingles: bool = True,
) -> DataFrame:
    """Pairs with asymmetric shingle CONTAINMENT ≥ threshold in
    either direction: ``(d1, d2, c1, c2)`` where c1 = |∩|/|A| (the
    fraction of d1 inside d2) and c2 = |∩|/|B|.

    Containment is the dedup relation Jaccard cannot express: a
    100-shingle doc quoted whole inside a 10,000-shingle doc has
    containment 1.0 but Jaccard ≈ 0.01 — every threshold that keeps
    it also keeps noise. Quote/excerpt detection (Broder's original
    distinction) therefore tests max(c1, c2), and the same inverted
    shingle index serves both measures — only the normalizer of the
    verify arithmetic changes.

    ``max_shingle_df`` applies the same boilerplate-shingle DF cap as
    :func:`ngram_jaccard_pairs`, BEFORE both the intersection join
    and the per-doc sizes (so both containment normalizers see the
    capped index consistently).

    ``hash_shingles`` (default on) replaces each shingle string with
    its portable 60-bit hash BEFORE the DF window and the self-join,
    so both of this operator's shuffles — and the window's sort —
    move and compare 8-byte longs instead of n-word strings (the
    same carry-hashes-never-text rule the minhash, substring-run and
    passage operators already follow; the hash is the md5-based
    portable one so a DuckDB oracle replays identical arithmetic,
    collisions included). String shuffle volume was the dominant
    data-dependent term in the 16x scale sweep (tail ratio 3.27,
    the highest non-control value in round 4)."""
    sh = shingle_rows(docs, n, text_col, id_col)
    if hash_shingles:
        from ..functions.text import portable_hash60

        sh = sh.select("doc_id", portable_hash60(F.col("shingle")).alias("shingle"))
    sh = cap_shingle_df(sh, max_shingle_df)
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = shingle_sizes(sh)
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("sz2"))
    c1 = F.col("inter") * F.lit(1.0) / F.col("sz1")
    c2 = F.col("inter") * F.lit(1.0) / F.col("sz2")
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .filter(F.greatest(c1, c2) >= threshold)
        .select(
            "d1", "d2", F.round(c1, 6).alias("c1"), F.round(c2, 6).alias("c2")
        )
    )
