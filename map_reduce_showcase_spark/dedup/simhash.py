"""SimHash fingerprinting + banded near-pair search.

Charikar SimHash over the document's distinct-token set: each token
hashes to ``SIMHASH_BITS`` bits (portable 60-bit md5 hash so the
DuckDB oracle can replay it); bit j of the fingerprint is 1 iff more
tokens set bit j than clear it (strict majority — ties → 0).

Near-pair search uses the pigeonhole banding trick, NOT a cross
join: split the fingerprint into ``n_bands`` chunks; any pair with
Hamming distance ≤ n_bands−1 must agree exactly on ≥1 chunk, so an
equi-join on (band, chunk_value) finds all candidates, then the
exact ``bit_count(xor)`` filter keeps real ones. At 100 TB the
cross join is impossible; the band join is linear-ish in docs per
bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash60, tokens

#: 32 bits: at 16 bits, same-domain corpora (shared vocabulary)
#: collapse — nearly all pairs land within Hamming 3; 32 bits keeps
#: only genuine near-duplicates there.
SIMHASH_BITS = 32


def simhash_docs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash) with a ``SIMHASH_BITS``-bit fingerprint."""
    from ..functions.util import rebalance

    tok = rebalance(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("word"),
    )
    # project the md5-based hash ONCE below the aggregate — the bit
    # expressions reference it 32 times, and referencing the raw
    # expression would evaluate 32 md5s per token
    hashed = tok.select("doc_id", portable_hash60(F.col("word")).alias("hv"))
    # one parsed SQL string per aggregate (and ONE for the 32-term
    # bit recombination) instead of ~7 Column-API calls per bit:
    # the plan is identical, but building it costs ~40 py4j round
    # trips instead of ~340 — measured ~1.5 s off every plan build
    # of this operator on a py4j-slow driver
    bit_sums = [
        F.expr(
            f"sum(CASE WHEN (hv >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        )
        for j in range(SIMHASH_BITS)
    ]
    agg = hashed.groupBy("doc_id").agg(*bit_sums)
    sim_sql = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return agg.select("doc_id", F.expr(f"CAST({sim_sql} AS BIGINT) AS simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(d1, d2, hamming) pairs with Hamming(simhash) ≤ max_hamming.

    Requires ``max_hamming <= n_bands - 1`` for the pigeonhole
    guarantee (results then equal the exhaustive cross join)."""
    if max_hamming > n_bands - 1:
        raise ValueError("pigeonhole guarantee needs max_hamming <= n_bands - 1")
    band_bits = SIMHASH_BITS // n_bands
    mask = (1 << band_bits) - 1
    sh = simhash_docs(docs, text_col, id_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("chunk"),
            )
            for b in range(n_bands)
        ]
    )
    bands = sh.select("doc_id", "simhash", F.explode(chunks).alias("bk")).select(
        "doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.chunk").alias("chunk")
    )
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    # "emit from first colliding band": both fingerprints are present
    # in the joined row, so whether any EARLIER band also matched is
    # a per-row bit computation — each qualifying pair is emitted
    # exactly once and the distinct() (a full shuffle of the raw
    # candidate stream) disappears.
    first_band = F.expr(
        f"a.band = 0 OR NOT exists("
        f"  sequence(0, a.band - 1),"
        f"  j -> (shiftright(a.simhash, j * {band_bits}) & {mask})"
        f"     = (shiftright(b.simhash, j * {band_bits}) & {mask}))"
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= max_hamming)
        .filter(first_band)
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            ham.cast("int").alias("hamming"),
        )
    )
