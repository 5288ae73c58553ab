"""The r17 (pre-r18) graph_triangle_summary builder, verbatim K=1
closing shape, for interleaved A/B against the r18 explode+SHJ
restructure."""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_showcase_spark.plans.queries_graph import (
    TRI_CHUNK_CAP,
    _oriented_graph,
)


def triangle_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunk_cap = TRI_CHUNK_CAP
    deg, oriented = _oriented_graph(spark, sf_dir)
    max_deg = deg.agg(F.max("d")).first()[0] or 0
    assert max_deg <= chunk_cap, "A/B variant only replicates the K=1 path"

    adj = oriented.groupBy("u").agg(F.collect_list("v").alias("nbrs"))
    au = adj.alias("au")
    av = adj.alias("av")
    triangles = (
        oriented.alias("o")
        .join(au, F.col("o.u") == F.col("au.u"))
        .join(av, F.col("o.v") == F.col("av.u"))
        .select(
            F.size(
                F.array_intersect(F.col("au.nbrs"), F.col("av.nbrs"))
            ).alias("k")
        )
        .agg(F.coalesce(F.sum("k"), F.lit(0)).cast("bigint").alias("n_triangles"))
    )

    wedges = deg.agg(
        (F.sum("d") / 2).cast("bigint").alias("n_edges"),
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum(F.expr("d * (d - 1) / 2")).cast("bigint").alias("n_wedges"),
    ).select("n_edges", "n_vertices", "n_wedges", F.lit(None).cast("bigint").alias("n_triangles"))

    combined = wedges.unionAll(
        triangles.select(
            F.lit(None).cast("bigint").alias("n_edges"),
            F.lit(None).cast("bigint").alias("n_vertices"),
            F.lit(None).cast("bigint").alias("n_wedges"),
            F.col("n_triangles"),
        )
    )

    return combined.agg(
        F.max("n_edges").alias("n_edges"),
        F.max("n_vertices").alias("n_vertices"),
        F.max("n_wedges").alias("n_wedges"),
        F.max("n_triangles").alias("n_triangles"),
    ).select(
        "n_edges",
        "n_vertices",
        "n_wedges",
        "n_triangles",
        F.round(
            F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
        ).alias("clustering_coeff"),
    )
