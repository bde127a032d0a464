"""IVF-style approximate nearest neighbor (SURVEY.md §2.13 X3 scale
path, complementing the LSH variant in similarity.py).

Coarse quantizer: a deterministic centroid table (every Nth vector by
id — at 100 TB this is the k-means output, refreshed offline). Index =
each vector assigned to its nearest centroid (one broadcast join).
Query = score only the vectors in the nprobe closest cells — the
N×M cross product becomes (queries × centroids) + (queries × their
cells), an equi-join on cell id.

Rows-only check (approximate recall by design); exactness of the kernel
itself is covered by similarity_topk's oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import prep, table
from ..functions.vectors import float_cosine
from ..registry import query

_N_CENTROIDS = 16
_N_PROBE = 4


def _centroids(emb: DataFrame) -> DataFrame:
    """Deterministic coarse quantizer: every k-th vector is a centroid
    (stand-in for offline k-means; the query plan is identical)."""
    return (
        emb.where(F.col("vec_id") % (500 // _N_CENTROIDS) == 0)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid"))
        .limit(_N_CENTROIDS)
    )


def _assign(emb: DataFrame, cents: DataFrame, n: int, out: str) -> DataFrame:
    """Top-n nearest centroids per vector via broadcast join + window."""
    scored = emb.join(F.broadcast(cents)).withColumn(
        "sim", float_cosine(F.col("embedding"), F.col("centroid"))
    )
    w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
        .select("vec_id", "embedding", F.col("cell").alias(out))
    )


@query("similarity_ivf")  # rows-only: approximate by design
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 IVF: inverted-file ANN — assign to cells, probe nprobe cells,
    exact rerank within probed cells, top-3 per query (vec_id < 5)."""
    prep(spark)
    emb = table(spark, sf_dir, "embeddings")
    cents = _centroids(emb)

    index = _assign(emb, cents, 1, "cell")  # each vector in its 1 nearest cell
    queries = _assign(emb.where(F.col("vec_id") < 5), cents, _N_PROBE, "probe_cell")

    cand = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("probe_cell").alias("cell"),
    ).join(
        index.select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("ce"),
            "cell",
        ),
        "cell",
    ).where(F.col("cand_id") != F.col("query_id"))

    scored = cand.select(
        "query_id",
        "cand_id",
        float_cosine(F.col("qe"), F.col("ce")).alias("cosine"),
    ).dropDuplicates(["query_id", "cand_id"])
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3).drop("rn")
