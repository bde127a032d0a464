"""Streaming chain ingestion (SURVEY.md §3.2): the reference's
synchronizeDatabase loop (B:116–167) as Structured Streaming +
foreachBatch MERGE.

Pipeline: decoded block rows arrive as files (the S2 tail-file pickup);
each micro-batch is normalized to the four tables and folded into the
accumulated state with `maintain.resume` — which detects divergence and
rolls back reorged heights before appending (M5+M6). Every batch's
result is materialized (localCheckpoint) because batch DataFrames are
only valid inside their micro-batch.

At scale the state lives in a Delta/Iceberg-style table and `resume`
becomes a MERGE + replaceWhere partition overwrite of `height >= fork`;
the control flow here is exactly that, minus the table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..chain import schema
from ..chain.maintain import Tables, resume
from ..sources.blockfile import DECODED_SCHEMA, normalize


def empty_tables(spark: SparkSession) -> Tables:
    return {
        "blocks": spark.createDataFrame([], schema.BLOCKS),
        "transactions": spark.createDataFrame([], schema.TRANSACTIONS),
        "outputs": spark.createDataFrame([], schema.OUTPUTS),
        "inputs": spark.createDataFrame([], schema.INPUTS),
    }


def ingest_stream(
    spark: SparkSession,
    blocks_dir: str,
    state: Tables | None = None,
    max_files_per_trigger: int = 1,
) -> Tables:
    """Consume a directory of decoded-block parquet files as a stream;
    return the final accumulated tables. Reorgs inside the stream are
    resolved batch-by-batch via resume()."""
    holder = {"tables": state or empty_tables(spark)}

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        incoming = normalize(batch_df)
        merged = resume(holder["tables"], incoming)
        holder["tables"] = {
            name: df.localCheckpoint(eager=True) for name, df in merged.items()
        }

    s = (
        spark.readStream.schema(DECODED_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(blocks_dir)
    )
    q = s.writeStream.foreachBatch(apply).trigger(availableNow=True).start()
    q.awaitTermination()
    return holder["tables"]
