"""Streaming sinks with exactly-once-effective semantics.

Structured Streaming guarantees at-least-once delivery to
``foreachBatch``: after a crash between sink write and checkpoint
commit, the same ``batch_id`` is REPLAYED.  A sink that blindly
appends therefore duplicates data.  The standard fix (documented in
the Spark docs' foreachBatch section) is to make the write a
deterministic function of ``batch_id`` — here: every micro-batch owns
a ``_batch_id=N`` partition, written with *dynamic* partition
overwrite, so a replay replaces its own partition byte-for-byte
instead of appending next to the first attempt.

At 100 TB stream rates this is also the right physical layout: each
micro-batch commit touches only its own directory (no global
listing), and downstream batch readers prune on ``_batch_id`` ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def idempotent_parquet_sink(out_dir: str):
    """A ``foreachBatch`` function writing each micro-batch to its own
    ``_batch_id`` partition with dynamic overwrite — replaying a batch
    (at-least-once delivery) replaces its partition instead of
    duplicating rows.

    Usage::

        stream.writeStream.foreachBatch(idempotent_parquet_sink(out))
              .option("checkpointLocation", ckpt).start()
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    return write
