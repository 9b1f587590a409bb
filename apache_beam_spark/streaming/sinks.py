"""Streaming sinks.

Reference: ``WriteFiles`` windowed/sharded file writes
(``io/WriteFiles.java:108``, finalize-rename ``:639``) — replaced
wholesale by Spark's streaming file sink + checkpoint commit protocol
(exactly-once without the temp-file rename dance).  ``foreachBatch``
covers every "custom sink" the reference expressed as a terminal ParDo.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_parquet_stream(sdf: DataFrame, path: str, checkpoint: str,
                         output_mode: str = "append",
                         partition_by: Optional[list[str]] = None,
                         trigger_seconds: Optional[int] = None) -> StreamingQuery:
    """Windowed file writes (reference WriteFiles windowed writes :336);
    dynamic destinations -> partitionBy."""
    w = (sdf.writeStream.format("parquet").option("path", path)
         .option("checkpointLocation", checkpoint).outputMode(output_mode))
    if partition_by:
        w = w.partitionBy(*partition_by)
    if trigger_seconds is not None:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()


def foreach_batch(sdf: DataFrame, fn: Callable[[DataFrame, int], None],
                  checkpoint: str, output_mode: str = "update") -> StreamingQuery:
    """Arbitrary per-micro-batch sink (jdbc upserts, console, metrics) —
    the reference's terminal DoFn writes.  ``fn(batch_df, batch_id)``."""
    return (sdf.writeStream.foreachBatch(fn)
            .option("checkpointLocation", checkpoint)
            .outputMode(output_mode).start())


def idempotent_foreach_batch(sdf: DataFrame, fn: Callable[[DataFrame, int], None],
                             checkpoint: str, commit_dir: str,
                             output_mode: str = "update") -> StreamingQuery:
    """Dedupe re-delivered micro-batches: ``foreachBatch`` is
    at-least-once on retry (a batch can be re-delivered after a failure
    before its checkpoint commit); the sink records each committed
    ``batch_id`` as a marker file and skips re-deliveries — the
    idempotent-write half of the reference's finalize-rename protocol
    (WriteFiles.java:639), with Spark's checkpoint as the other half.

    NOT exactly-once by itself: the marker is written after ``fn``
    non-atomically, so a crash between ``fn`` and the marker (or a
    partially-failed ``fn``) re-applies the batch on retry.  For true
    exactly-once ``fn`` must itself be idempotent or transactional
    (e.g. upsert keyed on batch_id); the markers only eliminate
    post-commit re-deliveries.  ``commit_dir`` must live on durable
    shared storage (not driver-local disk) to survive driver failover."""
    import os

    os.makedirs(commit_dir, exist_ok=True)

    def wrapped(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(commit_dir, f"committed-{batch_id}")
        if os.path.exists(marker):
            return  # re-delivered batch: already applied
        fn(batch_df, batch_id)
        open(marker, "w").close()

    return (sdf.writeStream.foreachBatch(wrapped)
            .option("checkpointLocation", checkpoint)
            .outputMode(output_mode).start())


def write_console(sdf: DataFrame, output_mode: str = "append",
                  num_rows: int = 20) -> StreamingQuery:
    """ConsoleIO (reference runners/spark/.../io/ConsoleIO.java)."""
    return (sdf.writeStream.format("console")
            .option("numRows", num_rows).outputMode(output_mode).start())


def write_kafka(sdf, bootstrap_servers: str, topic: str, checkpoint: str,
                output_mode: str = "append"):
    """KafkaIO write (reference io/kafka/.../KafkaIO.java write path):
    the stream must carry ``value`` (binary/string; optional ``key``).
    Gated on the spark-sql-kafka package."""
    try:
        return (sdf.writeStream.format("kafka")
                .option("kafka.bootstrap.servers", bootstrap_servers)
                .option("topic", topic)
                .option("checkpointLocation", checkpoint)
                .outputMode(output_mode).start())
    except Exception as e:  # pragma: no cover - package not in container
        raise NotImplementedError(
            "kafka requires org.apache.spark:spark-sql-kafka on the classpath"
        ) from e
