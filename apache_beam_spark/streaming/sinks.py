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


def upsert_snapshot_sink(sdf: DataFrame, path: str, checkpoint: str,
                         keys: list, seq_col: str, op_col: str = "op",
                         delete_op: str = "D",
                         tiebreak: str | None = None):
    """Materialize a changelog STREAM into a latest-wins snapshot table
    (the Delta `MERGE` / Flink upsert-sink pattern without an ACID
    format): every micro-batch is folded into the parquet snapshot via
    ``operators/cdc.apply_changes``, written to a fresh directory and
    atomically renamed over the old one — readers see either the old
    or the new snapshot, never a partial write.

    Restart safety: the swap is idempotent per batch content (replaying
    a batch re-derives the same snapshot), the standard
    foreachBatch-exactly-once argument; a crash BETWEEN the two renames
    (``current`` already moved aside, replacement not yet in place) is
    healed on the next merge — the fully-written staged snapshot (or,
    failing that, the moved-aside old one) is restored as ``current``
    before the base is read, so a replayed batch never folds into an
    empty base.  Cross-batch ordering: folding
    batch-by-batch equals a global latest-wins merge when sequence
    numbers arrive in order per key; out-of-order deletes across
    batches would need tombstone retention (a real table format's
    job).  At scale, swap the
    directory-rename for a real table format's transaction; the merge
    itself is unchanged.
    """
    import os
    import shutil

    from apache_beam_spark.operators.cdc import apply_changes

    spark = sdf.sparkSession
    cur = os.path.join(path, "current")

    def recover() -> None:
        """Heal a crash between ``rename(cur, old)`` and
        ``rename(staged, cur)``: ``current`` is missing but a
        fully-written ``_staged_<id>`` (the snapshot whose write
        completed BEFORE the renames began) or the moved-aside
        ``_old_<id>`` still exists.  Restore the newest staged if
        present (the replayed batch re-folds into it idempotently —
        latest-wins on the same changes is a fixpoint), else the old
        base.  A staged dir is only trusted if it carries Spark's
        ``_SUCCESS`` job-commit marker: a crash DURING the very first
        batch's staged write (no ``current`` exists yet) leaves a
        partial ``_staged_<id>`` with no marker — promoting it would
        wedge every replay on corrupt parquet, so it is deleted and
        the merge rebuilds from the empty base instead."""
        if os.path.exists(cur) or not os.path.isdir(path):
            return
        for prefix in ("_staged_", "_old_"):
            cands = [d for d in os.listdir(path) if d.startswith(prefix)
                     and d[len(prefix):].isdigit()]
            for name in sorted(cands, key=lambda d: -int(d[len(prefix):])):
                full = os.path.join(path, name)
                if prefix == "_staged_" and not os.path.exists(
                        os.path.join(full, "_SUCCESS")):
                    shutil.rmtree(full, ignore_errors=True)
                    continue
                os.rename(full, cur)
                return

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        recover()
        # stale scratch from a merge that died mid-write (current still
        # intact): safe to drop, the batch is being replayed right now
        if os.path.isdir(path):
            for d in os.listdir(path):
                if d.startswith(("_staged_", "_old_")):
                    shutil.rmtree(os.path.join(path, d), ignore_errors=True)
        if os.path.exists(cur):
            base = spark.read.parquet(cur)
        else:
            base = batch_df.sparkSession.createDataFrame(
                [], batch_df.drop(op_col).schema)
        snap = apply_changes(base, batch_df, keys=keys, seq_col=seq_col,
                             op_col=op_col, delete_op=delete_op,
                             tiebreak=tiebreak)
        staged = os.path.join(path, f"_staged_{batch_id}")
        snap.write.mode("overwrite").parquet(staged)
        old = os.path.join(path, f"_old_{batch_id}")
        if os.path.exists(cur):
            os.rename(cur, old)
        os.rename(staged, cur)
        shutil.rmtree(old, ignore_errors=True)

    # append mode: the changelog is already row-per-change (and
    # upstream stateful operators like streaming_rate_limit declare
    # append; update mode would be rejected)
    return (sdf.writeStream.foreachBatch(merge)
            .option("checkpointLocation", checkpoint)
            .outputMode("append").start())
