"""File / connector IO.

Mappings (SURVEY.md §2.11):
  TextIO (io/TextIO.java:171)          -> spark.read.text / readStream.text
  AvroIO (io/AvroIO.java)              -> format("avro")
  XmlIO / TFRecordIO                   -> gated behind optional packages
  JdbcIO (io/jdbc/.../JdbcIO.java)     -> spark.read.jdbc with predicate
                                          partitioning (parallel reads —
                                          the reference read JDBC single-
                                          threaded per query)
  GenerateSequence (io/GenerateSequence.java:67)
                                       -> spark.range / rate stream
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_text(spark: SparkSession, path: str, wholetext: bool = False) -> DataFrame:
    return spark.read.text(path, wholetext=wholetext).withColumnRenamed("value", "line")


def read_json(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    r = spark.read.options(**options)
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def read_csv(spark: SparkSession, path: str, header: bool = True, schema=None, **options) -> DataFrame:
    r = spark.read.option("header", header).options(**options)
    if schema is not None:
        r = r.schema(schema)
    return r.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """AvroIO — needs the spark-avro package on the classpath."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # pragma: no cover - package not in container
        raise NotImplementedError(
            "avro requires org.apache.spark:spark-avro on the classpath"
        ) from e


def read_xml(spark: SparkSession, path: str, row_tag: str = "row",
             schema=None, **options) -> DataFrame:
    """XmlIO (reference ``sdks/java/io/xml/.../XmlIO.java`` — JAXB
    record-per-rowTag reads).  Spark 4 ships a native XML source, so
    this is a built-in scan with schema inference, pushdown-capable."""
    r = spark.read.format("xml").option("rowTag", row_tag).options(**options)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row",
              root_tag: str = "rows", mode: str = "overwrite") -> None:
    (df.write.format("xml").option("rowTag", row_tag)
     .option("rootTag", root_tag).mode(mode).save(path))


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: Optional[str] = None,
              lower_bound=None, upper_bound=None, num_partitions: int = 8,
              **properties) -> DataFrame:
    """JdbcIO read (reference ``io/jdbc/.../JdbcIO.java``).  When a
    partition column is given, Spark issues num_partitions range-bounded
    queries in parallel."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        r = (r.option("partitionColumn", partition_column)
             .option("lowerBound", lower_bound).option("upperBound", upper_bound)
             .option("numPartitions", num_partitions))
    for k, v in properties.items():
        r = r.option(k, v)
    return r.load()


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **properties) -> None:
    w = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in properties.items():
        w = w.option(k, v)
    w.save()


class GenerateSequence:
    """reference ``io/GenerateSequence.java:67`` — bounded numeric range
    or rate-limited unbounded stream (withRate:125)."""

    @staticmethod
    def bounded(spark: SparkSession, start: int, end: int, num_partitions: Optional[int] = None) -> DataFrame:
        return spark.range(start, end, 1, num_partitions or spark.sparkContext.defaultParallelism)

    @staticmethod
    def with_rate(spark: SparkSession, rows_per_second: int) -> DataFrame:
        return (spark.readStream.format("rate")
                .option("rowsPerSecond", rows_per_second).load())


def match_files(spark: SparkSession, pattern: str) -> DataFrame:
    """FileIO.match / MatchResult (reference
    ``sdks/java/core/.../io/FileIO.java:~200``, ``fs/MatchResult.java``):
    expand a glob into a DataFrame of file metadata
    ``(path string, size_bytes bigint, mtime_ms bigint)``.

    Listing runs through the Hadoop FileSystem layer on the driver —
    the same place Beam's match expansion runs — so it works on any
    configured filesystem (local, HDFS, s3a, ...).  The MANIFEST is
    driver-side; the downstream per-file WORK stays distributed (pass
    the paths to ``spark.read`` or parallelize the manifest).
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = p.getFileSystem(conf)
    statuses = fs.globStatus(p)
    rows = [(s.getPath().toString(), s.getLen(), s.getModificationTime())
            for s in (statuses or [])]
    return spark.createDataFrame(
        rows, "path string, size_bytes bigint, mtime_ms bigint")


def read_matches(spark: SparkSession, manifest: DataFrame,
                 format: str = "parquet", **options) -> DataFrame:
    """FileIO.readMatches + the format read (reference
    ``FileIO.java readMatches``): consume a ``match_files`` manifest by
    reading the matched paths through the normal distributed reader
    (which re-splits large files — Beam's ReadableFile never did)."""
    paths = [r.path for r in manifest.select("path").collect()]
    if not paths:
        raise ValueError("read_matches: empty manifest")
    return spark.read.format(format).options(**options).load(paths)


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: union the schemas of all footers
    (``mergeSchema``) so files written before a column was added read
    back with NULLs in it — the reference handled this at the Avro
    layer via reader/writer schema resolution (AvroIO withSchema)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def compact_parquet(spark: SparkSession, src: str, dest: str,
                    target_mb: int = 512) -> int:
    """Small-file compaction: rewrite a directory of parquet files into
    ``ceil(total_bytes / target_mb)`` similarly-sized files.

    The operational fix for the classic 100 TB failure mode — millions
    of kilobyte files from over-parallel writes drowning the namenode
    and the scan planner.  File count comes from the MANIFEST (cheap
    driver-side listing), not from reading data twice; the rewrite is
    one distributed read + round-robin repartition + write.  Returns
    the output file count.
    """
    import math

    manifest = match_files(spark, src.rstrip("/") + "/*.parquet")
    total = sum(r.size_bytes for r in manifest.collect())
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    spark.read.parquet(src).repartition(n).write.mode("overwrite").parquet(dest)
    return n


def windowed_sharded_write(df: DataFrame, out_dir: str, prefix: str,
                           window_size: str, event_time: str,
                           text_col: str, num_shards: int,
                           shard_col: str = None,
                           suffix: str = ".txt",
                           dest_col: str = None) -> DataFrame:
    """Windowed, fixed-shard text write with the reference's TWO-PHASE
    FINALIZE-RENAME commit (``WriteFiles.java`` + ``FileBasedSink.java``
    — ``withNumShards``/``FixedNumShards`` sharding, per-window shard
    files named ``{prefix}-{windowStartMs}-{windowEndMs}-{ssss}-of-
    {NNNN}{suffix}``, writers emit to a hidden per-call temp dir
    ``.temp-beam-write-{salt}`` — the reference salts its temp
    location per write job the same way (FileBasedSink temp UUID), so
    concurrent writes into one ``out_dir`` never interleave manifests
    — finalize renames every temp file to its final name and removes
    only its OWN temp dir; a stale ``.temp-beam-write-*`` from a
    crashed job is identifiable by salt and never touched by later
    writes.  Commit guarantee (same as the reference's
    ``moveToOutputFiles``): no final file appears unless its writer
    succeeded; each individual rename is atomic, but a crash DURING
    finalize can leave a partial — though individually complete — set
    of final files.

    Spark-first shape: one ``applyInPandas`` over the (window, shard)
    groups — each group writes ITS OWN file exactly like a reference
    ``Writer`` bundle, lines sorted for deterministic content — then a
    driver-side finalize over the manifest (one ``os.replace`` per
    shard: atomic on a same-filesystem rename, the reference's
    ``moveToOutputFiles``).  ``out_dir`` must be a shared filesystem
    visible to executors and driver (same requirement as the
    reference's temp/final locations).  Sharding: ``shard_col`` names
    an integer column; its value mod ``num_shards`` picks the shard —
    deterministic, so the whole write (names AND contents) is
    value-oracle-able; the reference's round-robin assignment is
    likewise arbitrary-but-fixed per element.  Empty (window, shard)
    pairs produce no file (the reference writes empty shards only for
    the global window on empty PCollections).

    ``dest_col`` enables the reference's DYNAMIC DESTINATIONS
    (``DynamicFileDestinations.java`` / ``DefaultFilenamePolicy``):
    each row's destination string replaces ``prefix`` in its own
    file's name, so one write fans out to per-destination shard sets —
    the grouping key simply gains the destination column (no extra
    shuffle beyond the one the sink already does).

    Returns the finalize manifest as a DataFrame:
    ``(window_start_ms, window_end_ms, shard, filename, n_rows)``.
    """
    import os
    import uuid

    import pandas as pd
    from pyspark.sql import functions as F

    if shard_col is None:
        raise ValueError("shard_col is required (deterministic sharding)")
    if "://" in out_dir:
        # executors open() files and the driver os.replace()s them —
        # both need the SAME mounted filesystem path.  A URI scheme
        # (hdfs://, s3a://, ...) would scatter temp files on
        # executor-local disks and fail at finalize; fail fast instead.
        raise ValueError(
            f"windowed_sharded_write needs a shared-filesystem PATH "
            f"visible to driver and executors (got URI {out_dir!r}); "
            f"mount the store (e.g. NFS/fuse) or write to a local/"
            f"shared path")
    tmp_dir = os.path.join(out_dir,
                           f".temp-beam-write-{uuid.uuid4().hex[:12]}")
    os.makedirs(tmp_dir, exist_ok=True)
    os.makedirs(out_dir, exist_ok=True)

    win = F.window(F.col(event_time), window_size)
    dest = (F.col(dest_col).cast("string") if dest_col
            else F.lit(prefix))
    tagged = (df
              .withColumn("__ws__", F.unix_millis(win["start"]))
              .withColumn("__we__", F.unix_millis(win["end"]))
              .withColumn("__shard__",
                          F.pmod(F.col(shard_col).cast("long"),
                                 F.lit(num_shards)).cast("int"))
              .withColumn("__dest__", dest)
              .select("__dest__", "__ws__", "__we__", "__shard__",
                      F.col(text_col).cast("string").alias("__line__")))

    def write_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        dst, ws, we, sh = (str(key[0]), int(key[1]), int(key[2]),
                           int(key[3]))
        name = f"{dst}-{ws}-{we}-{sh:05d}-of-{num_shards:05d}{suffix}"
        lines = sorted(pdf["__line__"].astype(str).tolist())
        with open(os.path.join(tmp_dir, name), "w") as f:
            f.write("\n".join(lines) + "\n")
        return pd.DataFrame([{
            "window_start_ms": ws, "window_end_ms": we, "shard": sh,
            "filename": name, "n_rows": len(pdf)}])

    manifest = (tagged.groupBy("__dest__", "__ws__", "__we__", "__shard__")
                .applyInPandas(write_group,
                               "window_start_ms long, window_end_ms long,"
                               " shard int, filename string, n_rows long")
                .collect())
    # finalize (FileBasedSink.moveToOutputFiles): every shard rename is
    # atomic; nothing appears under out_dir until its writer succeeded
    for r in manifest:
        try:
            os.replace(os.path.join(tmp_dir, r["filename"]),
                       os.path.join(out_dir, r["filename"]))
        except FileNotFoundError:
            raise RuntimeError(
                f"finalize expected {r['filename']!r} in {tmp_dir!r} "
                f"but it is missing: executors and driver must share "
                f"one filesystem at {out_dir!r} (an executor wrote its "
                f"temp file to a different machine's disk)") from None
    try:
        os.rmdir(tmp_dir)
    except OSError:
        pass                         # leftovers from a failed writer
    spark = df.sparkSession
    return spark.createDataFrame(
        [(r["window_start_ms"], r["window_end_ms"], r["shard"],
          r["filename"], r["n_rows"]) for r in manifest],
        "window_start_ms long, window_end_ms long, shard int,"
        " filename string, n_rows long")


def windowed_sharded_write_stream(sdf: DataFrame, out_dir: str,
                                  prefix: str, window_size: str,
                                  event_time: str, text_col: str,
                                  num_shards: int, shard_col: str,
                                  checkpoint: str,
                                  suffix: str = ".txt"):
    """Streaming twin via foreachBatch: each micro-batch finalizes its
    own windowed shard files, pane-stamped ``-pane{batchId}`` before
    the suffix (the reference names triggered windowed writes with
    PaneInfo the same way, FileBasedSink.java windowedWrites).  Exactly
    -once per batch rides Spark's checkpointed batch ids plus the
    finalize-rename (a replayed batch overwrites its own pane files
    deterministically — same content, same names)."""

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        if bdf.isEmpty():
            return
        windowed_sharded_write(
            bdf, out_dir, prefix, window_size, event_time, text_col,
            num_shards, shard_col=shard_col,
            suffix=f"-pane{batch_id}{suffix}")

    return (sdf.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint))
