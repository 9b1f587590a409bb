"""Hive-catalog wrappers (HCatalogIO parity) + Kafka option plumbing
tests that need no external services (VERDICT r1 items 8+9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_beam_spark.sources.catalog import (
    drop_table,
    read_table,
    table_exists,
    write_table,
)
from apache_beam_spark.streaming.sources import (
    decode_kafka,
    kafka_options,
    kafka_stream,
)


def _clean(spark, *tables):
    """Drop catalog entries AND stale on-disk locations (the in-memory
    catalog of a new session forgets managed tables; their warehouse
    dirs persist and block re-creation)."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in tables:
        drop_table(spark, t)
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)


def test_catalog_round_trip(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("bucket_key"),
        (F.col("id") % 3).cast("string").alias("part"))
    _clean(spark, "t_cat_rt")
    write_table(df, "t_cat_rt", mode="overwrite", partition_by=["part"])
    assert table_exists(spark, "t_cat_rt")
    back = read_table(spark, "t_cat_rt")
    assert back.count() == 100
    # partition filter prunes: only one partition's rows
    assert read_table(spark, "t_cat_rt", "part = '0'").count() == 34
    drop_table(spark, "t_cat_rt")
    assert not table_exists(spark, "t_cat_rt")


def test_catalog_bucketed_write_join_no_shuffle(spark):
    """write_table(bucket_by=...) + join on the bucket key plans zero
    shuffle Exchange operators — the amortized-shuffle path (broadcast
    disabled so the bucketed SMJ path is actually exercised)."""
    from apache_beam_spark.plans import shuffle_count

    df = spark.range(1000).select(F.col("id"), (F.col("id") % 50).alias("k"))
    _clean(spark, "t_cat_ba", "t_cat_bb")
    for t in ("t_cat_ba", "t_cat_bb"):
        write_table(df, t, mode="overwrite", bucket_by=["k"], num_buckets=8,
                    sort_by=["k"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "t_cat_ba").join(
            read_table(spark, "t_cat_bb").withColumnRenamed("id", "id2"), on="k")
        assert shuffle_count(joined) == 0, "bucketed join must not exchange"
        assert joined.count() == 20000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    _clean(spark, "t_cat_ba", "t_cat_bb")


def test_kafka_options_subscribe_modes():
    o = kafka_options("b:9092", topics="a,b", starting_offsets="earliest",
                      max_offsets_per_trigger=10000, fail_on_data_loss=False,
                      group_id_prefix="beamspark",
                      **{"max.poll.records": 500})
    assert o == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "a,b",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "10000",
        "failOnDataLoss": "false",
        "groupIdPrefix": "beamspark",
        "kafka.max.poll.records": "500",
    }
    assert kafka_options("b:9092", topic_pattern="logs-.*")["subscribePattern"] == "logs-.*"
    assert kafka_options("b:9092", assign={"t": [0, 1]})["assign"] == '{"t": [0, 1]}'
    # startReadTime maps to startingTimestamp and suppresses offsets
    o2 = kafka_options("b:9092", topics="t", starting_timestamp_ms=1700000000000)
    assert o2["startingTimestamp"] == "1700000000000"
    assert "startingOffsets" not in o2


def test_kafka_options_subscription_required():
    with pytest.raises(ValueError, match="exactly one"):
        kafka_options("b:9092")
    with pytest.raises(ValueError, match="exactly one"):
        kafka_options("b:9092", topics="t", topic_pattern="x.*")


def test_kafka_stream_raises_cleanly_without_package(spark):
    with pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        kafka_stream(spark, "b:9092", topics="t").printSchema()


def test_decode_kafka_on_fabricated_wire_rows(spark):
    """decode_kafka works on any DataFrame with the Kafka source
    schema — the deserializer path is testable without a broker."""
    rows = [(b"k1", b'{"user":"a","n":3}', "t", 0, 0),
            (b"k2", b'{"user":"b","n":5}', "t", 0, 1)]
    df = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long")
    out = decode_kafka(df, value_schema="user string, n int")
    got = {r["key"]: (r["value"]["user"], r["value"]["n"]) for r in out.collect()}
    assert got == {"k1": ("a", 3), "k2": ("b", 5)}


def test_connector_option_builders():
    from apache_beam_spark.sources.connectors import (
        bigquery_options,
        cassandra_options,
        elasticsearch_options,
        mongodb_options,
    )

    assert mongodb_options("mongodb://h:27017", "db", "coll",
                           pipeline='[{"$match": {"x": 1}}]') == {
        "connection.uri": "mongodb://h:27017", "database": "db",
        "collection": "coll", "aggregation.pipeline": '[{"$match": {"x": 1}}]'}
    assert cassandra_options("ks", "t", consistency="LOCAL_QUORUM") == {
        "keyspace": "ks", "table": "t",
        "spark.cassandra.input.consistency.level": "LOCAL_QUORUM"}
    assert elasticsearch_options("h:9200", "idx/doc", scroll_size=500) == {
        "es.nodes": "h:9200", "es.resource": "idx/doc", "es.scroll.size": "500"}
    assert bigquery_options("proj.ds.t", filter_pushdown="x > 5") == {
        "table": "proj.ds.t", "filter": "x > 5"}


def test_connector_loaders_raise_cleanly(spark):
    from apache_beam_spark.sources.connectors import (
        read_cassandra,
        read_mongodb,
    )

    with pytest.raises(NotImplementedError, match="mongo-spark-connector"):
        read_mongodb(spark, "mongodb://h", "db", "c").printSchema()
    with pytest.raises(NotImplementedError, match="spark-cassandra-connector"):
        read_cassandra(spark, "ks", "t").printSchema()


def test_more_connector_builders():
    import json

    from apache_beam_spark.sources.connectors import (
        hbase_catalog,
        kinesis_options,
        solr_options,
    )

    cat = json.loads(hbase_catalog(
        "t", {"id": ("rowkey", "key", "string"),
              "v": ("cf1", "val", "double")}))
    assert cat["table"] == {"namespace": "default", "name": "t"}
    assert cat["columns"]["v"] == {"cf": "cf1", "col": "val", "type": "double"}
    assert solr_options("zk:2181", "c", fields=["a", "b"]) == {
        "zkhost": "zk:2181", "collection": "c", "fields": "a,b"}
    assert kinesis_options("s", "us-east-1", initial_position="trim_horizon") == {
        "streamName": "s", "region": "us-east-1",
        "initialPosition": "trim_horizon"}
