"""External-store connector plumbing (SURVEY.md §2.11 tail).

Reference IOs map to Spark DataSource V2 connectors — each is a format
string plus an option map.  The connector JARs are not in this
container, so each loader raises ``NotImplementedError`` with the
package coordinate when the format is absent; the OPTION BUILDERS are
pure and unit-tested (the same broker-less strategy as
``streaming/sources.kafka_options``).

| Reference IO                                      | Spark format |
|---------------------------------------------------|--------------|
| MongoDbIO (io/mongodb/.../MongoDbIO.java:138)     | ``mongodb`` (mongo-spark-connector) |
| CassandraIO (io/cassandra/.../CassandraIO.java:79)| ``org.apache.spark.sql.cassandra`` |
| ElasticsearchIO (io/elasticsearch/.../ElasticsearchIO.java:156) | ``es`` (elasticsearch-spark) |
| BigQueryIO (io/gcp/bigquery/.../BigQueryIO.java)  | ``bigquery`` (spark-bigquery-connector) |
| JdbcIO                                            | ``jdbc`` (sources/io.py) |
| KafkaIO                                           | ``kafka`` (streaming/sources.py) |
| HCatalogIO                                        | catalog tables (sources/catalog.py) |
| HBaseIO (io/hbase/.../HBaseIO.java)               | hbase-spark JSON catalog |
| SolrIO (io/solr/.../SolrIO.java)                  | ``solr`` (spark-solr) |
| KinesisIO (io/kinesis/.../KinesisIO.java)         | ``kinesis`` (spark-sql-kinesis) |
| SpannerIO (io/gcp/spanner/.../SpannerIO.java)     | ``cloud-spanner`` (spark-spanner-connector) |
| BigtableIO (io/gcp/bigtable/.../BigtableIO.java)  | ``bigtable`` (spark-bigtable connector) |

PubsubIO / JmsIO / MqttIO / AmqpIO have no first-party OSS Spark
connector; route those streams through Kafka or file landing zones
(documented mapping, SURVEY.md §8).  DatastoreIO likewise: use the
managed export to GCS and read the export files.  HadoopInputFormatIO
is native Spark (``sparkContext.newAPIHadoopRDD`` with the same
InputFormat class — no wrapper needed).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def mongodb_options(uri: str, database: str, collection: str,
                    pipeline: Optional[str] = None,
                    read_preference: Optional[str] = None) -> dict[str, str]:
    """MongoDbIO.read (MongoDbIO.java:138): withUri/withDatabase/
    withCollection; ``pipeline`` maps withQueryFn's bson filter (server
    -side filtering = the connector's pushdown)."""
    opts = {"connection.uri": uri, "database": database,
            "collection": collection}
    if pipeline:
        opts["aggregation.pipeline"] = pipeline
    if read_preference:
        opts["readPreference.name"] = read_preference
    return opts


def cassandra_options(keyspace: str, table: str,
                      consistency: Optional[str] = None) -> dict[str, str]:
    """CassandraIO.read (CassandraIO.java:79): withKeyspace/withTable/
    withConsistencyLevel."""
    opts = {"keyspace": keyspace, "table": table}
    if consistency:
        opts["spark.cassandra.input.consistency.level"] = consistency
    return opts


def elasticsearch_options(nodes: str, index: str,
                          query: Optional[str] = None,
                          scroll_size: Optional[int] = None) -> dict[str, str]:
    """ElasticsearchIO.read (ElasticsearchIO.java:156):
    withConnectionConfiguration(addresses, index); ``query`` maps
    withQuery (pushed to ES); ``scroll_size`` maps withBatchSize."""
    opts = {"es.nodes": nodes, "es.resource": index}
    if query:
        opts["es.query"] = query
    if scroll_size is not None:
        opts["es.scroll.size"] = str(scroll_size)
    return opts


def bigquery_options(table: str, dataset: Optional[str] = None,
                     project: Optional[str] = None,
                     filter_pushdown: Optional[str] = None) -> dict[str, str]:
    """BigQueryIO.read: from/fromQuery table spec + withRowRestriction
    (``filter_pushdown`` — the Storage Read API's server-side filter)."""
    opts = {"table": table}
    if dataset:
        opts["dataset"] = dataset
    if project:
        opts["project"] = project
    if filter_pushdown:
        opts["filter"] = filter_pushdown
    return opts


_PACKAGES = {
    "mongodb": "org.mongodb.spark:mongo-spark-connector",
    "org.apache.spark.sql.cassandra": "com.datastax.spark:spark-cassandra-connector",
    "es": "org.elasticsearch:elasticsearch-spark-30",
    "bigquery": "com.google.cloud.spark:spark-bigquery-with-dependencies",
}


def _load(spark: SparkSession, fmt: str, opts: dict[str, str]) -> DataFrame:
    try:
        return spark.read.format(fmt).options(**opts).load()
    except Exception as e:  # pragma: no cover - connector not in container
        raise NotImplementedError(
            f"{fmt} requires {_PACKAGES.get(fmt, fmt)} on the classpath"
        ) from e


def read_mongodb(spark: SparkSession, uri: str, database: str,
                 collection: str, **kw) -> DataFrame:
    return _load(spark, "mongodb", mongodb_options(uri, database, collection, **kw))


def read_cassandra(spark: SparkSession, keyspace: str, table: str, **kw) -> DataFrame:
    return _load(spark, "org.apache.spark.sql.cassandra",
                 cassandra_options(keyspace, table, **kw))


def read_elasticsearch(spark: SparkSession, nodes: str, index: str, **kw) -> DataFrame:
    return _load(spark, "es", elasticsearch_options(nodes, index, **kw))


def read_bigquery(spark: SparkSession, table: str, **kw) -> DataFrame:
    return _load(spark, "bigquery", bigquery_options(table, **kw))


def hbase_catalog(table: str, columns: dict[str, tuple[str, str, str]],
                  namespace: str = "default") -> str:
    """HBaseIO parity (io/hbase/.../HBaseIO.java): the hbase-spark
    connector addresses tables through a JSON catalog.  ``columns``:
    df_col -> (column_family, hbase_qualifier, type); the rowkey column
    uses family "rowkey"."""
    import json

    return json.dumps({
        "table": {"namespace": namespace, "name": table},
        "rowkey": "key",
        "columns": {
            col: {"cf": cf, "col": qual, "type": typ}
            for col, (cf, qual, typ) in columns.items()
        },
    })


def solr_options(zkhost: str, collection: str,
                 query: Optional[str] = None,
                 fields: Optional[list[str]] = None) -> dict[str, str]:
    """SolrIO parity (io/solr/.../SolrIO.java): spark-solr options —
    withConnectionConfiguration(zkHost) / from(collection) / withQuery."""
    opts = {"zkhost": zkhost, "collection": collection}
    if query:
        opts["query"] = query
    if fields:
        opts["fields"] = ",".join(fields)
    return opts


def kinesis_options(stream: str, region: str,
                    endpoint: Optional[str] = None,
                    initial_position: str = "latest") -> dict[str, str]:
    """KinesisIO parity (io/kinesis/.../KinesisIO.java): the
    spark-sql-kinesis connector's option surface — streamName/region /
    withInitialPositionInStream."""
    opts = {"streamName": stream, "region": region,
            "initialPosition": initial_position}
    if endpoint:
        opts["endpointUrl"] = endpoint
    return opts


def read_solr(spark: SparkSession, zkhost: str, collection: str, **kw) -> DataFrame:
    return _load(spark, "solr", solr_options(zkhost, collection, **kw))


def read_hbase(spark: SparkSession, catalog: str) -> DataFrame:
    try:
        return (spark.read.format("org.apache.hadoop.hbase.spark")
                .option("hbase.columns.mapping", catalog)
                .option("catalog", catalog).load())
    except Exception as e:  # pragma: no cover - connector not in container
        raise NotImplementedError(
            "hbase requires org.apache.hbase.connectors.spark:hbase-spark "
            "on the classpath") from e


def kinesis_stream(spark: SparkSession, stream: str, region: str, **kw) -> DataFrame:
    try:
        return (spark.readStream.format("kinesis")
                .options(**kinesis_options(stream, region, **kw)).load())
    except Exception as e:  # pragma: no cover - connector not in container
        raise NotImplementedError(
            "kinesis requires the spark-sql-kinesis connector on the "
            "classpath") from e
