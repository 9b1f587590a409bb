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


# ------------------------------------------------------------ message brokers
# JmsIO / MqttIO / AmqpIO have no first-party Spark connector; the
# builders validate + normalize the reference's connection surface and
# the loaders name the documented bridge (broker -> Kafka, or the
# Bahir connectors where they exist).

def jms_options(broker_url: str, queue: Optional[str] = None,
                topic: Optional[str] = None,
                connection_factory_class: Optional[str] = None,
                username: Optional[str] = None,
                password: Optional[str] = None) -> dict[str, str]:
    """JmsIO.read (io/jms/.../JmsIO.java:191 withQueue / :204 withTopic):
    exactly one destination, same exclusivity check as the reference's
    validate()."""
    if (queue is None) == (topic is None):
        raise ValueError("exactly one of queue / topic is required")
    opts = {"brokerUrl": broker_url,
            "destination": queue or topic,
            "destinationType": "queue" if queue else "topic"}
    if connection_factory_class:
        opts["connectionFactoryClass"] = connection_factory_class
    if username:
        opts["username"] = username
    if password:
        opts["password"] = password
    return opts


def mqtt_options(server_uri: str, topic: str,
                 client_id: Optional[str] = None,
                 qos: int = 0) -> dict[str, str]:
    """MqttIO.ConnectionConfiguration.create (io/mqtt/.../MqttIO.java:
    151,170): serverUri + topic [+ clientId]; option names follow the
    Bahir spark-streaming-mqtt connector."""
    if not server_uri or not topic:
        raise ValueError("serverUri and topic are required")
    opts = {"brokerUrl": server_uri, "topic": topic, "QoS": str(qos)}
    if client_id:
        opts["clientId"] = client_id
    return opts


def amqp_options(addresses: list[str]) -> dict[str, str]:
    """AmqpIO.read (io/amqp/.../AmqpIO.java): withAddresses — the
    proton-j listen/connect address list."""
    if not addresses:
        raise ValueError("at least one address is required")
    return {"addresses": ",".join(addresses)}


def read_jms(spark: SparkSession, broker_url: str, **kw) -> DataFrame:
    jms_options(broker_url, **kw)  # surface validation errors first
    raise NotImplementedError(
        "No first-party Spark JMS connector; bridge the destination to "
        "Kafka (e.g. Camel jms->kafka) and read with kafka_stream, or "
        "land messages to files and use file_stream")


def read_mqtt(spark: SparkSession, server_uri: str, topic: str, **kw) -> DataFrame:
    mqtt_options(server_uri, topic, **kw)
    raise NotImplementedError(
        "mqtt requires org.apache.bahir:spark-streaming-mqtt (DStream "
        "API) or an MQTT->Kafka bridge read with kafka_stream")


def read_amqp(spark: SparkSession, addresses: list[str]) -> DataFrame:
    amqp_options(addresses)
    raise NotImplementedError(
        "No first-party Spark AMQP connector; bridge through Kafka "
        "(kafka_stream) or a file landing zone (file_stream)")


# ----------------------------------------------------------------- GCP stores

def bigtable_options(project_id: str, instance_id: str, table_id: str,
                     key_range: Optional[tuple[str, str]] = None,
                     row_filter: Optional[str] = None) -> dict[str, str]:
    """BigtableIO.read (io/gcp/bigtable/.../BigtableIO.java:191):
    withProjectId/withInstanceId/withTableId + the scan narrowing
    (withKeyRange :338 / withRowFilter :325) that the spark-bigtable
    connector pushes down."""
    opts = {"spark.bigtable.project.id": project_id,
            "spark.bigtable.instance.id": instance_id,
            "catalog": table_id}
    if key_range:
        opts["spark.bigtable.read.rows.range.start"] = key_range[0]
        opts["spark.bigtable.read.rows.range.end"] = key_range[1]
    if row_filter:
        opts["spark.bigtable.read.rows.filter"] = row_filter
    return opts


def datastore_options(project_id: str, kind: Optional[str] = None,
                      namespace: Optional[str] = None,
                      gql_query: Optional[str] = None) -> dict[str, str]:
    """DatastoreIO / DatastoreV1.read (io/gcp/datastore/.../DatastoreV1.java):
    withProjectId + withQuery(kind or GQL) + withNamespace.  The Spark
    route is the managed Datastore export to GCS read back as
    LevelDB/Avro export files."""
    if (kind is None) == (gql_query is None):
        raise ValueError("exactly one of kind / gql_query is required")
    opts = {"projectId": project_id}
    if kind:
        opts["kind"] = kind
    if gql_query:
        opts["gqlQuery"] = gql_query
    if namespace:
        opts["namespace"] = namespace
    return opts


def spanner_options(project_id: str, instance_id: str, database_id: str,
                    table: Optional[str] = None,
                    sql: Optional[str] = None) -> dict[str, str]:
    """SpannerIO.read (io/gcp/spanner/.../SpannerIO.java): withInstance/
    withDatabaseId + table-or-query, the same exclusivity the reference
    enforces in validate()."""
    if (table is None) == (sql is None):
        raise ValueError("exactly one of table / sql is required")
    opts = {"projectId": project_id, "instanceId": instance_id,
            "databaseId": database_id}
    if table:
        opts["table"] = table
    if sql:
        opts["query"] = sql
    return opts


_PACKAGES.update({
    "bigtable": "com.google.cloud.spark.bigtable:spark-bigtable_2.13",
    "cloud-spanner": "com.google.cloud.spark:spark-3.1-spanner",
})


def read_bigtable(spark: SparkSession, project_id: str, instance_id: str,
                  table_id: str, **kw) -> DataFrame:
    return _load(spark, "bigtable",
                 bigtable_options(project_id, instance_id, table_id, **kw))


def read_spanner(spark: SparkSession, project_id: str, instance_id: str,
                 database_id: str, **kw) -> DataFrame:
    return _load(spark, "cloud-spanner",
                 spanner_options(project_id, instance_id, database_id, **kw))


def read_datastore(spark: SparkSession, project_id: str, **kw) -> DataFrame:
    datastore_options(project_id, **kw)
    raise NotImplementedError(
        "No first-party Spark Datastore connector; run the managed "
        "export to GCS and read the export files (sources/io.py), or "
        "use the Firestore BigQuery mirror via read_bigquery")
