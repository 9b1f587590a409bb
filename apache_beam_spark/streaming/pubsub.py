"""PubsubIO parity (reference
``sdks/java/io/google-cloud-platform/.../pubsub/PubsubIO.java:79``).

No first-party OSS Spark connector exists for Cloud Pub/Sub, so parity
is structural (the same three-layer split the reference uses):

* **path model** — ``PubsubTopic`` / ``PubsubSubscription`` parse and
  validate the ``projects/<p>/topics|subscriptions/<n>`` paths
  (PubsubIO.java:196,362 incl. the deprecated v1beta1 forms and the
  GCP naming rules at :92-141);
* **message model + timestamp/id semantics** — the wire schema
  (payload bytes, attributes map, message id, publish time) plus
  ``extract_timestamp_col`` implementing PubsubClient.extractTimestamp
  (PubsubClient.java:96: timestampAttribute value parsed as
  ms-since-epoch else RFC-3339, missing/unparseable values FAIL; no
  attribute -> publish time) and ``deduplicate_by_id`` implementing the
  idAttribute exactly-once contract — all pure Column logic, testable
  broker-free on batch or ``TestStream`` input;
* **transport** — ``read_pubsub`` routes to a documented bridge: the
  Pub/Sub -> Kafka connector (then ``kafka_stream``), a GCS landing
  zone (then ``file_stream``), or the spool-backed emulation used by
  the tests (``TestStream`` carrying the message schema).  Direct
  transport raises ``NotImplementedError`` with the route options, the
  same gated-loader pattern as ``sources/connectors.py``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: PubsubIO.java:92-103 — loose-but-sufficient GCP path grammar
_PROJECT_ID_RE = re.compile(r"[a-z][-a-z0-9:.]{4,61}[a-z0-9]$")
_SUBSCRIPTION_RE = re.compile(r"projects/([^/]+)/subscriptions/(.+)$")
_TOPIC_RE = re.compile(r"projects/([^/]+)/topics/(.+)$")
_V1BETA1_SUBSCRIPTION_RE = re.compile(r"/subscriptions/([^/]+)/(.+)$")
_V1BETA1_TOPIC_RE = re.compile(r"/topics/([^/]+)/(.+)$")
_PUBSUB_NAME_RE = re.compile(r"[a-zA-Z][-._~%+a-zA-Z0-9]+$")


def _validate_project(project: str) -> None:
    if not _PROJECT_ID_RE.match(project):
        raise ValueError(f"Illegal project name in Pubsub path: {project}")


def _validate_name(name: str) -> None:
    """PubsubIO.validatePubsubName (PubsubIO.java:122-141)."""
    if len(name) < 3:
        raise ValueError(f"Pubsub object name shorter than 3 chars: {name}")
    if len(name) > 255:
        raise ValueError(f"Pubsub object name longer than 255 chars: {name}")
    if name.startswith("goog"):
        raise ValueError(f"Pubsub object name cannot start with goog: {name}")
    if not _PUBSUB_NAME_RE.match(name):
        raise ValueError(f"Illegal Pubsub object name: {name}")


@dataclass(frozen=True)
class PubsubSubscription:
    """PubsubIO.PubsubSubscription (PubsubIO.java:165-265)."""

    project: str
    subscription: str

    @staticmethod
    def from_path(path: str) -> "PubsubSubscription":
        m = _V1BETA1_SUBSCRIPTION_RE.match(path)
        if m is None:
            m = _SUBSCRIPTION_RE.match(path)
        if m is None:
            raise ValueError(
                "Pubsub subscription is not in "
                f"projects/<project_id>/subscriptions/<name> format: {path}")
        project, name = m.group(1), m.group(2)
        _validate_project(project)
        _validate_name(name)
        return PubsubSubscription(project, name)

    def as_path(self) -> str:
        return f"projects/{self.project}/subscriptions/{self.subscription}"


@dataclass(frozen=True)
class PubsubTopic:
    """PubsubIO.PubsubTopic (PubsubIO.java:331-430)."""

    project: str
    topic: str

    @staticmethod
    def from_path(path: str) -> "PubsubTopic":
        m = _V1BETA1_TOPIC_RE.match(path)
        if m is None:
            m = _TOPIC_RE.match(path)
        if m is None:
            raise ValueError(
                "Pubsub topic is not in projects/<project_id>/topics/<name> "
                f"format: {path}")
        project, name = m.group(1), m.group(2)
        _validate_project(project)
        _validate_name(name)
        return PubsubTopic(project, name)

    def as_path(self) -> str:
        return f"projects/{self.project}/topics/{self.topic}"


def message_schema() -> T.StructType:
    """The PubsubMessage wire model (readMessagesWithAttributes,
    PubsubIO.java:456): payload + attributes + server-assigned id and
    publish time."""
    return T.StructType([
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("attributes",
                      T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("message_id", T.StringType(), True),
        T.StructField("publish_ts", T.TimestampType(), True),
    ])


def extract_timestamp_col(timestamp_attribute: Optional[str] = None,
                          attributes_col: str = "attributes",
                          publish_ts_col: str = "publish_ts") -> Column:
    """PubsubClient.extractTimestamp (PubsubClient.java:96-118) as a
    Column: with ``timestamp_attribute``, the attribute value parsed as
    ms-since-epoch, else RFC-3339; a missing or unparseable value FAILS
    the query (checkArgument parity — silent nulls would silently
    re-time elements).  Without, the publish timestamp."""
    if timestamp_attribute is None:
        return F.col(publish_ts_col).alias("event_ts")
    v = F.col(attributes_col).getItem(timestamp_attribute)
    # RFC-3339 parity with Instant.parse: ANY number of fractional
    # digits (0-9) must parse, not just exactly 3, and the 'T'/'Z'
    # designators are CASE-INSENSITIVE (ISO_INSTANT parses either
    # case).  Gate on an RFC-3339 shape (date'T'time, zone REQUIRED),
    # upper-case the designators, normalize the fraction to Spark's
    # microsecond precision, then cast — the cast itself accepts Z and
    # ±hh:mm offsets.
    is_rfc3339 = v.rlike(
        r"^\d{4}-\d{2}-\d{2}[Tt]\d{2}:\d{2}:\d{2}(\.\d{1,9})?"
        r"([Zz]|[+-]\d{2}:\d{2})$")
    frac_norm = F.regexp_replace(F.upper(v), r"(\.\d{1,6})\d*", r"$1")
    parsed = F.coalesce(
        F.timestamp_millis(v.try_cast("long")),
        F.when(is_rfc3339, frac_norm.try_cast("timestamp")),
    )
    return F.when(parsed.isNotNull(), parsed).otherwise(
        F.raise_error(F.concat(
            F.lit(f"Cannot interpret value of attribute {timestamp_attribute}"
                  " as timestamp: "),
            F.coalesce(v, F.lit("<missing>"))))
    ).alias("event_ts")


def with_event_timestamps(df: DataFrame,
                          timestamp_attribute: Optional[str] = None) -> DataFrame:
    """Attach ``event_ts`` per the timestampAttribute contract."""
    return df.withColumn("event_ts", extract_timestamp_col(timestamp_attribute))


def deduplicate_by_id(df: DataFrame, id_attribute: Optional[str] = None,
                      within: str = "10 minutes",
                      event_time: str = "event_ts") -> DataFrame:
    """The idAttribute exactly-once contract (PubsubIO.java:668-678:
    duplicate ids among messages are ignored): keep one row per id.

    Streaming input: ``dropDuplicatesWithinWatermark`` — state expires
    after ``within`` past the watermark, the same bounded-dedup-horizon
    the reference's PubsubUnboundedSource keeps; batch: plain
    ``dropDuplicates`` (exact).  Without ``id_attribute`` the
    server-assigned ``message_id`` is the key (redelivery dedup only).
    """
    id_col = (F.col("attributes").getItem(id_attribute)
              if id_attribute else F.col("message_id"))
    out = df.withColumn("__psid__", id_col)
    if out.isStreaming:
        out = (out.withWatermark(event_time, within)
               .dropDuplicatesWithinWatermark(["__psid__"]))
    else:
        out = out.dropDuplicates(["__psid__"])
    return out.drop("__psid__")


def read_pubsub(spark: SparkSession, subscription: Optional[str] = None,
                topic: Optional[str] = None,
                timestamp_attribute: Optional[str] = None,
                id_attribute: Optional[str] = None,
                emulation_spool: Optional[str] = None,
                dedup_within: str = "10 minutes") -> DataFrame:
    """PubsubIO.readMessages[WithAttributes] (PubsubIO.java:443,456).

    Exactly one of ``subscription`` / ``topic`` (fromSubscription /
    fromTopic, PubsubIO.java:585,614 — same exclusivity check).  With
    ``emulation_spool`` the messages come from a JSON spool in the
    message schema (the ``TestStream`` harness); otherwise there is no
    OSS direct transport and the documented bridges raise.
    """
    if (subscription is None) == (topic is None):
        raise ValueError("exactly one of subscription / topic is required")
    if subscription is not None:
        PubsubSubscription.from_path(subscription)
    else:
        PubsubTopic.from_path(topic)
    if emulation_spool is None:
        raise NotImplementedError(
            "No first-party Spark connector for Cloud Pub/Sub exists. "
            "Route the stream through the Pub/Sub Kafka connector "
            "(streaming.sources.kafka_stream) or a GCS landing zone "
            "(streaming.sources.file_stream), or pass emulation_spool= "
            "for the TestStream-backed harness.")
    sdf = (spark.readStream.schema(message_schema())
           .option("maxFilesPerTrigger", 1).json(emulation_spool))
    sdf = with_event_timestamps(sdf, timestamp_attribute)
    if id_attribute is not None:
        sdf = deduplicate_by_id(sdf, id_attribute, within=dedup_within)
    return sdf


def to_pubsub_messages(df: DataFrame, payload_col: str,
                       attribute_cols: Optional[list[str]] = None,
                       timestamp_attribute: Optional[str] = None,
                       event_time: Optional[str] = None) -> DataFrame:
    """PubsubIO.writeMessages/writeStrings (PubsubIO.java:503,511):
    shape rows into the message model.  With ``timestamp_attribute``
    the event time is mirrored into that attribute as ms-since-epoch
    (the write-side half of the timestampAttribute contract)."""
    attribute_cols = attribute_cols or []
    pairs: list[Column] = []
    for c in attribute_cols:
        pairs += [F.lit(c), F.col(c).cast("string")]
    if timestamp_attribute is not None:
        if event_time is None:
            raise ValueError("timestamp_attribute requires event_time")
        pairs += [F.lit(timestamp_attribute),
                  (F.unix_micros(F.col(event_time).cast("timestamp"))
                   / F.lit(1000)).cast("long").cast("string")]
    attrs = F.create_map(*pairs) if pairs else F.lit(None).cast(
        "map<string,string>")
    return df.select(
        F.col(payload_col).cast("binary").alias("payload"),
        attrs.alias("attributes"))
