"""Kafka config parity (no broker): the claim in streaming/windows.py
— "at scale the same code points at a Kafka source" — checked, not
asserted. The wire decode must reproduce the exact events schema, the
windowed aggregation graph must build unchanged on a STREAMING source
of that shape, and the reader spec must be constructible config-only.
"""

from __future__ import annotations

import pyspark.sql.utils
from pyspark.sql import functions as F

from map_reduce_sf_crime_spark.sources import kafka
from map_reduce_sf_crime_spark.sources.parquet import load_events
from map_reduce_sf_crime_spark.streaming.windows import _tumbling_agg

from .conftest import SF_SMOKE


def _wire_shape(df):
    """Project any frame into the Kafka record shape (binary value of
    JSON rows + the metadata columns the real source carries)."""
    return df.select(
        F.to_json(
            F.struct(*df.columns), {"timestampFormat": kafka.WIRE_TS_FORMAT}
        )
        .cast("binary")
        .alias("value"),
        F.lit(None).cast("binary").alias("key"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
    )


def test_decode_roundtrips_events_schema(spark):
    """decode(wire(events)) == events, column for column — so every
    operator downstream of the decode sees the parquet-loaded schema
    exactly."""
    ev = load_events(spark, SF_SMOKE)
    decoded = kafka.decode_events(_wire_shape(ev))
    assert decoded.schema == ev.schema
    a = {tuple(r) for r in ev.collect()}
    b = {tuple(r) for r in decoded.collect()}
    assert a == b


def test_windowed_agg_graph_builds_on_streaming_kafka_shape(spark):
    """The tumbling aggregation must accept a STREAMING wire-decoded
    source: rate source → wire shape → decode → window agg. Schema
    analysis forces full plan resolution; isStreaming proves the graph
    is a genuine streaming query, not a batch fallback."""
    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    )
    synthetic = rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 5).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.col("value").cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )
    agg = _tumbling_agg(kafka.decode_events(_wire_shape(synthetic)))
    assert agg.isStreaming
    batch_agg = _tumbling_agg(load_events(spark, SF_SMOKE))
    # names + types must agree; nullability legitimately differs
    # (JSON-decoded fields are nullable, parquet columns may not be)
    assert agg.schema.simpleString() == batch_agg.schema.simpleString()


def test_kafka_reader_spec_and_load_paths(spark):
    """Reader-spec construction is config-only and must always work.
    ``.load()`` needs the connector jar: with it absent Spark raises
    its data-source-not-found analysis error (asserted to mention
    kafka); with it present the loaded frame must decode to the events
    schema — both environments get a meaningful check, neither needs
    a broker."""
    reader = kafka.kafka_events_reader(spark, "broker:9092", "events")
    try:
        wire = reader.load()
    except pyspark.sql.utils.AnalysisException as e:
        assert "kafka" in str(e).lower()
        return
    decoded = kafka.decode_events(wire)
    assert decoded.isStreaming
    ev = load_events(spark, SF_SMOKE)
    assert decoded.schema == ev.schema


def test_undecodable_records_dropped_and_counted(spark):
    """A corrupt record must not become an all-NULL events row (which
    would silently vanish from windows downstream): it is dropped from
    the decode and visible in undecodable_count."""
    ev = load_events(spark, SF_SMOKE).limit(3)
    wire = _wire_shape(ev)
    corrupt = spark.createDataFrame(
        [("{truncated", ), (None, )], "value string"
    ).select(
        F.col("value").cast("binary").alias("value"),
        F.lit(None).cast("binary").alias("key"),
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.lit(0).cast("long").alias("offset"),
    )
    mixed = wire.unionByName(corrupt)
    decoded = kafka.decode_events(mixed)
    assert decoded.count() == 3
    assert decoded.filter(F.col("event_id").isNull()).count() == 0
    assert kafka.undecodable_count(mixed).first()[0] == 2

    # same-pass observability: the drop count publishes as an observed
    # metric on the decode itself (no second scan of the source)
    from pyspark.sql import Observation

    obs = Observation()
    observed = kafka.decode_events(mixed, observation=obs)
    assert observed.count() == 3
    assert obs.get["n_undecodable"] == 2
