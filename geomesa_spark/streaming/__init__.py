"""Streaming layer: the Kafka datastore's live feature cache re-expressed
as Structured Streaming stateful processing."""

from geomesa_spark.streaming.upsert import (  # noqa: F401
    latest_by_key,
    upsert_stream,
)
