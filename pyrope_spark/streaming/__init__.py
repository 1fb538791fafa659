from pyrope_spark.streaming.ingest import (  # noqa: F401
    stream_upsert_to_store,
    streaming_latency_slo,
    streaming_write_heat,
)
