from pyrope_spark.streaming.curation import (  # noqa: F401
    streaming_dedup_to_corpus,
)
from pyrope_spark.streaming.ingest import (  # noqa: F401
    stream_upsert_to_store,
    streaming_latency_slo,
    streaming_write_heat,
)
