from pyrope_spark.streaming.curation import (  # noqa: F401
    streaming_dedup_to_corpus,
    streaming_neardup_to_corpus,
)
from pyrope_spark.streaming.ingest import (  # noqa: F401
    stream_upsert_to_store,
    streaming_latency_slo,
    streaming_sessionize,
    streaming_write_heat,
)
from pyrope_spark.streaming.sketches import (  # noqa: F401
    streaming_attribution_join,
    streaming_ewma,
    streaming_bottomk_update,
    streaming_cms_update,
    streaming_hll_update,
)
