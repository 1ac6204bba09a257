from formula1_data_pipeline_spark.streaming.enrich import (
    stream_static_join_agg,
)
from formula1_data_pipeline_spark.streaming.joins import (
    stream_stream_interval_join,
)
from formula1_data_pipeline_spark.streaming.neardup import (
    stream_neardup_dedup,
)
from formula1_data_pipeline_spark.streaming.rest import (
    RateLimitedClient,
    batch_rest_ingest,
    stream_rest_ingest,
)
from formula1_data_pipeline_spark.streaming.stateful import (
    stateful_first_seen,
    stream_stateful_dedup,
)
from formula1_data_pipeline_spark.streaming.upsert import (
    stream_merge_upsert,
)
from formula1_data_pipeline_spark.streaming.windowed import (
    stream_windowed_agg,
)

__all__ = [
    "RateLimitedClient",
    "batch_rest_ingest",
    "stateful_first_seen",
    "stream_merge_upsert",
    "stream_neardup_dedup",
    "stream_rest_ingest",
    "stream_static_join_agg",
    "stream_stateful_dedup",
    "stream_stream_interval_join",
    "stream_windowed_agg",
]
