from formula1_data_pipeline_spark.streaming.windowed import (
    stream_windowed_agg,
)

__all__ = ["stream_windowed_agg"]
