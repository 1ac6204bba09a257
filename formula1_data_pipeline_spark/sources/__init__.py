from formula1_data_pipeline_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)
from formula1_data_pipeline_spark.sources.openf1 import (
    HttpClient,
    RecordedClient,
    ingest_session_endpoints,
    normalize_intervals,
    normalize_sessions,
    records_to_raw_df,
    select_latest_session,
    session_window_filter,
)
from formula1_data_pipeline_spark.sources.sinks import (
    append_raw,
    merge_upsert,
    replace_by_key,
    skip_loaded,
)
from formula1_data_pipeline_spark.sources.txn import (
    current_version,
    is_txn_table,
    read_table,
    txn_append,
    txn_compact,
    txn_merge,
    txn_replace,
    vacuum,
)

__all__ = [
    "HttpClient",
    "RecordedClient",
    "append_raw",
    "current_version",
    "is_txn_table",
    "read_table",
    "txn_append",
    "txn_compact",
    "txn_merge",
    "txn_replace",
    "vacuum",
    "bucketed_join",
    "write_bucketed",
    "ingest_session_endpoints",
    "merge_upsert",
    "normalize_intervals",
    "normalize_sessions",
    "records_to_raw_df",
    "replace_by_key",
    "select_latest_session",
    "session_window_filter",
    "skip_loaded",
]
