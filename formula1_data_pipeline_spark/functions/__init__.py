from formula1_data_pipeline_spark.functions.cleaning import (  # noqa: F401
    NULL_SENTINELS,
    clean_null_sentinels,
    nullif_none,
    parse_lap_gap,
    scrub_dataframe,
    sector_to_double,
    stringify_all,
    to_int_or_none_str,
    try_cast,
)
