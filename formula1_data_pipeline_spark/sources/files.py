"""File-format source/sink surface beyond parquet — CSV and JSON-lines.

The reference's only file-ish boundary is REST JSON payloads; a
complete engine also needs interchange formats users actually hand it.
These helpers pin the options that make round-trips lossless:

- **timestamps** written as ``yyyy-MM-dd HH:mm:ss.SSSSSS`` (CSV's
  default format truncates to milliseconds — microsecond parquet
  values would silently change);
- **doubles** survive because Spark writes shortest-round-trip decimal
  representations and parses them back to the identical bits;
- **schema is explicit on read** (never inferred) — inference is a
  second full pass over the data at scale AND can demote types.

q15 gates a parquet→CSV→parquet round-trip against an oracle that
never saw the CSV, proving value faithfulness end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )


def read_jsonl(spark: SparkSession, path: str,
               schema: StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )
