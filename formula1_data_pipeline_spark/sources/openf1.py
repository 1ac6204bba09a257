"""OpenF1-shaped REST ingest (S1-S3, O1-O3, P5-P7) behind an interface.

The reference fetches ``https://api.openf1.org/v1/{endpoint}?session_
key=...`` per session (``dags/open_f1_historical.py:48-57``) and
normalizes with pandas. Here the HTTP client is an interface so tests
(and this offline container) feed recorded JSON; normalization is
Spark-native:

- **records_to_raw_df** (S3+F10-F12): list-of-dicts -> all-string
  DataFrame — union of keys becomes columns, nested values JSON-encode,
  null-sentinel strings scrub to NULL. This is the reference's
  ``pd.DataFrame`` + ``clean_df`` collapsed into one createDataFrame +
  column expressions.
- **select_latest_session** (O1+O2): top-1 by (Race-beats-Qualifying,
  latest date) — ``dags/open_f1_realtime.py:208-217``.
- **session_window_filter** (P5+P6+P7): 120-day window, session-type
  IN-list, exclude-latest — ``dags/open_f1_historical.py:174-220``.
- **ingest_session_endpoints**: the per-session fetch loop (S1) with
  key-injection defaults (F17) — ``dags/open_f1_historical.py:254-270``.

The API returns a few thousand rows per session — driver-side fetch +
createDataFrame is the right scale boundary; the heavy lifting starts
once rows are parquet.
"""

from __future__ import annotations

import json
import logging
import threading
import time
from collections.abc import Iterable, Mapping
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from formula1_data_pipeline_spark.functions.cleaning import scrub_dataframe

ENDPOINTS = ("laps", "intervals", "position", "race_control")
SESSION_TYPES = ("Race", "Qualifying")

# serializes the scoped Arrow-conf save/convert/restore in
# records_to_raw_df — session conf is process-global
_ARROW_CONF_LOCK = threading.Lock()


class OpenF1Client(Protocol):
    """S1/S2 fetch surface; implementations return parsed JSON lists."""

    def fetch(self, endpoint: str, **params: object) -> list[dict]: ...


class HttpClient:
    """Live adapter for the ``OpenF1Client`` protocol — the actual
    OpenF1 REST API (or any base URL speaking its shape).

    Semantics follow the reference fetch
    (``dags/open_f1_historical.py:48-57``): GET
    ``{base}/{endpoint}?{params}`` with a per-request timeout; HTTP 200
    parses as JSON, anything else logs and yields ``[]``; transport
    errors and garbage JSON also degrade to ``[]`` rather than raising,
    so one bad session never aborts a backfill sweep. On top of the
    reference behavior, *transient* failures (connection/timeout
    errors, 429/5xx) get a bounded exponential-backoff retry — at
    cluster scale a thousand-session backfill will hit transient
    blips, and silently recording them as empty sessions is the wrong
    default. Non-transient statuses (4xx) never retry.

    Pair with ``RateLimitedClient`` for pacing; this class holds no
    mutable state after construction, so concurrent ``fetch`` calls
    are safe.
    """

    _TRANSIENT = frozenset({429, 500, 502, 503, 504})

    def __init__(
        self,
        base_url: str = "https://api.openf1.org/v1",
        timeout_sec: float = 30.0,
        retries: int = 2,
        backoff_sec: float = 0.5,
        sleep=None,
    ):
        import requests  # gated: only the live adapter needs it

        self._requests = requests
        self._base = base_url.rstrip("/")
        self._timeout = float(timeout_sec)
        self._retries = int(retries)
        self._backoff = float(backoff_sec)
        self._sleep = sleep if sleep is not None else time.sleep
        self._log = logging.getLogger(__name__)

    def fetch(self, endpoint: str, **params: object) -> list[dict]:
        url = f"{self._base}/{endpoint}"
        for attempt in range(self._retries + 1):
            try:
                r = self._requests.get(url, params=params,
                                       timeout=self._timeout)
            except self._requests.RequestException as e:
                if attempt < self._retries:
                    self._sleep(self._backoff * (2 ** attempt))
                    continue
                self._log.warning("fetch error for %s: %s", endpoint, e)
                return []
            if r.status_code == 200:
                try:
                    payload = r.json()
                except ValueError:
                    self._log.warning(
                        "fetch %s: HTTP 200 with unparseable JSON", endpoint
                    )
                    return []
                if not isinstance(payload, list):
                    self._log.warning(
                        "fetch %s: expected JSON list, got %s",
                        endpoint, type(payload).__name__,
                    )
                    return []
                return payload
            if r.status_code in self._TRANSIENT and attempt < self._retries:
                self._sleep(self._backoff * (2 ** attempt))
                continue
            self._log.warning("fetch %s: HTTP %s", endpoint, r.status_code)
            return []
        return []


class RecordedClient:
    """Test/offline client serving recorded payloads keyed by
    (endpoint, frozenset(params))."""

    def __init__(self, recordings: Mapping[str, list[dict]]):
        # key: "endpoint" or "endpoint?k=v&k2=v2" (sorted params)
        self._rec = dict(recordings)

    def fetch(self, endpoint: str, **params: object) -> list[dict]:
        if params:
            qs = "&".join(f"{k}={params[k]}" for k in sorted(params))
            key = f"{endpoint}?{qs}"
            if key in self._rec:
                return self._rec[key]
        return self._rec.get(endpoint, [])


def _cell_to_str(v: object) -> str | None:
    """F11+F12: None stays NULL, nested JSON-encodes, rest str()."""
    if v is None:
        return None
    if isinstance(v, (list, dict)):
        return json.dumps(v)
    if isinstance(v, bool):
        return str(v)  # Python str(True) = 'True', reference parity
    return str(v)


def records_to_raw_df(
    spark: SparkSession,
    records: Iterable[Mapping[str, object]],
    inject: Mapping[str, object] | None = None,
) -> DataFrame | None:
    """S3: JSON records -> all-string DataFrame (None if no records,
    mirroring the reference's empty-DataFrame short-circuit at
    ``dags/open_f1_historical.py:126-128``).

    ``inject`` adds missing columns with a constant (F17 key
    injection) — only applied where the record lacks the key.
    """
    records = list(records)
    if not records:
        return None
    inject = dict(inject or {})
    cols: list[str] = []
    seen = set()
    for r in records:
        for k in r:
            if k not in seen:
                seen.add(k)
                cols.append(k)
    for k in inject:
        if k not in seen:
            seen.add(k)
            cols.append(k)
    rows = [
        tuple(
            _cell_to_str(r.get(c, inject.get(c)))
            for c in cols
        )
        for r in records
    ]
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in cols]
    )
    # Arrow-backed pandas conversion lands the batch as a JVM
    # LocalRelation: every downstream job (the landing merges, the
    # gate probes) evaluates it JVM-side with zero Python workers —
    # measured ~3x faster per action than the Python-RDD path the
    # plain list createDataFrame takes, across every ingest query.
    try:
        import pandas as pd

        # get_spark() pins this at build; only externally-supplied
        # sessions need it, and check-before-set keeps a hot ingest
        # loop from re-writing session conf on every batch. The
        # pandas->LocalRelation conversion is eager, so the setting
        # can be scoped: restore the caller's value before returning
        # rather than leaking a session-global mutation. The
        # save/convert/restore runs under a process lock — session
        # conf is process-global, and two concurrent conversions (or
        # the threaded registry build running alongside an ingest)
        # could otherwise unset the flag out from under each other
        # mid-conversion.
        arrow_key = "spark.sql.execution.arrow.pyspark.enabled"
        if spark.conf.get(arrow_key, None) == "true":
            # fast path (the get_spark default): no conf mutation
            # needed, so no lock — concurrent ingest conversions and
            # the threaded registry build stay parallel. Benign race
            # (r5 review, accepted): this unlocked read can observe a
            # transient "true" set by a concurrent slow-path thread
            # that restores the conf before our createDataFrame runs;
            # the conversion then silently skips Arrow. Values are
            # identical either way (both paths build the same
            # LocalRelation) — the cost is one slower conversion in a
            # window that requires an externally-supplied session
            # with Arrow off racing a get_spark-default one, which no
            # in-repo caller creates.
            local = spark.createDataFrame(
                pd.DataFrame(rows, columns=cols, dtype=object), schema
            )
        else:
            with _ARROW_CONF_LOCK:
                prev = spark.conf.get(arrow_key, None)
                try:
                    if prev != "true":
                        spark.conf.set(arrow_key, "true")
                    local = spark.createDataFrame(
                        pd.DataFrame(rows, columns=cols, dtype=object),
                        schema,
                    )
                finally:
                    if prev != "true":
                        if prev is None:
                            spark.conf.unset(arrow_key)
                        else:
                            spark.conf.set(arrow_key, prev)
    except ImportError:  # pandas-less fallback: same values, slower
        local = spark.createDataFrame(rows, schema)
    return scrub_dataframe(local)


def normalize_intervals(df: DataFrame) -> DataFrame:
    """F13+F14 applied to the intervals endpoint
    (``dags/open_f1_historical.py:81-107``): ``driver_number`` through
    the int-or-none parse, ``gap_to_leader`` through the lap-gap
    parser — each only if the column exists (API payloads drift)."""
    from formula1_data_pipeline_spark.functions.cleaning import (
        parse_lap_gap,
        to_int_or_none_str,
    )

    out = df
    if "driver_number" in df.columns:
        out = out.withColumn(
            "driver_number", to_int_or_none_str(F.trim(F.col("driver_number")))
        )
    if "gap_to_leader" in df.columns:
        out = out.withColumn(
            "gap_to_leader", parse_lap_gap(F.trim(F.col("gap_to_leader")))
        )
    return out


def normalize_sessions(df: DataFrame) -> DataFrame:
    """F15+F16+F17 for the sessions catalog
    (``dags/open_f1_historical.py:190-201``): coerce the end/start
    timestamp (NULL on garbage), default ``meeting_name`` to
    'Unknown GP' (creating the column if the API omitted it) and
    ``session_name`` to 'Unknown'."""
    out = df
    time_col = "date_end" if "date_end" in df.columns else "date_start"
    out = out.withColumn(time_col, F.col(time_col).try_cast("timestamp"))
    if "meeting_name" not in out.columns:
        out = out.withColumn("meeting_name", F.lit("Unknown GP"))
    else:
        out = out.fillna({"meeting_name": "Unknown GP"})
    name_col = (
        "session_name" if "session_name" in out.columns else "session_type"
    )
    out = out.fillna({name_col: "Unknown"})
    return out


def session_window_filter(
    sessions: DataFrame,
    cutoff: str,
    now: str,
    date_col: str = "date_end",
    exclude_session_key: int | None = None,
) -> DataFrame:
    """P5+P6+P7: completed Race/Qualifying sessions inside the load
    window, minus the one reserved for the realtime leg."""
    out = sessions.filter(
        (F.col(date_col) >= F.lit(cutoff).cast("timestamp"))
        & (F.col(date_col) <= F.lit(now).cast("timestamp"))
        & F.col("session_name").isin(*SESSION_TYPES)
    )
    if exclude_session_key is not None:
        out = out.filter(F.col("session_key") != F.lit(exclude_session_key))
    return out


def select_latest_session(sessions: DataFrame,
                          date_col: str = "date_end") -> DataFrame:
    """O1+O2: the single latest completed session, Race beating
    Qualifying, newest winning ties — TakeOrderedAndProject, no global
    sort (``dags/open_f1_realtime.py:208-217``)."""
    from formula1_data_pipeline_spark.operators.topk import top1_by_priority

    with_prio = sessions.withColumn(
        "type_priority",
        F.when(F.col("session_name") == "Race", 1).otherwise(0),
    )
    return top1_by_priority(
        with_prio,
        order=[F.desc("type_priority"), F.desc(date_col),
               F.desc("session_key")],
    )


def ingest_session_endpoints(
    spark: SparkSession,
    client: OpenF1Client,
    session_key: int,
    meeting_key: int | None = None,
    year: int | None = None,
    endpoints: Iterable[str] = ENDPOINTS,
) -> dict[str, DataFrame]:
    """S1 per-session fetch across endpoints -> raw all-string frames
    with injected keys (F17). Empty endpoints are omitted."""
    out: dict[str, DataFrame] = {}
    inject = {"session_key": session_key}
    if meeting_key is not None:
        inject["meeting_key"] = meeting_key
    if year is not None:
        inject["year"] = year
    for ep in endpoints:
        df = records_to_raw_df(
            spark, client.fetch(ep, session_key=session_key), inject=inject
        )
        if df is not None:
            if ep == "intervals":
                df = normalize_intervals(df)
            out[ep] = df
    return out
