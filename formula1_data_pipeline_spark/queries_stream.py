"""q3x — streaming + multimodal catalog entries (SURVEY.md §2.10/§2.12).

q30 exercises the opaque-binary media path end-to-end (pack → Arrow
mapInPandas decode/feature batches); q31 runs a REAL Structured
Streaming query (file source → watermark → tumbling window agg →
AvailableNow → memory sink) whose append-mode emission rule
(window_end <= max event time - delay) the oracle reproduces in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.queries import load, register


@register(
    "q30_multimodal_features",
    """
    SELECT doc_id AS media_id,
           'text/plain' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
    doc="Multimodal binary-column plumbing (§2.12): pack text to opaque "
        "binary payloads, then Arrow-batched mapInPandas decode + "
        "feature extraction (byte length, content md5). The codec stub "
        "is the only fake; schema/batching/UDF shape are production-real",
)
def q30_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.operators.multimodal import (
        extract_features,
        to_media_table,
    )

    docs = load(spark, sf_dir, "documents")["documents"]
    return extract_features(to_media_table(docs))


@register(
    "q31_stream_windowed_agg",
    """
    WITH ev AS (
        SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
    ), m AS (
        SELECT max(ts) AS max_ts FROM ev
    ), hs AS (
        SELECT event_type,
               CAST(round(CAST(value AS DOUBLE) * 1000000) AS BIGINT)
                   AS vs
        FROM events WHERE value IS NOT NULL
    ), hb AS (
        SELECT event_type,
               CASE WHEN vs > 0 THEN 1 WHEN vs < 0 THEN -1 ELSE 0 END
                   AS cls,
               abs(vs) AS mag
        FROM hs
    ), hm AS (
        SELECT event_type, cls, mag,
               CAST(CASE WHEN mag > 0 THEN length(bin(mag)) - 1
                    ELSE 0 END AS INT) AS msb
        FROM hb
    ), hhist AS (
        SELECT event_type,
               cls * ((mag >> greatest(0, msb - 3))
                      << greatest(0, msb - 3)) AS rep,
               CAST(count(*) AS BIGINT) AS cnt
        FROM hm GROUP BY ALL
    ), hr AS (
        SELECT event_type, rep,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY rep
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               SUM(cnt) OVER (PARTITION BY event_type) AS tot
        FROM hhist
    ), hq AS (
        SELECT event_type,
               MIN(CASE WHEN cum >= ceil(CAST(0.5 AS DECIMAL(20,12))
                   * tot) THEN rep END) AS p50_approx,
               MIN(CASE WHEN cum >= ceil(CAST(0.95 AS DECIMAL(20,12))
                   * tot) THEN rep END) AS p95_approx,
               MIN(CASE WHEN cum >= ceil(CAST(0.99 AS DECIMAL(20,12))
                   * tot) THEN rep END) AS p99_approx
        FROM hr GROUP BY event_type
    )
    SELECT 'window' AS kind,
           time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
               AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_value,
           CAST(NULL AS BIGINT) AS p50_approx,
           CAST(NULL AS BIGINT) AS p95_approx,
           CAST(NULL AS BIGINT) AS p99_approx
    FROM ev, m
    GROUP BY 2, 3, 4, m.max_ts
    HAVING window_end <= max_ts - INTERVAL '10 minutes'
    UNION ALL
    SELECT 'histq', CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
           event_type, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
           p50_approx, p95_approx, p99_approx
    FROM hq
    """,
    doc="Structured Streaming aggregation surface, two kinds. "
        "kind='window' (§2.10 upgrade): parquet file stream -> "
        "withWatermark(10 min) -> 1h window count/sum -> AvailableNow "
        "-> memory sink. Append mode emits exactly the windows closed "
        "by the final watermark, which the oracle's HAVING clause "
        "mirrors. kind='histq' (round 12, streaming/histogram.py::"
        "stream_quantile_histogram): the STREAMING mergeable quantile "
        "histogram — events replayed as 3 file micro-batches, each "
        "folding its bucket deltas into manifest-txn state "
        "(sum-mergeable, so the landed state equals the one-shot "
        "quality.quantile_histogram build under ANY split — the q88 "
        "convergence contract); the gated rows are the per-group "
        "p50/p95/p99 rank picks over the LANDED state, identical to "
        "q78's batch approx columns by construction, all integer "
        "bucket math under the full value hash",
)
def q31_stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.operators.quality import (
        histogram_quantiles,
    )
    from formula1_data_pipeline_spark.streaming import stream_windowed_agg
    from formula1_data_pipeline_spark.streaming.histogram import (
        stream_quantile_histogram,
    )

    from formula1_data_pipeline_spark.concurrency import overlap

    nul_l = F.lit(None).cast("bigint")

    def window_leg() -> DataFrame:
        return stream_windowed_agg(
            spark, f"{sf_dir}/events.parquet"
        ).select(
            F.lit("window").alias("kind"),
            "window_start", "window_end", "event_type",
            "n_events", "sum_value",
            nul_l.alias("p50_approx"),
            nul_l.alias("p95_approx"),
            nul_l.alias("p99_approx"),
        )

    def histq_leg() -> DataFrame:
        state = stream_quantile_histogram(
            spark, f"{sf_dir}/events.parquet", "value", ["event_type"],
        )
        return histogram_quantiles(
            state, ["event_type"], [0.5, 0.95, 0.99],
        ).select(
            F.lit("histq").alias("kind"),
            F.lit(None).cast("timestamp").alias("window_start"),
            F.lit(None).cast("timestamp").alias("window_end"),
            "event_type",
            nul_l.alias("n_events"),
            F.lit(None).cast("double").alias("sum_value"),
            "p50_approx", "p95_approx", "p99_approx",
        )

    # two independent bounded replays of the same source — overlap
    # their micro-batch chains (guide §2.6; r14 optimization)
    win, histq = overlap(spark, [
        ("q31: windowed agg stream", window_leg),
        ("q31: quantile-histogram stream", histq_leg),
    ])
    return win.unionByName(histq)


@register(
    "q35_stream_stateful_dedup",
    """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id
               ) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
    doc="Custom stateful streaming operator under the gate (§2.10): "
        "applyInPandasWithState first-seen dedup — per-user state holds "
        "the set of already-emitted event_types (hashed longs, bounded "
        "by subkey cardinality, not stream length), each micro-batch "
        "emits only never-before-seen (user, type) rows. Run as a real "
        "stream (file source -> state store -> AvailableNow -> memory "
        "sink); over one bounded replay the emission equals the "
        "row_number()=1 first row per key, which the oracle replays",
)
def q35_stream_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.streaming import stream_stateful_dedup

    return stream_stateful_dedup(spark, f"{sf_dir}/events.parquet")


@register(
    "q36_stream_merge_upsert",
    """
    WITH ev AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
               event_type, value
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
    )
    SELECT user_id, event_type, event_id, ts, value
    FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM ev
    )
    WHERE rn = 1
    """,
    doc="Streaming upsert leg under the gate (§2.10, the reference's "
        "realtime DAG end-to-end): events replayed as a 4-file stream, "
        "each micro-batch landed via foreachBatch -> merge_upsert "
        "(staged-write + atomic rename) keyed by (user_id, event_type) "
        "with intrinsic latest-event-wins priority; landed table read "
        "back. The oracle computes the same argmax per key directly — "
        "batch split/order cannot change the converged state",
)
def q36_stream_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from formula1_data_pipeline_spark.streaming import stream_merge_upsert

    # 2 micro-batches, not the 4 default: multi-batch merge + the
    # converged-state property are proven at 2, and each AvailableNow
    # batch is a full sequential merge job — the r13 bench flagged
    # this gate as latency-dominated (2.45x floor on a contended
    # host); the module's own tests keep exercising deeper splits
    landed = stream_merge_upsert(spark, f"{sf_dir}/events.parquet",
                                 n_source_files=2)
    # landing is all-string (S4 semantics); cast back for comparison —
    # string->double/timestamp round-trips are exact (see q14 notes)
    return landed.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )


@register(
    "q32_sessionization",
    """
    WITH ev AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), flagged AS (
        SELECT *,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL '5 minutes'
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT *,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_no
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '5 minutes' AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
    doc="Gap-based sessionization via F.session_window (5-minute gap): "
        "the streaming-native session operator run in batch mode; the "
        "oracle derives identical sessions with the classic "
        "gaps-and-islands lag+cumsum formulation. Session end = last "
        "event + gap (Spark's session_window semantics)",
)
def q32_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = (
        load(spark, sf_dir, "events")["events"]
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    )
    return (
        ev.groupBy(F.session_window("ts", "5 minutes"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def _q54_drift_slice_sql(i: int, n: int) -> str:
    """One micro-batch's drift rows (batch ``i`` carries the
    ``doc_id % n == i`` slice — the monitor's deterministic file-per-
    slice replay): per-column TV of the slice's lang/source counts vs
    the FULL documents table's (the static reference), replaying
    ``streaming/drift.py::drift_vs_reference_counts`` exactly —
    6-dp share divides, null-safe value buckets, decimal delta sum."""
    return f"""
        SELECT 'drift' AS kind,
               CAST(NULL AS VARCHAR) AS c_mktsegment,
               CAST(NULL AS VARCHAR) AS event_type,
               CAST(NULL AS BIGINT) AS n_events,
               CAST(NULL AS DOUBLE) AS sum_value,
               CAST({i} AS BIGINT) AS batch_id,
               (SELECT count(*) FROM documents
                WHERE doc_id % {n} = {i}) AS n_rows,
               "column",
               count(*) AS n_values,
               CAST(sum(CAST(round(abs(share_old - share_new), 6)
                    AS DECIMAL(18,6))) AS DOUBLE) / 2.0 AS tv_distance,
               CAST(NULL AS BIGINT) AS am_sum,
               CAST(NULL AS BIGINT) AS am_min,
               CAST(NULL AS BIGINT) AS am_max,
               CAST(NULL AS DOUBLE) AS am_mean
        FROM (
            SELECT coalesce(rc."column", bc."column") AS "column",
                   round(coalesce(rc.cnt, 0)
                       / CAST((SELECT count(*) FROM documents)
                              AS DOUBLE), 6) AS share_old,
                   round(coalesce(bc.cnt, 0)
                       / CAST((SELECT count(*) FROM documents
                               WHERE doc_id % {n} = {i})
                              AS DOUBLE), 6) AS share_new
            FROM (
                SELECT "column", value, count(*) AS cnt FROM (
                    SELECT 'lang' AS "column",
                           CAST(lang AS VARCHAR) AS value
                    FROM documents
                    UNION ALL
                    SELECT 'source', CAST(source AS VARCHAR)
                    FROM documents
                ) GROUP BY 1, 2
            ) rc
            FULL OUTER JOIN (
                SELECT "column", value, count(*) AS cnt FROM (
                    SELECT 'lang' AS "column",
                           CAST(lang AS VARCHAR) AS value
                    FROM documents WHERE doc_id % {n} = {i}
                    UNION ALL
                    SELECT 'source', CAST(source AS VARCHAR)
                    FROM documents WHERE doc_id % {n} = {i}
                ) GROUP BY 1, 2
            ) bc
              ON rc."column" = bc."column"
              AND rc.value IS NOT DISTINCT FROM bc.value
        ) GROUP BY "column"
    """


_Q54_DRIFT_SLICES = 3


@register(
    "q54_stream_static_join",
    """
    WITH ev AS (
        SELECT event_id, user_id, event_type, value FROM events
    )
    SELECT 'join' AS kind, c.c_mktsegment, e.event_type,
           count(*) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_value,
           CAST(NULL AS BIGINT) AS batch_id,
           CAST(NULL AS BIGINT) AS n_rows,
           CAST(NULL AS VARCHAR) AS "column",
           CAST(NULL AS BIGINT) AS n_values,
           CAST(NULL AS DOUBLE) AS tv_distance,
           CAST(NULL AS BIGINT) AS am_sum,
           CAST(NULL AS BIGINT) AS am_min,
           CAST(NULL AS BIGINT) AS am_max,
           CAST(NULL AS DOUBLE) AS am_mean
    FROM ev e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 2, 3
    """ + "".join(
        "UNION ALL" + _q54_drift_slice_sql(i, _Q54_DRIFT_SLICES)
        for i in range(_Q54_DRIFT_SLICES)
    ) + """
    UNION ALL
    SELECT 'aggmart_stream', NULL, NULL, NULL, NULL, NULL,
           CAST(count(n_chars) AS BIGINT), source, NULL, NULL,
           CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT),
           CAST(min(n_chars) AS BIGINT),
           CAST(max(n_chars) AS BIGINT),
           CAST(sum(CAST(n_chars AS BIGINT)) AS DOUBLE)
             / CAST(count(n_chars) AS DOUBLE)
    FROM documents WHERE n_chars IS NOT NULL
    GROUP BY source
    """,
    doc="Stream-vs-static surface, two legs in one kind-discriminated "
        "frame. kind='join' (§2.10 extension): the events file stream "
        "enriched per micro-batch with the broadcast customer "
        "dimension (no stream-side state, dimension re-planned each "
        "batch), aggregated per (segment, type) in complete mode over "
        "an AvailableNow replay. kind='drift' (round 10, "
        "streaming/drift.py::stream_drift_monitor): the documents "
        "table replayed as 3 deterministic doc_id%3 file slices, one "
        "micro-batch each; every batch computes its lang/source "
        "distribution drift against the STATIC full-table reference "
        "(reference counts aggregated once, reused stream-static per "
        "batch — never rescanned) and manifest-appends per-column "
        "total-variation rows. The oracle replays both legs in batch "
        "SQL — over a bounded replay they are identical; the drift "
        "math (6-dp share divides, null-safe buckets, decimal TV "
        "sum) is shared verbatim with the q79 batch operator. "
        "kind='aggmart_stream' (round 12, streaming/aggmart.py::"
        "stream_agg_mart): the STREAMING maintainer of q79's "
        "aggregate mart — documents replayed as 3 file micro-batches, "
        "foreachBatch folding each through agg_mart_append with the "
        "stream's batch id as the mart's exactly-once batch id; the "
        "distributive (n, sum, min, max) fold makes the landed stats "
        "bit-for-bit the one-shot groupBy for ANY split, which the "
        "oracle replays directly over the source table ('column' "
        "carries the source grain, n_rows the count — the q79 long "
        "shape reused)",
)
def q54_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.scratch import scratch_dir
    from formula1_data_pipeline_spark.streaming import (
        stream_static_join_agg,
    )
    from formula1_data_pipeline_spark.streaming.aggmart import (
        stream_agg_mart,
    )
    from formula1_data_pipeline_spark.streaming.drift import (
        stream_drift_monitor,
    )

    from formula1_data_pipeline_spark.concurrency import overlap

    def join_leg() -> DataFrame:
        dim = load(spark, sf_dir, "customer")["customer"].select(
            "c_custkey", "c_mktsegment"
        )
        return stream_static_join_agg(
            spark, f"{sf_dir}/events.parquet", dim,
            dim_key="c_custkey", dim_attr="c_mktsegment",
        ).select(
            F.lit("join").alias("kind"),
            "c_mktsegment", "event_type", "n_events", "sum_value",
        )

    def drift_leg() -> DataFrame:
        docs = load(spark, sf_dir, "documents")["documents"]
        return stream_drift_monitor(
            spark, f"{sf_dir}/documents.parquet", docs,
            ["lang", "source"], n_source_files=_Q54_DRIFT_SLICES,
        ).select(
            F.lit("drift").alias("kind"),
            F.col("batch_id").cast("long").alias("batch_id"),
            F.col("n_rows").cast("long").alias("n_rows"),
            "column", "n_values", "tv_distance",
        )

    def aggmart_leg() -> DataFrame:
        return stream_agg_mart(
            spark, f"{sf_dir}/documents.parquet", ["source"],
            "n_chars", work_dir=scratch_dir(prefix="q54_sam_"),
        ).select(
            F.lit("aggmart_stream").alias("kind"),
            F.col("source").alias("column"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("sum_value").cast("long").alias("am_sum"),
            F.col("min_value").cast("long").alias("am_min"),
            F.col("max_value").cast("long").alias("am_max"),
            F.col("mean_value").alias("am_mean"),
        )

    # three independent bounded replays (disjoint sinks/work dirs) —
    # overlap their micro-batch chains (guide §2.6; r14 optimization)
    joined, monitor, sam = overlap(spark, [
        ("q54: stream-static join", join_leg),
        ("q54: drift monitor", drift_leg),
        ("q54: agg-mart stream", aggmart_leg),
    ])
    return joined.unionByName(
        monitor, allowMissingColumns=True
    ).unionByName(
        sam, allowMissingColumns=True
    ).select(
        "kind", "c_mktsegment", "event_type", "n_events", "sum_value",
        "batch_id", "n_rows", "column", "n_values", "tv_distance",
        "am_sum", "am_min", "am_max", "am_mean",
    )


@register(
    "q62_stream_stream_join",
    """
    WITH ev AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
    )
    SELECT l.user_id,
           l.event_id AS left_event_id,
           r.event_id AS right_event_id,
           l.ts AS left_ts,
           r.ts AS right_ts,
           CAST(epoch_us(r.ts) - epoch_us(l.ts) AS BIGINT) AS lag_micros
    FROM ev l
    JOIN ev r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts
     AND r.ts < l.ts + INTERVAL '6 hours'
    WHERE l.event_type = 'view' AND r.event_type = 'purchase'
    """,
    doc="Stream-stream interval join (§2.10 extension, the fourth "
        "streaming class): events replayed as TWO watermarked file "
        "streams (views, purchases) joined on user within a 6-hour "
        "event-time interval — the time-bound predicate plus both "
        "watermarks is what lets Spark evict join state, bounding it "
        "by rate x window instead of stream length. Append-mode inner "
        "join over the bounded replay equals the batch interval join "
        "the oracle runs",
)
def q62_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.streaming import (
        stream_stream_interval_join,
    )

    return stream_stream_interval_join(spark, f"{sf_dir}/events.parquet")


@register(
    "q69_stream_rest_ingest",
    """
    WITH sup AS (
        SELECT s_suppkey AS j FROM supplier WHERE s_suppkey <= 20
    ), polls AS (
        SELECT j, p.p
        FROM sup CROSS JOIN (VALUES (0), (1), (2), (3)) AS p(p)
        WHERE (j + p.p) % 3 <> 0
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY j ORDER BY p DESC) AS rn
        FROM polls
    )
    SELECT CAST(j AS VARCHAR) AS driver_number,
           CAST('9165' AS VARCHAR) AS session_key,
           60.0 + j / 4.0 + p AS lap_duration,
           CAST(p AS BIGINT) AS last_poll,
           CASE WHEN j % 5 = 0 THEN NULL ELSE 'OK' END AS status
    FROM ranked WHERE rn = 1
    """,
    doc="Streaming REST ingest leg (§2.10's idiomatic upgrade of the "
        "reference's realtime polling loop, dags/open_f1_realtime.py:"
        "249-263): a 4-poll schedule replayed one micro-batch per poll, "
        "each poll fetching recorded supplier-derived payloads through "
        "a RateLimitedClient, normalized by records_to_raw_df (S3 "
        "all-string landing + sentinel scrub + key/poll injection) and "
        "landed via foreachBatch -> merge_upsert (manifest-"
        "transactional, last-poll-wins intrinsic priority). Poll p "
        "carries suppliers with (j+p)%3 != 0, so polls overlap and "
        "later polls genuinely supersede earlier ones; the oracle "
        "replays the poll schedule and takes the max-poll row per key",
)
def q69_stream_rest_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from formula1_data_pipeline_spark.sources.openf1 import RecordedClient
    from formula1_data_pipeline_spark.streaming import (
        RateLimitedClient,
        stream_rest_ingest,
    )

    sup = (
        load(spark, sf_dir, "supplier")["supplier"]
        .filter(F.col("s_suppkey") <= 20)
        .select("s_suppkey").collect()
    )
    skey = 9165
    recordings = {}
    for p in range(4):
        recordings[f"laps?poll={p}&session_key={skey}"] = [
            {
                "driver_number": r.s_suppkey,
                "lap_duration": r.s_suppkey / 4 + 60.0 + p,
                "status": "None" if r.s_suppkey % 5 == 0 else "OK",
            }
            for r in sup
            if (r.s_suppkey + p) % 3 != 0
        ]
    # a small but REAL pacing interval so the production rate-limit
    # path (monotonic clock + sleep) runs under the gate; 4 polls
    # x 10 ms bounds the added wall at 30 ms
    client = RateLimitedClient(RecordedClient(recordings),
                               min_interval_sec=0.01)
    landed = stream_rest_ingest(
        spark, client, endpoint="laps", session_key=skey, n_polls=4,
        keys=["driver_number"],
    )
    return landed.select(
        F.col("driver_number"),
        F.col("session_key"),
        F.col("lap_duration").cast("double").alias("lap_duration"),
        F.col("poll").cast("long").alias("last_poll"),
        F.col("status"),
    )


#: q55 phash rider: every doc_id % 5 == 0 doc ALSO lands as a copy
#: (media_id + 10^9) with its first character replaced — one
#: perturbed pixel in the fake byte image, exactly the re-encode
#: noise perceptual hashes exist to survive
_Q55_AUG_OFFSET = 1_000_000_000


def _q55_sql() -> str:
    from formula1_data_pipeline_spark.operators import phash as P

    def hash_leg(kind: str) -> str:
        expr = {"ahash": P.ahash_expr,
                "dhash": P.dhash_expr}[kind]("hx", "h", duck=True)
        return f"""
    SELECT media_id, '{kind}' AS kind, CAST(-1 AS BIGINT) AS i,
           CAST(-1 AS BIGINT) AS j, CAST({expr} AS VARCHAR) AS val
    FROM mm WHERE h >= 1"""

    dh = P.dhash_expr("hx", "h", duck=True)
    return f"""
    WITH m AS (
        SELECT doc_id AS media_id, to_hex(encode(text)) AS hx,
               octet_length(encode(text)) AS nb
        FROM documents
    ), px AS (
        SELECT media_id,
               CAST(i.x AS BIGINT) AS i, CAST(j.x AS BIGINT) AS j,
               substring(hx,
                   2 * ((((i.x * (nb // 16)) // 4) * 16)
                        + ((j.x * 16) // 4)) + 1, 2) AS val
        FROM m
        CROSS JOIN (SELECT unnest(range(0, 4)) AS x) i
        CROSS JOIN (SELECT unnest(range(0, 4)) AS x) j
        WHERE nb // 16 >= 1
    ), fx AS (
        SELECT media_id, unnest(range(0, nb // 32)) AS fi, hx FROM m
    ), fr AS (
        SELECT media_id, CAST(fi AS BIGINT) AS i,
               md5(substring(hx, fi * 64 + 1, 64)) AS val
        FROM fx WHERE fi % 4 = 0
    ), mm AS (
        SELECT media_id, to_hex(encode(text)) AS hx,
               octet_length(encode(text)) // {P.SRC_W} AS h
        FROM (
            SELECT doc_id AS media_id, text FROM documents
            UNION ALL
            SELECT doc_id + {_Q55_AUG_OFFSET},
                   'X' || substring(text, 2)
            FROM documents WHERE doc_id % 5 = 0
        )
    ), hp AS (
        SELECT media_id, {dh} AS phash FROM mm WHERE h >= 1
    ), g AS (
        SELECT phash, min(media_id) AS cid,
               CAST(count(*) AS BIGINT) AS nd
        FROM hp GROUP BY 1
    ), sl AS (
        SELECT phash, cid, nd, s.x AS sidx,
               (phash >> (15 * s.x)) & 32767 AS skey
        FROM g CROSS JOIN (SELECT unnest(range(0, 4)) AS x) s
    ), pr AS (
        SELECT DISTINCT a.phash AS ap, b.phash AS bp,
               bit_count(xor(a.phash, b.phash)) AS hamming,
               a.cid AS acid, b.cid AS bcid, a.nd * b.nd AS npd
        FROM sl a JOIN sl b
          ON a.sidx = b.sidx AND a.skey = b.skey
         AND a.phash < b.phash
    )
    SELECT media_id, 'px' AS kind, i, j, val FROM px
    UNION ALL
    SELECT media_id, 'frame', i, CAST(-1 AS BIGINT), val FROM fr
    UNION ALL
    SELECT acid AS media_id, 'apair' AS kind,
           CAST(hamming AS BIGINT) AS i, CAST(bcid AS BIGINT) AS j,
           CAST(npd AS VARCHAR) AS val
    FROM pr WHERE hamming BETWEEN 1 AND 3
    UNION ALL{hash_leg("ahash")}
    UNION ALL{hash_leg("dhash")}
    """


@register(
    "q55_multimodal_transform",
    _q55_sql(),
    doc="Multimodal transforms (§2.12): nearest-neighbor resize (16-wide "
        "byte-grid fake image -> 4x4) and stride-4 frame sampling "
        "(32-byte fake frames) as Arrow mapInPandas over binary "
        "payloads — the real plumbing (schema, batch iteration, "
        "shuffle-free narrow plan) with the codec faked "
        "deterministically so every sampled byte and frame hash is "
        "verified byte-for-byte by the oracle's hex arithmetic. "
        "Round 13 (operators/phash.py): kind='ahash'/'dhash' 60-bit "
        "perceptual fingerprints — ONE codegen'd SQL expression each "
        "over the payload hex, no explode/shuffle/Python — plus "
        "kind='apair' hamming-pair rows (distance 1..3, dhash) over "
        "a deterministic near-dup augmentation (doc_id % 5 == 0 docs "
        "re-encoded with one perturbed leading pixel). Pairing rides "
        "the SAME pigeonhole slice blocking as text simhash "
        "(4 x 15-bit slices, candidates-only verify — never "
        "all-pairs; distance 3 < 4 slices keeps it complete), so "
        "image near-dup inherits the text path's 100 TB shape",
)
def q55_multimodal_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.operators import phash as P
    from formula1_data_pipeline_spark.operators.multimodal import (
        frame_sample,
        resize_nearest,
        to_media_table,
    )

    docs = load(spark, sf_dir, "documents")["documents"]
    media = to_media_table(docs)
    out = resize_nearest(media).unionByName(frame_sample(media))

    mutated = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + _Q55_AUG_OFFSET).alias("doc_id"),
            F.concat(F.lit("X"), F.expr("substring(text, 2)"))
            .alias("text"),
        )
    )
    media_aug = to_media_table(
        docs.select("doc_id", "text").unionByName(mutated))
    for kind in ("ahash", "dhash"):
        out = out.unionByName(P.phash_df(media_aug, kind).select(
            "media_id",
            F.lit(kind).alias("kind"),
            F.lit(-1).cast("long").alias("i"),
            F.lit(-1).cast("long").alias("j"),
            F.col("phash").cast("string").alias("val"),
        ))
    # dhash pairs at distance 3: the one-pixel augmentation moves at
    # most two gradient bits, and distance 3 is pigeonhole-complete
    # with the default 4 x 15 slicing
    pairs = P.phash_neardup_pairs(media_aug, "dhash",
                                  max_distance=3).select(
        F.col("a_canonical_id").alias("media_id"),
        F.lit("apair").alias("kind"),
        F.col("hamming").cast("long").alias("i"),
        F.col("b_canonical_id").cast("long").alias("j"),
        F.col("n_pair_docs").cast("string").alias("val"),
    )
    return out.unionByName(pairs)


#: q88 streaming-CMS leg sizing — the q65 gate constants (the
#: streamed counter state is bit-for-bit the one-shot table, so both
#: gates replay the SAME counter SQL)
_Q88_CMS_W_BITS = 8
_Q88_CMS_T = 40


def _q88_oracle() -> str:
    from formula1_data_pipeline_spark.queries_datapipe import (
        _CMS_HEAVY_SELECT,
        _cms_heavy_ctes,
    )
    from formula1_data_pipeline_spark.queries_llm import (
        _SQL_DOT,
        _SQL_TOKS,
        _lsh_verified_pairs_ctes,
    )

    return f"""
    WITH {_lsh_verified_pairs_ctes()},
    dropped AS (SELECT DISTINCT b_id FROM vp WHERE jaccard >= 0.8),
    rt AS (
        SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ), cg AS (
        SELECT unnest(CASE WHEN len(toks) >= 2 THEN
            list_transform(range(0, len(toks) - 1), i ->
                toks[i + 1] || ' ' || toks[i + 2])
            ELSE [] END) AS gram
        FROM rt
    ), {_cms_heavy_ctes('cg', _Q88_CMS_W_BITS)},
    vecs AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ), cent AS (
        SELECT vec_id, vec,
               row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) - 1 AS cluster,
               sqrt({_SQL_DOT.format(a='vec', b='vec')}) AS cnorm
        FROM vecs
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ), ivfscores AS (
        SELECT v.vec_id AS id, cent.cluster,
               {_SQL_DOT.format(a='v.vec', b='cent.vec')}
               / nullif(cent.cnorm, 0.0) AS score
        FROM vecs v CROSS JOIN cent
    ), assign_c AS (
        SELECT id, cluster FROM (
            SELECT id, cluster, row_number() OVER (
                PARTITION BY id ORDER BY score DESC, cluster ASC
            ) AS crank FROM ivfscores
        ) WHERE crank <= 3
    ), probes AS (
        SELECT id, cluster FROM (
            SELECT id, cluster, row_number() OVER (
                PARTITION BY id ORDER BY score DESC, cluster ASC
            ) AS crank FROM ivfscores WHERE id < 10
        ) WHERE crank <= 4
    ), ivfscored AS (
        SELECT DISTINCT q.id AS q_id, c.id AS n_id,
               round(
                   {_SQL_DOT.format(a='qv.vec', b='cv.vec')}
                   / nullif(sqrt({_SQL_DOT.format(a='qv.vec', b='qv.vec')})
                            * sqrt({_SQL_DOT.format(a='cv.vec', b='cv.vec')}),
                            0.0),
               6) AS cos_sim
        FROM probes q
        JOIN assign_c c USING (cluster)
        JOIN vecs qv ON qv.vec_id = q.id
        JOIN vecs cv ON cv.vec_id = c.id
        WHERE q.id <> c.id
    ), ivfranked AS (
        SELECT q_id, n_id, cos_sim,
               row_number() OVER (
                   PARTITION BY q_id ORDER BY cos_sim DESC, n_id ASC
               ) AS rank
        FROM ivfscored
    )
    SELECT 'neardup' AS kind, doc_id,
           doc_id NOT IN (SELECT b_id FROM dropped) AS kept,
           CAST(NULL AS VARCHAR) AS gram,
           CAST(NULL AS BIGINT) AS n_occurrences,
           CAST(NULL AS BIGINT) AS est_count,
           CAST(NULL AS BOOLEAN) AS is_heavy,
           CAST(NULL AS BIGINT) AS n_id,
           CAST(NULL AS DOUBLE) AS cos_sim,
           CAST(NULL AS BIGINT) AS rank
    FROM documents
    UNION ALL
    SELECT 'heavy' AS kind, CAST(NULL AS BIGINT) AS doc_id,
           CAST(NULL AS BOOLEAN) AS kept,
           gram, n_occurrences, est_count, is_heavy,
           NULL, NULL, NULL
    FROM ({_CMS_HEAVY_SELECT.format(t=_Q88_CMS_T)})
    UNION ALL
    SELECT 'ivf_stream', q_id, NULL, NULL, NULL, NULL, NULL,
           n_id, cos_sim, rank
    FROM ivfranked WHERE rank <= 5
    """


@register(
    "q88_stream_neardup_dedup",
    _q88_oracle(),
    doc="STREAMING corpus-state surface, two legs in one "
        "kind-discriminated frame. kind='neardup' (§2.10 x §2.12 "
        "composition, round 6; 2-file replay since round 14 — the "
        "converged state is split-invariant, so batch count buys "
        "only sequential-job latency): documents replayed as a file "
        "stream; each micro-batch signatures only its own docs, "
        "txn-appends (id, bands, token set) to the seen-index, "
        "band-self-joins the index restricted to pairs touching this "
        "batch (so every near-dup pair is discovered exactly in the "
        "batch of its later-ARRIVING member), verifies exact "
        "jaccard >= 0.8 on candidates only, and merge-upserts "
        "per-doc verdicts where dropped outranks kept. The converged "
        "landed state is independent of the file split, and the "
        "oracle replays it directly: dropped iff a verified near-dup "
        "with a smaller id exists, over the q21-shared pair CTEs. "
        "kind='heavy' (round 11, streaming/heavyhitters.py): the "
        "Count-Min counter state maintained per micro-batch as "
        "delta-log segments (sum-mergeable, so the landed state is "
        "bit-for-bit the one-shot build under ANY split), then the "
        "batch enumeration consumes the LANDED state — row-identical "
        "to q65's batch operator, which is exactly what the shared "
        "counter-replay oracle asserts. "
        "kind='ivf_stream' (round 13, streaming/ivf.py): the "
        "embedding-ingestion streaming leg — the persisted IVF index "
        "is built over the head third, then maintained by a 2-file "
        "micro-batch stream whose tail OVERLAPS the built head "
        "(re-delivery under the gate: the landed-id skip must no-op "
        "it) against the FROZEN hash-sample quantizer; top-k from "
        "the STREAMED index replays the q34 live-IVF oracle "
        "row-for-row — the build+append==one-shot contract composed "
        "with the stream",
)
def q88_stream_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from formula1_data_pipeline_spark.operators.similarity import (
        _as_double,
        _hash_sample_coefs,
        norm,
    )
    from formula1_data_pipeline_spark.operators.vecindex import (
        ivf_index_build,
        ivf_index_topk,
    )
    from formula1_data_pipeline_spark.scratch import scratch_dir
    from formula1_data_pipeline_spark.streaming import stream_neardup_dedup
    from formula1_data_pipeline_spark.streaming.heavyhitters import (
        stream_heavy_ngrams,
    )
    from formula1_data_pipeline_spark.streaming.ivf import (
        stream_ivf_append,
    )

    from formula1_data_pipeline_spark.concurrency import overlap

    # 2 micro-batches per streamed leg (was 3): cross-batch folding +
    # the split-invariance contract are proven at 2, and each
    # AvailableNow batch is a full sequential job chain — this gate
    # was the heaviest on the r13 driver wall (40.5 s) purely on job
    # count; the streaming modules' own tests keep deeper splits

    def neardup_leg() -> DataFrame:
        landed = stream_neardup_dedup(
            spark, f"{sf_dir}/documents.parquet", n_source_files=2)
        # landing is all-string (S4 semantics); cast back for comparison
        return landed.select(
            F.lit("neardup").alias("kind"),
            F.col("doc_id").cast("long").alias("doc_id"),
            (F.col("kept") == "true").alias("kept"),
        )

    def heavy_leg() -> DataFrame:
        return stream_heavy_ngrams(
            spark, f"{sf_dir}/documents.parquet", n=2,
            threshold=_Q88_CMS_T, d=4, w_bits=_Q88_CMS_W_BITS,
            n_source_files=2,
        ).select(
            F.lit("heavy").alias("kind"),
            "gram", "n_occurrences", "est_count", "is_heavy",
        )

    def ivf_leg() -> DataFrame:
        emb = load(spark, sf_dir, "embeddings")["embeddings"]
        base = emb.select(
            F.col("vec_id").alias("id"),
            _as_double(F.col("embedding")).alias("vec"),
        ).withColumn("nrm", norm(F.col("vec")))
        coefs = _hash_sample_coefs(base, 16)
        mx = emb.agg(F.max("vec_id")).collect()[0][0]
        work = scratch_dir(prefix="q88_ivf_")
        idx = f"{work}/idx"
        ivf_index_build(spark, emb.filter(F.col("vec_id") <= mx // 3),
                        idx, centroid_coefs=coefs, n_assign=3)
        tail_path = f"{work}/tail.parquet"
        # the streamed tail OVERLAPS the built head (re-delivery under
        # the gate) alongside the new rows
        emb.filter(F.col("vec_id") > mx // 6).write.parquet(tail_path)
        stream_ivf_append(spark, tail_path, idx, n_source_files=2,
                          n_assign=3, work_dir=f"{work}/w")
        return ivf_index_topk(
            spark, idx, emb.filter(F.col("vec_id") < 10),
            k=5, n_probe=4,
        ).select(
            F.lit("ivf_stream").alias("kind"),
            F.col("q_id").alias("doc_id"),
            "n_id", "cos_sim", "rank",
        )

    # the three legs build disjoint artifacts (verdict table, counter
    # log, IVF index) in disjoint scratch dirs — run their sequential
    # job chains from driver threads so the idle cores back-fill
    # (guide §2.6; r14 optimization — wall drops from sum to max)
    neardup, heavy, ivf = overlap(spark, [
        ("q88: neardup stream", neardup_leg),
        ("q88: heavy-ngrams stream", heavy_leg),
        ("q88: ivf build+stream", ivf_leg),
    ])
    return (
        neardup.unionByName(heavy, allowMissingColumns=True)
        .unionByName(ivf, allowMissingColumns=True)
        .select(
            "kind", "doc_id", "kept", "gram", "n_occurrences",
            "est_count", "is_heavy", "n_id", "cos_sim", "rank",
        )
    )
