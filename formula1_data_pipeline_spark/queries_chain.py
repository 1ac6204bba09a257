"""q4x — the actual reference model chain under the driver's oracle gate.

q41 synthesizes OpenF1-shaped all-string raw tables from the ``events``
testdata (deterministically, with identical expressions on both
engines — including dirty rows: null grain keys, 'None' sentinels,
realtime reload duplicates, hist/realtime overlap) and runs the REAL
15-model registry (``plans.models.REGISTRY``) through
``fct_driver_race_summary``. The oracle replays the whole chain —
staging casts, W2 realtime dedup, U1+W1 priority dedup, the J1 as-of
join, the W3-W8 feature windows, and the A1-A3 summary — in ANSI SQL.

q42 does the same for the race-control branch (terminal model
``int_openf1_race_control_all``: sentinel-heavy cleaning + dedup on the
message grain).

Float policy: aggregated doubles in the q41 output are rounded to 6 dp
on BOTH sides — group/window accumulation order may differ across
engines by 1 ulp; rounding absorbs it (inputs are lap-time-sized, so
6 dp is far above noise). Raw-layer double→string formatting may differ
between engines (Java vs Ryu shortest-repr corner cases) but every such
string is only ever cast back to double, where both round-trip exactly;
strings used as dedup keys or ordering (grain ints, fixed-format
timestamps) are rendered identically by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.queries import load, register

_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _fmt(c: Column) -> Column:
    return F.date_format(c, _FMT_SPARK)


def _mk() -> Column:
    return (1 + F.col("user_id") % 3).cast("string")


def _sk() -> Column:
    return (100 + F.col("user_id") % 6).cast("string")


def _laps_raw(df: DataFrame, date_start: Column, lap_duration: Column) -> DataFrame:
    v = F.col("value")
    eid = F.col("event_id")
    return df.select(
        _mk().alias("meeting_key"),
        _sk().alias("session_key"),
        F.col("user_id").cast("string").alias("driver_number"),
        F.when(eid % 13 == 0, F.lit(None).cast("string"))
        .otherwise((1 + eid % 25).cast("string")).alias("lap_number"),
        date_start.alias("date_start"),
        (v / 3).cast("string").alias("duration_sector_1"),
        F.when(eid % 11 == 0, F.lit("None"))
        .otherwise((v / 3 + 0.1).cast("string")).alias("duration_sector_2"),
        (v / 3 + 0.2).cast("string").alias("duration_sector_3"),
        lap_duration.alias("lap_duration"),
        (v * 2).cast("string").alias("i1_speed"),
        (v * 2.1).cast("string").alias("i2_speed"),
        (v * 3).cast("string").alias("st_speed"),
        F.when(eid % 7 == 0, F.lit("True")).otherwise(F.lit("False"))
        .alias("is_pit_out_lap"),
        F.lit("2024").alias("year"),
        F.when(eid % 2 == 0, F.lit("[2048,2049]")).alias("segments_sector_1"),
        F.lit(None).cast("string").alias("segments_sector_2"),
        F.lit(None).cast("string").alias("segments_sector_3"),
    )


def _pos_raw(df: DataFrame, pos_shift: int) -> DataFrame:
    return df.select(
        _fmt(F.col("ts")).alias("date"),
        _sk().alias("session_key"),
        _mk().alias("meeting_key"),
        F.col("user_id").cast("string").alias("driver_number"),
        (1 + (F.col("event_id") + pos_shift) % 20).cast("string")
        .alias("position"),
        F.lit("2024").alias("year"),
    )


def synth_raw_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """OpenF1-shaped raw layer derived from events (see module doc)."""
    ev = load(spark, sf_dir, "events")["events"]
    purch = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    purch_rt = purch.filter(F.col("user_id") % 4 == 0)
    v = F.col("value")
    return {
        "raw_openf1_laps_historical": _laps_raw(
            purch, _fmt(F.col("ts")), v.cast("string")
        ),
        # realtime reload duplicates (W2): same lap twice, second copy
        # one second later with a different duration — latest must win
        "raw_openf1_laps_realtime": _laps_raw(
            purch_rt, _fmt(F.col("ts")), (v * 1.01).cast("string")
        ).unionByName(_laps_raw(
            purch_rt,
            _fmt(F.col("ts") + F.expr("INTERVAL 1 SECOND")),
            (v * 1.02).cast("string"),
        )),
        "raw_openf1_position_historical": _pos_raw(views, 0),
        "raw_openf1_position_realtime": _pos_raw(
            views.filter(F.col("user_id") % 4 == 0), 3
        ),
    }


# shared SQL snippets ------------------------------------------------------

_SQL_LAPS_RAW = """
    SELECT CAST(1 + user_id % 3 AS VARCHAR)   AS meeting_key,
           CAST(100 + user_id % 6 AS VARCHAR) AS session_key,
           CAST(user_id AS VARCHAR)           AS driver_number,
           CASE WHEN event_id % 13 = 0 THEN NULL
                ELSE CAST(1 + event_id % 25 AS VARCHAR) END AS lap_number,
           {date_start}                       AS date_start,
           CAST(value / 3 AS VARCHAR)         AS duration_sector_1,
           CASE WHEN event_id % 11 = 0 THEN 'None'
                ELSE CAST(value / 3 + 0.1 AS VARCHAR) END AS duration_sector_2,
           CAST(value / 3 + 0.2 AS VARCHAR)   AS duration_sector_3,
           {lap_duration}                     AS lap_duration,
           CAST(value * 2 AS VARCHAR)         AS i1_speed,
           CAST(value * 2.1 AS VARCHAR)       AS i2_speed,
           CAST(value * 3 AS VARCHAR)         AS st_speed,
           CASE WHEN event_id % 7 = 0 THEN 'True' ELSE 'False' END
                                              AS is_pit_out_lap,
           '2024' AS year
    FROM {src}
"""

_SQL_LAPS_TYPED = """
    SELECT TRY_CAST(meeting_key AS INT)          AS meeting_key,
           TRY_CAST(session_key AS INT)          AS session_key,
           TRY_CAST(driver_number AS INT)        AS driver_number,
           TRY_CAST(lap_number AS INT)           AS lap_number,
           TRY_CAST(date_start AS TIMESTAMP)     AS lap_start_time,
           TRY_CAST(duration_sector_1 AS DOUBLE) AS sector1_time,
           TRY_CAST(duration_sector_2 AS DOUBLE) AS sector2_time,
           TRY_CAST(duration_sector_3 AS DOUBLE) AS sector3_time,
           TRY_CAST(lap_duration AS DOUBLE)      AS lap_time,
           TRY_CAST(i1_speed AS DOUBLE)          AS i1_speed_kph,
           TRY_CAST(i2_speed AS DOUBLE)          AS i2_speed_kph,
           TRY_CAST(st_speed AS DOUBLE)          AS st_speed_kph,
           TRY_CAST(is_pit_out_lap AS BOOLEAN)   AS is_pit_out_lap,
           TRY_CAST(year AS INT)                 AS season_year,
           {is_realtime} AS is_realtime
    FROM {src}
    WHERE meeting_key IS NOT NULL AND session_key IS NOT NULL
      AND driver_number IS NOT NULL AND lap_number IS NOT NULL
"""


# CTE chain shared by q41 (summary mart) and q43 (final_f1 mart):
# raw synthesis -> staging casts -> W2/U1/W1 dedups -> J1 as-of join
# (sdl) -> the full W3-W8 feature set (feat). Everything through feat is
# engine-agnostic ANSI SQL.
_SQL_CHAIN_FEAT = f"""
    ev AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
               value
        FROM events
    ), purch AS (
        SELECT * FROM ev WHERE event_type = 'purchase'
    ), vw AS (
        SELECT * FROM ev WHERE event_type = 'view'
    ), laps_hist_raw AS (
        {_SQL_LAPS_RAW.format(src='purch',
                              date_start=f"strftime(ts, '{_FMT_DUCK}')",
                              lap_duration='CAST(value AS VARCHAR)')}
    ), laps_rt_raw AS (
        {_SQL_LAPS_RAW.format(src='purch',
                              date_start=f"strftime(ts, '{_FMT_DUCK}')",
                              lap_duration='CAST(value * 1.01 AS VARCHAR)')}
        WHERE user_id % 4 = 0
        UNION ALL
        {_SQL_LAPS_RAW.format(
            src='purch',
            date_start=f"strftime(ts + INTERVAL 1 SECOND, '{_FMT_DUCK}')",
            lap_duration='CAST(value * 1.02 AS VARCHAR)')}
        WHERE user_id % 4 = 0
    ), stg_laps_hist AS (
        {_SQL_LAPS_TYPED.format(src='laps_hist_raw', is_realtime='FALSE')}
    ), laps_rt_dedup AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY meeting_key, session_key, driver_number,
                             lap_number
                ORDER BY date_start DESC
            ) AS rn
            FROM laps_rt_raw
            WHERE meeting_key IS NOT NULL AND session_key IS NOT NULL
              AND driver_number IS NOT NULL AND lap_number IS NOT NULL
        ) WHERE rn = 1
    ), stg_laps_rt AS (
        {_SQL_LAPS_TYPED.format(src='laps_rt_dedup', is_realtime='TRUE')}
    ), pos_hist_raw AS (
        SELECT strftime(ts, '{_FMT_DUCK}') AS date,
               CAST(100 + user_id % 6 AS VARCHAR) AS session_key,
               CAST(1 + user_id % 3 AS VARCHAR)   AS meeting_key,
               CAST(user_id AS VARCHAR)           AS driver_number,
               CAST(1 + event_id % 20 AS VARCHAR) AS position,
               '2024' AS year
        FROM vw
    ), pos_rt_raw AS (
        SELECT strftime(ts, '{_FMT_DUCK}') AS date,
               CAST(100 + user_id % 6 AS VARCHAR) AS session_key,
               CAST(1 + user_id % 3 AS VARCHAR)   AS meeting_key,
               CAST(user_id AS VARCHAR)           AS driver_number,
               CAST(1 + (event_id + 3) % 20 AS VARCHAR) AS position,
               '2024' AS year
        FROM vw WHERE user_id % 4 = 0
    ), stg_pos AS (
        SELECT TRY_CAST(date AS TIMESTAMP)     AS event_timestamp,
               TRY_CAST(session_key AS INT)    AS session_key,
               TRY_CAST(meeting_key AS INT)    AS meeting_key,
               TRY_CAST(driver_number AS INT)  AS driver_number,
               TRY_CAST(position AS INT)       AS race_position,
               TRY_CAST(year AS INT)           AS season_year,
               FALSE AS is_realtime
        FROM pos_hist_raw
        WHERE meeting_key IS NOT NULL AND session_key IS NOT NULL
          AND driver_number IS NOT NULL AND date IS NOT NULL
        UNION ALL
        SELECT TRY_CAST(date AS TIMESTAMP), TRY_CAST(session_key AS INT),
               TRY_CAST(meeting_key AS INT), TRY_CAST(driver_number AS INT),
               TRY_CAST(position AS INT), TRY_CAST(year AS INT), TRUE
        FROM pos_rt_raw
        WHERE meeting_key IS NOT NULL AND session_key IS NOT NULL
          AND driver_number IS NOT NULL AND date IS NOT NULL
    ), laps_all AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY meeting_key, session_key, driver_number,
                             lap_number
                ORDER BY is_realtime DESC, lap_start_time DESC
            ) AS rn
            FROM (SELECT * FROM stg_laps_hist
                  UNION ALL SELECT * FROM stg_laps_rt)
        ) WHERE rn = 1
    ), pos_all AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY meeting_key, session_key, driver_number,
                             event_timestamp
                ORDER BY is_realtime DESC
            ) AS rn
            FROM stg_pos
        ) WHERE rn = 1
    ), sdl AS (
        SELECT meeting_key, session_key, driver_number, lap_number,
               lap_start_time, lap_time, sector1_time, sector2_time,
               sector3_time, i1_speed_kph, i2_speed_kph, st_speed_kph,
               is_pit_out_lap, season_year, is_realtime, race_position
        FROM (
            SELECT l.meeting_key, l.session_key, l.driver_number,
                   l.lap_number, l.lap_start_time, l.lap_time,
                   l.sector1_time, l.sector2_time, l.sector3_time,
                   l.i1_speed_kph, l.i2_speed_kph, l.st_speed_kph,
                   l.is_pit_out_lap, l.season_year, l.is_realtime,
                   p.race_position,
                   row_number() OVER (
                       PARTITION BY l.meeting_key, l.session_key,
                                    l.driver_number, l.lap_number
                       ORDER BY p.event_timestamp DESC,
                                p.race_position DESC
                   ) AS rn
            FROM laps_all l
            LEFT JOIN pos_all p
              ON p.meeting_key = l.meeting_key
             AND p.session_key = l.session_key
             AND p.driver_number = l.driver_number
             AND p.event_timestamp <= l.lap_start_time
        ) WHERE rn = 1
    ), feat AS (
        SELECT *,
               lag(lap_time) OVER w_ord                 AS prev_lap_time,
               lead(lap_time) OVER w_ord                AS next_lap_time,
               avg(lap_time) OVER w5                    AS rolling_avg_5_laps,
               lag(lap_time) OVER w_ord - lap_time      AS pace_momentum,
               lag(race_position) OVER w_ord - race_position
                                                        AS position_momentum,
               lap_time - min(lap_time) OVER w_all      AS degradation_index,
               stddev_samp(lap_time) OVER w5            AS pace_stability_index,
               coalesce(
                   min(lap_time) OVER w_sess / nullif(lap_time, 0), 0
               ) * 60
               + CASE WHEN race_position IS NOT NULL
                       AND count(DISTINCT driver_number) OVER w_sess > 1
                      THEN (CAST(count(DISTINCT driver_number) OVER w_sess
                                 - race_position AS DOUBLE)
                            / (count(DISTINCT driver_number) OVER w_sess - 1)
                           ) * 40
                      ELSE 0 END                        AS performance_score_raw
        FROM sdl
        WINDOW w_ord AS (PARTITION BY meeting_key, session_key,
                                      driver_number
                         ORDER BY lap_number),
               w5 AS (PARTITION BY meeting_key, session_key, driver_number
                      ORDER BY lap_number
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
               w_all AS (PARTITION BY meeting_key, session_key,
                                      driver_number),
               w_sess AS (PARTITION BY meeting_key, session_key)
    )
"""


@register(
    "q41_model_chain",
    f"""
    WITH {_SQL_CHAIN_FEAT}
    SELECT meeting_key, session_key, driver_number,
           min(lap_number)                 AS first_lap,
           max(lap_number)                 AS last_lap,
           min(race_position)              AS best_position,
           max(race_position)              AS worst_position,
           round(min(lap_time), 6)         AS best_lap_time,
           round(avg(lap_time), 6)         AS avg_lap_time,
           round(avg(pace_stability_index), 6) AS avg_psi,
           round(avg(degradation_index), 6)    AS avg_degradation,
           round(avg(performance_score_raw), 6) AS avg_performance_score,
           CAST(sum(CASE WHEN is_pit_out_lap THEN 1 ELSE 0 END) AS BIGINT)
                                           AS pit_stop_count
    FROM feat
    GROUP BY 1, 2, 3
    """,
    doc="The REAL 15-model reference chain (plans.models.REGISTRY) run "
        "on synthesized OpenF1-shaped all-string raw tables: staging "
        "casts + P1 filters, W2 realtime-reload dedup, U1+W1 "
        "realtime-beats-historical dedup, J1 as-of join (sorted "
        "strategy), W3-W8 features incl. stddev psi + the performance "
        "score, A1-A3 race summary. Oracle replays the whole chain in "
        "SQL; volatile aggregated doubles rounded to 6 dp both sides",
)
def q41_model_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.plans.models import REGISTRY

    raw = synth_raw_tables(spark, sf_dir)
    built = REGISTRY.run(spark, raw, targets=["fct_driver_race_summary"])
    s = built["fct_driver_race_summary"]
    return s.select(
        "meeting_key", "session_key", "driver_number",
        "first_lap", "last_lap", "best_position", "worst_position",
        F.round("best_lap_time", 6).alias("best_lap_time"),
        F.round("avg_lap_time", 6).alias("avg_lap_time"),
        F.round("avg_psi", 6).alias("avg_psi"),
        F.round("avg_degradation", 6).alias("avg_degradation"),
        F.round("avg_performance_score", 6).alias("avg_performance_score"),
        F.col("pit_stop_count").cast("long").alias("pit_stop_count"),
    )


# --------------------------------------------------------------------------
# q42 — race-control branch (sentinel-heavy cleaning + message-grain dedup)
# --------------------------------------------------------------------------


def _rc_raw(df: DataFrame, realtime: bool) -> DataFrame:
    eid = F.col("event_id")
    return df.select(
        _mk().alias("meeting_key"),
        _sk().alias("session_key"),
        _fmt(F.col("ts")).alias("date"),
        F.when(eid % 5 == 0, F.lit("None"))
        .otherwise(F.col("user_id").cast("string")).alias("driver_number"),
        F.when(eid % 6 == 0, F.lit("None"))
        .otherwise((1 + eid % 25).cast("string")).alias("lap_number"),
        F.when(eid % 3 == 0, F.lit("Flag"))
        .when(eid % 3 == 1, F.lit("SafetyCar"))
        .otherwise(F.lit("Drs")).alias("category"),
        (
            F.lit("BLUE") if realtime else
            F.when(eid % 4 == 0, F.lit("GREEN"))
            .when(eid % 4 == 1, F.lit("YELLOW"))
            .when(eid % 4 == 2, F.lit("RED"))
            .otherwise(F.lit("None"))
        ).alias("flag"),
        F.when(eid % 3 == 0, F.lit("Track"))
        .when(eid % 3 == 1, F.lit("Sector"))
        .otherwise(F.lit("None")).alias("scope"),
        (
            # strict realtime path sees only 'None' or numbers; the
            # historical path also gets ' nan ' / '' sentinels
            F.when(eid % 7 == 0, F.lit("None"))
            .otherwise((1 + eid % 3).cast("string"))
            if realtime else
            F.when(eid % 7 == 0, F.lit("None"))
            .when(eid % 7 == 1, F.lit(" nan "))
            .when(eid % 7 == 2, F.lit(""))
            .otherwise((1 + eid % 3).cast("string"))
        ).alias("sector"),
        F.when(eid % 17 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("msg-"), eid.cast("string")))
        .alias("message"),
    )


_SQL_RC_RAW = """
    SELECT CAST(1 + user_id % 3 AS VARCHAR)   AS meeting_key,
           CAST(100 + user_id % 6 AS VARCHAR) AS session_key,
           strftime(ts, '{fmt}')              AS date,
           CASE WHEN event_id % 5 = 0 THEN 'None'
                ELSE CAST(user_id AS VARCHAR) END AS driver_number,
           CASE WHEN event_id % 6 = 0 THEN 'None'
                ELSE CAST(1 + event_id % 25 AS VARCHAR) END AS lap_number,
           CASE WHEN event_id % 3 = 0 THEN 'Flag'
                WHEN event_id % 3 = 1 THEN 'SafetyCar'
                ELSE 'Drs' END AS category,
           {flag} AS flag,
           CASE WHEN event_id % 3 = 0 THEN 'Track'
                WHEN event_id % 3 = 1 THEN 'Sector'
                ELSE 'None' END AS scope,
           {sector} AS sector,
           CASE WHEN event_id % 17 = 0 THEN NULL
                ELSE 'msg-' || CAST(event_id AS VARCHAR) END AS message
    FROM {src}
"""

_SQL_RC_TYPED = """
    SELECT TRY_CAST(meeting_key AS INT)   AS meeting_key,
           TRY_CAST(session_key AS INT)   AS session_key,
           TRY_CAST(date AS TIMESTAMP)    AS event_timestamp,
           TRY_CAST(nullif(driver_number, 'None') AS INT) AS driver_number,
           TRY_CAST(nullif(lap_number, 'None') AS INT)    AS lap_number,
           nullif(category, 'None') AS category,
           nullif(flag, 'None')     AS flag,
           nullif(scope, 'None')    AS scope,
           {sector_expr}            AS sector,
           message,
           {is_realtime} AS is_realtime
    FROM {src}
    WHERE meeting_key IS NOT NULL AND session_key IS NOT NULL
      AND date IS NOT NULL AND message IS NOT NULL
"""

_SECTOR_LENIENT = (
    "CASE WHEN trim(lower(sector)) IN ('nan', 'none', '') THEN NULL "
    "ELSE TRY_CAST(sector AS DOUBLE) END"
)
_SECTOR_STRICT = "TRY_CAST(nullif(sector, 'None') AS DOUBLE)"


@register(
    "q42_race_control_chain",
    f"""
    WITH ev AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
        FROM events
    ), errs AS (
        SELECT * FROM ev WHERE event_type = 'error'
    ), rc_hist_raw AS (
        {_SQL_RC_RAW.format(
            src='errs', fmt=_FMT_DUCK,
            flag=("CASE WHEN event_id % 4 = 0 THEN 'GREEN' "
                  "WHEN event_id % 4 = 1 THEN 'YELLOW' "
                  "WHEN event_id % 4 = 2 THEN 'RED' ELSE 'None' END"),
            sector=("CASE WHEN event_id % 7 = 0 THEN 'None' "
                    "WHEN event_id % 7 = 1 THEN ' nan ' "
                    "WHEN event_id % 7 = 2 THEN '' "
                    "ELSE CAST(1 + event_id % 3 AS VARCHAR) END"))}
    ), rc_rt_raw AS (
        {_SQL_RC_RAW.format(
            src='errs', fmt=_FMT_DUCK,
            flag="'BLUE'",
            sector=("CASE WHEN event_id % 7 = 0 THEN 'None' "
                    "ELSE CAST(1 + event_id % 3 AS VARCHAR) END"))}
        WHERE user_id % 4 = 0
    ), stg_hist AS (
        {_SQL_RC_TYPED.format(src='rc_hist_raw', sector_expr=_SECTOR_LENIENT,
                              is_realtime='FALSE')}
    ), stg_rt AS (
        {_SQL_RC_TYPED.format(src='rc_rt_raw', sector_expr=_SECTOR_STRICT,
                              is_realtime='TRUE')}
    )
    SELECT meeting_key, session_key, event_timestamp, driver_number,
           lap_number, category, flag, scope, sector, message, is_realtime
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY meeting_key, session_key, event_timestamp, message
            ORDER BY is_realtime DESC
        ) AS rn
        FROM (SELECT * FROM stg_hist UNION ALL SELECT * FROM stg_rt)
    ) WHERE rn = 1
    """,
    doc="Race-control branch of the model chain: sentinel-heavy staging "
        "(nullif 'None', trim/lower sector scrub vs strict realtime "
        "path) + U1 union + W1 dedup on the message grain — the "
        "terminal int_openf1_race_control_all model, driven through the "
        "real registry",
)
def q42_race_control_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.plans.models import REGISTRY

    ev = load(spark, sf_dir, "events")["events"]
    errs = ev.filter(F.col("event_type") == "error")
    raw = {
        "raw_openf1_race_control_historical": _rc_raw(errs, realtime=False),
        "raw_openf1_race_control_realtime": _rc_raw(
            errs.filter(F.col("user_id") % 4 == 0), realtime=True
        ),
    }
    built = REGISTRY.run(spark, raw,
                         targets=["int_openf1_race_control_all"])
    return built["int_openf1_race_control_all"].select(
        "meeting_key", "session_key", "event_timestamp", "driver_number",
        "lap_number", "category", "flag", "scope", "sector", "message",
        "is_realtime",
    )


# --------------------------------------------------------------------------
# q43 — the full mart layer: final_f1 (== fct_driver_laps columns + the
# J2 agg-back join of fct_driver_race_summary), reference
# dbt/models/marts/final_f1.sql:65-83, run through the REAL registry.
# --------------------------------------------------------------------------

# volatile doubles (engine accumulation order differs) rounded to 6 dp
# on BOTH sides; exact columns (casts, subtractions, mins of exact
# values) pass through unrounded.
_Q43_LAP_COLS = """
           l.meeting_key, l.session_key, l.driver_number, l.lap_number,
           l.lap_start_time, l.lap_time, l.sector1_time, l.sector2_time,
           l.sector3_time, l.i1_speed_kph, l.i2_speed_kph, l.st_speed_kph,
           l.is_pit_out_lap, l.season_year, l.is_realtime, l.race_position,
           l.prev_lap_time, l.next_lap_time,
           round(l.rolling_avg_5_laps, 6) AS rolling_avg_5_laps,
           l.pace_momentum,
           round(l.pace_stability_index, 6) AS pace_stability_index,
           l.degradation_index, l.position_momentum,
           round(l.performance_score_raw, 6) AS performance_score_raw,
           l.pace_state, l.track_position_state
"""


_SQL_LAB = """lab AS (
        SELECT *,
               CASE WHEN pace_momentum > 0.3 AND degradation_index < 1.0
                         THEN 'ATTACKING_PACE'
                    WHEN degradation_index > 2.5
                         THEN 'HIGH_TYRE_DEGRADATION'
                    WHEN pace_stability_index < 0.15
                         THEN 'HIGHLY_CONSISTENT_PACE'
                    ELSE 'BASELINE_RACE_PACE' END AS pace_state,
               CASE WHEN position_momentum > 0 THEN 'GAINING_POSITIONS'
                    WHEN position_momentum < 0 THEN 'LOSING_POSITIONS'
                    ELSE 'HOLDING_POSITION' END AS track_position_state
        FROM feat
    )"""


@register(
    "q43_final_f1",
    f"""
    WITH {_SQL_CHAIN_FEAT}, {_SQL_LAB}, summary AS (
        SELECT meeting_key, session_key, driver_number,
               min(lap_number)                 AS first_lap,
               max(lap_number)                 AS last_lap,
               min(race_position)              AS best_position,
               max(race_position)              AS worst_position,
               min(lap_time)                   AS best_lap_time,
               round(avg(lap_time), 6)         AS avg_lap_time,
               round(avg(pace_stability_index), 6)  AS avg_psi,
               round(avg(degradation_index), 6)     AS avg_degradation,
               round(avg(performance_score_raw), 6) AS avg_performance_score,
               CAST(sum(CASE WHEN is_pit_out_lap THEN 1 ELSE 0 END)
                    AS BIGINT)                 AS pit_stop_count
        FROM feat
        GROUP BY 1, 2, 3
    )
    SELECT {_Q43_LAP_COLS},
           s.first_lap, s.last_lap, s.best_position, s.worst_position,
           s.best_lap_time, s.avg_lap_time, s.avg_psi, s.avg_degradation,
           s.avg_performance_score, s.pit_stop_count
    FROM lab l
    LEFT JOIN summary s
      ON s.meeting_key = l.meeting_key
     AND s.session_key = l.session_key
     AND s.driver_number = l.driver_number
    """,
    doc="The full mart layer under the gate: final_f1 = per-lap detail "
        "(every fct_driver_laps column, incl. the 2 label ladders it "
        "carries) LEFT JOIN its own session summary (J2 agg-back, "
        "broadcast side) — run through the real registry to the "
        "final_f1 model; oracle replays the whole chain + join in SQL",
)
def q43_final_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.plans.models import REGISTRY

    raw = synth_raw_tables(spark, sf_dir)
    built = REGISTRY.run(spark, raw, targets=["final_f1"])
    f = built["final_f1"]
    keep = [
        c for c in f.columns
        if c not in {"rolling_avg_5_laps", "pace_stability_index",
                     "performance_score_raw", "avg_lap_time", "avg_psi",
                     "avg_degradation", "avg_performance_score",
                     "pit_stop_count"}
    ]
    return f.select(
        *keep,
        F.round("rolling_avg_5_laps", 6).alias("rolling_avg_5_laps"),
        F.round("pace_stability_index", 6).alias("pace_stability_index"),
        F.round("performance_score_raw", 6).alias("performance_score_raw"),
        F.round("avg_lap_time", 6).alias("avg_lap_time"),
        F.round("avg_psi", 6).alias("avg_psi"),
        F.round("avg_degradation", 6).alias("avg_degradation"),
        F.round("avg_performance_score", 6).alias("avg_performance_score"),
        F.col("pit_stop_count").cast("long").alias("pit_stop_count"),
    )


@register(
    "q70_fct_driver_laps",
    f"""
    WITH {_SQL_CHAIN_FEAT}, {_SQL_LAB}
    SELECT {_Q43_LAP_COLS}
    FROM lab l
    """,
    doc="fct_driver_laps under the gate (ref dbt/models/marts/"
        "fct_driver_laps.sql:3-33): the projection mart run through the "
        "real registry — closes the last pytest-only mart; the oracle "
        "replays the chain to the feature table and projects the same "
        "26 columns (volatile doubles rounded 6 dp on both sides, q41 "
        "float policy)",
)
def q70_fct_driver_laps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.plans.models import REGISTRY

    raw = synth_raw_tables(spark, sf_dir)
    built = REGISTRY.run(spark, raw, targets=["fct_driver_laps"])
    f = built["fct_driver_laps"]
    volatile = {"rolling_avg_5_laps", "pace_stability_index",
                "performance_score_raw"}
    return f.select(
        *[c for c in f.columns if c not in volatile],
        F.round("rolling_avg_5_laps", 6).alias("rolling_avg_5_laps"),
        F.round("pace_stability_index", 6).alias("pace_stability_index"),
        F.round("performance_score_raw", 6).alias("performance_score_raw"),
    )


@register(
    "q73_materialized_chain",
    f"""
    WITH {_SQL_CHAIN_FEAT}
    SELECT meeting_key, session_key, driver_number,
           min(lap_number)                 AS first_lap,
           max(lap_number)                 AS last_lap,
           min(race_position)              AS best_position,
           max(race_position)              AS worst_position,
           round(min(lap_time), 6)         AS best_lap_time,
           round(avg(lap_time), 6)         AS avg_lap_time,
           round(avg(pace_stability_index), 6) AS avg_psi,
           round(avg(degradation_index), 6)    AS avg_degradation,
           round(avg(performance_score_raw), 6) AS avg_performance_score,
           CAST(sum(CASE WHEN is_pit_out_lap THEN 1 ELSE 0 END) AS BIGINT)
                                           AS pit_stop_count
    FROM feat
    GROUP BY 1, 2, 3
    """,
    doc="S11 table materialization under the gate: the q41 chain run "
        "with materialize_to set, so every materialized='table' model "
        "(the three marts) is written to parquet and read back — the "
        "dbt CTAS lineage cut — before the summary is emitted. The "
        "oracle is q41's chain replay: any value altered by the "
        "write/read round-trip (type narrowing, timestamp coercion, "
        "null handling) breaks the hash. Closes the last pytest-only "
        "S-row (ref dbt_project.yml:16-19 mart materialization)",
)
def q73_materialized_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.scratch import scratch_dir

    from formula1_data_pipeline_spark.plans.models import REGISTRY

    raw = synth_raw_tables(spark, sf_dir)
    built = REGISTRY.run(
        spark, raw, targets=["fct_driver_race_summary"],
        materialize_to=scratch_dir(prefix="q73_marts_"),
    )
    s = built["fct_driver_race_summary"]
    return s.select(
        "meeting_key", "session_key", "driver_number",
        "first_lap", "last_lap", "best_position", "worst_position",
        F.round("best_lap_time", 6).alias("best_lap_time"),
        F.round("avg_lap_time", 6).alias("avg_lap_time"),
        F.round("avg_psi", 6).alias("avg_psi"),
        F.round("avg_degradation", 6).alias("avg_degradation"),
        F.round("avg_performance_score", 6).alias("avg_performance_score"),
        F.col("pit_stop_count").cast("long").alias("pit_stop_count"),
    )


from formula1_data_pipeline_spark.plans.assertions import (  # noqa: E402
    NOT_NULL_TESTS,
    UNIQUE_GRAIN,
)

_Q74_ROWS = sorted(
    [(m, "not_null") for m in NOT_NULL_TESTS]
    + [(m, "unique") for m in UNIQUE_GRAIN]
)
_Q74_VALUES = ", ".join(f"('{m}', '{k}', true)" for m, k in _Q74_ROWS)


@register(
    "q74_assertion_runner",
    f"""
    SELECT * FROM (VALUES {_Q74_VALUES}) AS t(model, kind, passed)
    """,
    doc="The dbt-test assertion runner under the gate (M1 test stage, "
        "ref dags/formula1_elt_dag.py:46-50 + dbt/models/schema.yml's "
        "55 not_null tests and the implied grain uniqueness): the full "
        "chain is built on the synthetic raw layer and every declared "
        "assertion is executed for real; the output is one row per "
        "(model, assertion kind) with its pass flag, which the oracle "
        "pins to literal true — a pipeline change that breaks "
        "null-safety or dedup uniqueness anywhere in the 15-model DAG "
        "flips a flag and breaks the hash (q53 accuracy-gate pattern)",
)
def q74_assertion_runner(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.plans.assertions import (
        assertions_report,
    )
    from formula1_data_pipeline_spark.plans.models import REGISTRY

    ev = load(spark, sf_dir, "events")["events"]
    errs = ev.filter(F.col("event_type") == "error")
    raw = {
        **synth_raw_tables(spark, sf_dir),
        "raw_openf1_race_control_historical": _rc_raw(errs, realtime=False),
        "raw_openf1_race_control_realtime": _rc_raw(
            errs.filter(F.col("user_id") % 4 == 0), realtime=True
        ),
    }
    built = REGISTRY.run(spark, raw, targets=list(NOT_NULL_TESTS))
    # one job for all 19 checks — the per-action alternative paid
    # ~0.5 s of fixed cost per check, and caching the shared chain
    # prefix was measured slower than recomputing it per branch
    # (InMemoryRelation breaks the codegen pipeline): 6.6 s plain vs
    # 9.6 s cached vs 13.5 s per-action at sf0.1
    return assertions_report(built)


@register(
    "q76_incremental_load",
    f"""
    WITH {_SQL_CHAIN_FEAT}
    SELECT meeting_key, session_key, driver_number,
           min(lap_number)                 AS first_lap,
           max(lap_number)                 AS last_lap,
           min(race_position)              AS best_position,
           max(race_position)              AS worst_position,
           round(min(lap_time), 6)         AS best_lap_time,
           round(avg(lap_time), 6)         AS avg_lap_time,
           round(avg(pace_stability_index), 6) AS avg_psi,
           round(avg(degradation_index), 6)    AS avg_degradation,
           round(avg(performance_score_raw), 6) AS avg_performance_score,
           CAST(sum(CASE WHEN is_pit_out_lap THEN 1 ELSE 0 END) AS BIGINT)
                                           AS pit_stop_count
    FROM feat
    GROUP BY 1, 2, 3
    """,
    doc="dbt-incremental materialization (delete+insert strategy) under "
        "the gate — the §2.11 idiomatic upgrade the reference's "
        "view/table-only project lacks: the race summary is loaded as "
        "an INCREMENTAL model in two session windows (sessions "
        "100-102, then 102-105 — session 102 deliberately reloaded to "
        "prove replace idempotence), each load committing atomically "
        "via txn_replace on session_key with untouched partitions "
        "carried by reference. The converged table must equal the "
        "full-rebuild summary, which the oracle computes as the whole "
        "chain replay (q41's SQL). Incremental is correct here because "
        "every aggregate group lives inside one session partition",
)
def q76_incremental_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula1_data_pipeline_spark.scratch import scratch_dir

    from formula1_data_pipeline_spark.plans.models import (
        REGISTRY,
        _race_summary_agg,
    )
    from formula1_data_pipeline_spark.plans.registry import ModelRegistry

    raw = synth_raw_tables(spark, sf_dir)
    feats = REGISTRY.run(spark, raw, targets=["int_driver_lap_features"])[
        "int_driver_lap_features"
    ]  # lazy: each load recomputes the cheap chain; checkpointing
    # it was measured slower (materialization cost > one replay)

    inc = ModelRegistry()

    @inc.register("race_summary_inc", sources=("features",),
                  materialized="incremental",
                  incremental_key="session_key")
    def race_summary_inc(deps):
        return _race_summary_agg(deps["features"])

    target = scratch_dir(prefix="q76_inc_")
    for window in ([100, 101, 102], [102, 103, 104, 105]):
        load_feats = feats.filter(F.col("session_key").isin(window))
        final = inc.run(spark, {"features": load_feats},
                        materialize_to=target)["race_summary_inc"]

    return final.select(
        "meeting_key",
        # the txn layer's partition column round-trips as string
        # (all-VARCHAR landing policy); restore the chain's int type
        F.col("session_key").cast("int").alias("session_key"),
        "driver_number",
        "first_lap", "last_lap", "best_position", "worst_position",
        F.round("best_lap_time", 6).alias("best_lap_time"),
        F.round("avg_lap_time", 6).alias("avg_lap_time"),
        F.round("avg_psi", 6).alias("avg_psi"),
        F.round("avg_degradation", 6).alias("avg_degradation"),
        F.round("avg_performance_score", 6).alias("avg_performance_score"),
        F.col("pit_stop_count").cast("long").alias("pit_stop_count"),
    )
