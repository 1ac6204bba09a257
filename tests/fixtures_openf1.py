"""Deterministic OpenF1-shaped raw fixtures (all-string, dirty).

Implements FIXTURES.md §A: every column is a string; dirtiness per
§A.6 — null-sentinel strings, null grain keys, historical/realtime
overlap (realtime must win), duplicate realtime records (latest wins),
laps with no prior position sample, short/single-lap drivers, zero
lap_time, single-driver session.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SEED = 42

LAP_COLS = [
    "meeting_key", "session_key", "driver_number", "lap_number",
    "date_start", "duration_sector_1", "duration_sector_2",
    "duration_sector_3", "lap_duration", "i1_speed", "i2_speed",
    "st_speed", "is_pit_out_lap", "year", "segments_sector_1",
    "segments_sector_2", "segments_sector_3",
]
POS_COLS = ["date", "session_key", "meeting_key", "driver_number", "position", "year"]
RC_COLS = [
    "meeting_key", "session_key", "date", "driver_number", "lap_number",
    "category", "flag", "scope", "sector", "message",
]


def _schema(cols: list[str]) -> T.StructType:
    return T.StructType([T.StructField(c, T.StringType(), True) for c in cols])


def _ts(base_min: int, sec: float) -> str:
    h, rem = divmod(base_min * 60 + sec, 3600)
    m, s = divmod(rem, 60)
    return f"2023-11-26T{13 + int(h) % 8:02d}:{int(m):02d}:{s:06.3f}+00:00"


def build_raw_tables(spark: SparkSession) -> dict[str, DataFrame]:
    rng = random.Random(SEED)

    sessions = [
        # (meeting, session, drivers, laps_per_driver)
        (1219, 9165, [1, 4, 16, 44, 55, 81], 12),
        (1220, 9200, [1, 44, 63], 6),
        (1221, 9300, [99], 1),  # single-driver single-lap session
    ]

    laps_hist: list[list] = []
    laps_rt: list[list] = []
    pos_hist: list[list] = []
    pos_rt: list[list] = []

    for mk, sk, drivers, nlaps in sessions:
        for di, drv in enumerate(drivers):
            base = 90.0 + di * 0.8
            # driver 16 gets no position events at all (as-of NULL case);
            # driver 44's first lap precedes its first position event.
            emit_positions = drv != 16
            for lap in range(1, nlaps + 1):
                start_min = lap * 2 + di
                lap_time = base + rng.uniform(-1.5, 2.5) + lap * 0.05
                if drv == 55 and lap == 3:
                    lap_time = 0.0  # divide-by-zero guard row
                s1, s2 = lap_time * 0.3, lap_time * 0.35
                s3 = lap_time - s1 - s2
                row = [
                    str(mk), str(sk), str(drv), str(lap),
                    _ts(start_min, 0.123),
                    f"{s1:.3f}",
                    # sentinel dirt in a non-key column sometimes
                    rng.choice(["NaN", "None", ""]) if (lap == 5 and drv == 81) else f"{s2:.3f}",
                    f"{s3:.3f}", f"{lap_time:.3f}",
                    f"{290 + rng.uniform(-8, 8):.1f}",
                    f"{300 + rng.uniform(-8, 8):.1f}",
                    f"{310 + rng.uniform(-8, 8):.1f}",
                    "true" if lap == 1 or (drv == 4 and lap == 7) else "false",
                    "2023",
                    "[2049, 2049, 2051]", "[2049, 2051]", "[2064]",
                ]
                laps_hist.append(row)
                if emit_positions:
                    # a few position samples shortly before each lap start
                    for k in range(2):
                        offset = -30.0 - k * 20
                        if drv == 44 and lap == 1:
                            offset = +40.0  # sample AFTER lap start -> no match
                        pos_hist.append([
                            _ts(start_min, offset), str(sk), str(mk), str(drv),
                            str(max(1, di + 1 - (lap % 2))), "2023",
                        ])

    # realtime overlap: session 9165 driver 44 laps 10-12 reappear with
    # different durations — realtime must win in int_openf1_laps_all.
    for lap in (10, 11, 12):
        for dup in range(2):  # duplicate realtime records; latest date_start wins
            laps_rt.append([
                "1219", "9165", "44", str(lap),
                _ts(lap * 2 + 3, 0.5 + dup),   # later date_start for dup=1
                "25.000", "30.000", "30.000", f"8{5 + dup}.000",
                "295.0", "305.0", "315.0", "false", "2023",
                "[2049]", "[2051]", "[2064]",
            ])
    # realtime position updates overlapping one historical timestamp
    pos_rt.append([_ts(23, -30.0), "9165", "1219", "44", "1", "2023"])

    # dirty rows: null grain keys + sentinel garbage (dropped by staging)
    laps_hist.append([None, "9165", "44", "99", _ts(1, 0), "1", "1", "1", "90",
                      "1", "1", "1", "false", "2023", "[]", "[]", "[]"])
    laps_hist.append(["1219", "None", "44", "98", _ts(1, 0), "1", "1", "1", "90",
                      "1", "1", "1", "false", "2023", "[]", "[]", "[]"])
    pos_hist.append([None, "9165", "1219", "44", "3", "2023"])

    # race control: sentinel-heavy strings
    rc_hist = [
        ["1219", "9165", _ts(10, 0), "None", "None", "Flag", "YELLOW",
         "Sector", "7.0", "YELLOW IN TRACK SECTOR 7"],
        ["1219", "9165", _ts(12, 0), "44", "5", "Flag", "BLUE", "Driver",
         "nan", "BLUE FLAG FOR CAR 44"],
        ["1219", "9165", _ts(14, 0), "None", "None", "SafetyCar", "None",
         "Track", "", "SAFETY CAR DEPLOYED"],
        ["1219", None, _ts(15, 0), "None", "None", "Other", "None", "None",
         "None", "DROPPED ROW"],
    ]
    rc_rt = [
        ["1219", "9165", _ts(14, 0), "None", "None", "SafetyCar", "None",
         "Track", "None", "SAFETY CAR DEPLOYED"],  # dup of hist msg: rt wins
        ["1219", "9165", _ts(16, 0), "1", "8", "Flag", "CLEAR", "Track",
         "None", "TRACK CLEAR"],
    ]

    def df(rows: list[list], cols: list[str], scrub: bool = True) -> DataFrame:
        # The reference scrubs null-sentinel strings at INGEST
        # (clean_df, dags/open_f1_historical.py:60-78) before insert, so
        # the raw laps/position layer never holds "None"/"NaN"/"" —
        # mirror that here. Race control keeps its literal 'None'/'nan'
        # strings so staging's nullif/trim-lower cleaning (the declared
        # dbt surface) is exercised.
        from formula1_data_pipeline_spark.functions.cleaning import scrub_dataframe

        out = spark.createDataFrame(rows, _schema(cols))
        return scrub_dataframe(out) if scrub else out

    return {
        "raw_openf1_laps_historical": df(laps_hist, LAP_COLS),
        "raw_openf1_laps_realtime": df(laps_rt, LAP_COLS),
        "raw_openf1_position_historical": df(pos_hist, POS_COLS),
        "raw_openf1_position_realtime": df(pos_rt, POS_COLS),
        "raw_openf1_race_control_historical": df(rc_hist, RC_COLS, scrub=False),
        "raw_openf1_race_control_realtime": df(rc_rt, RC_COLS, scrub=False),
    }
