"""As-of join — for each left row, the latest right row at-or-before it.

The reference's centerpiece join (J1): laps LEFT JOIN position samples
on three equi keys plus ``p.event_timestamp <= l.lap_start_time``, then
``row_number() ... order by p.event_timestamp desc`` and ``rn = 1`` —
each lap annotated with the most recent position at lap start; laps
with no prior sample survive with NULLs (reference
``dbt/models/intermediate/int_session_driver_laps.sql:41-100``).

Two physical strategies, same semantics:

- ``asof_join_reference`` — literal shape: left join with the
  inequality in the ON clause + rank filter. Correct everywhere, but
  each left row pairs with *every* earlier right row for its key before
  the filter. Fine at test scale; O(laps x positions-per-driver) blowup
  at 100 TB.

- ``asof_join_sorted`` — the scale path: union both sides, one
  shuffle+sort on (keys, ts), forward-fill the last-seen right payload
  onto left rows (``last(..., ignorenulls=True)`` over an unbounded
  preceding frame). Linear in input size, no pair explosion, skew
  handled by AQE since it is a plain window sort. This is the standard
  distributed as-of idiom (same trick merge_asof uses after its sort).

``asof_join`` dispatches on strategy; tests assert both produce
identical results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LEFT_ORD = "__asof_is_left"
_TS = "__asof_ts"
_UID = "__asof_uid"
_PAYLOAD = "__asof_payload"


def asof_join_reference(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance: Column | None = None,
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Join-then-rank formulation (exactly the reference's shape).

    ``right_tiebreak`` makes timestamp ties deterministic (greatest
    wins), matching ``asof_join_sorted``.
    """
    tiebreak = right_tiebreak or payload
    uid = F.monotonically_increasing_id()
    l = left.withColumn(_UID, uid)
    r = right.select(
        *[F.col(k).alias(f"__r_{k}") for k in on],
        F.col(right_ts).alias(_TS),
        *[F.col(p).alias(p) for p in payload],
    )
    cond = F.lit(True)
    for k in on:
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    cond = cond & (F.col(_TS) <= F.col(left_ts))
    if tolerance is not None:
        cond = cond & (F.col(_TS) >= F.col(left_ts) - tolerance)

    joined = l.join(r, cond, "left")
    w = Window.partitionBy(_UID).orderBy(
        F.desc_nulls_last(_TS), *[F.desc_nulls_last(t) for t in tiebreak]
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*left.columns, F.col(_TS).alias(f"{right_ts}_asof"), *payload)
    )


def asof_join_sorted(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Union-sort forward-fill formulation (single shuffle, linear).

    ``right_tiebreak``: columns ordering right rows that share a
    timestamp (last one wins), so results are deterministic; defaults
    to the payload columns.

    Right rows with a NULL timestamp can never satisfy the reference
    predicate (``r.ts <= l.ts`` is NULL), but ``asc_nulls_first``
    would sort them before everything and forward-fill their payload —
    so they are dropped before the union.
    """
    tiebreak = right_tiebreak or payload
    right = right.filter(F.col(right_ts).isNotNull())
    l = left.select(
        *left.columns,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_LEFT_ORD),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{right.schema[c].dataType.simpleString()}"
                for c in [right_ts, *payload]
            ) + ">"
        ).alias(_PAYLOAD),
    )
    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_LEFT_ORD),
        F.struct(F.col(right_ts), *[F.col(p) for p in payload]).alias(_PAYLOAD),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts (<= semantics); among
    # right ties the greatest tiebreak wins the forward fill.
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(_TS).asc_nulls_first(),
            F.col(_LEFT_ORD).asc(),
            *[F.col(_PAYLOAD)[t].asc_nulls_first() for t in tiebreak],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("__fill", F.last(_PAYLOAD, ignorenulls=True).over(w))
    return (
        filled.filter(F.col(_LEFT_ORD) == 1)
        .select(
            *[c for c in left.columns],
            F.col("__fill")[right_ts].alias(f"{right_ts}_asof"),
            *[F.col("__fill")[p].alias(p) for p in payload],
        )
    )


def asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    direction: str = "backward",
    tolerance: Column | None = None,
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """merge_asof-parity directions over the same union-sort shape:

    - ``backward`` — latest right at-or-before (ties: greatest
      tiebreak), the reference semantics;
    - ``forward`` — earliest right at-or-after (ties: smallest
      tiebreak);
    - ``nearest`` — closer of the two, exact backward/forward picks
      compared by absolute distance, ties broken toward backward
      (pandas ``merge_asof`` convention).

    ``tolerance`` (an INTERVAL column) masks matches farther than the
    bound — the left row survives with NULLs, merge_asof-style.

    One shuffle on the equi keys for every direction; ``nearest`` adds
    a second in-partition sort (the reversed fill), never a second
    exchange. Linear in input size like ``asof_join_sorted``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    tiebreak = right_tiebreak or payload
    right = right.filter(F.col(right_ts).isNotNull())
    payload_t = (
        "struct<" + ",".join(
            f"`{c}`:{right.schema[c].dataType.simpleString()}"
            for c in [right_ts, *payload]
        ) + ">"
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_LEFT_ORD),
        F.lit(None).cast(payload_t).alias(_PAYLOAD),
    )
    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_LEFT_ORD),
        F.struct(F.col(right_ts), *[F.col(p) for p in payload]).alias(_PAYLOAD),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    frame = (Window.unboundedPreceding, Window.currentRow)
    # backward fill: ascending ts, right rows first at equal ts (<=),
    # greatest tiebreak filled last => wins
    w_back = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(_TS).asc_nulls_first(),
            F.col(_LEFT_ORD).asc(),
            *[F.col(_PAYLOAD)[t].asc_nulls_first() for t in tiebreak],
        )
        .rowsBetween(*frame)
    )
    # forward fill: descending ts, right rows still first at equal ts
    # (>=), smallest tiebreak filled last => wins
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(
            F.col(_TS).desc_nulls_last(),
            F.col(_LEFT_ORD).asc(),
            *[F.col(_PAYLOAD)[t].desc_nulls_last() for t in tiebreak],
        )
        .rowsBetween(*frame)
    )

    def masked(fill: Column, valid: Column) -> Column:
        return F.when(valid, fill).otherwise(F.lit(None).cast(payload_t))

    # a NULL left timestamp matches nothing in any direction (the
    # reference predicate is NULL); without this guard the desc-sorted
    # forward window would hand null-ts left rows a spurious fill
    filled = u
    if direction in ("backward", "nearest"):
        back = F.last(_PAYLOAD, ignorenulls=True).over(w_back)
        ok = back.isNotNull() & F.col(_TS).isNotNull()
        if tolerance is not None:
            ok = ok & (back[right_ts] >= F.col(_TS) - tolerance)
        filled = filled.withColumn("__back", masked(back, ok))
    if direction in ("forward", "nearest"):
        fwd = F.last(_PAYLOAD, ignorenulls=True).over(w_fwd)
        ok = fwd.isNotNull() & F.col(_TS).isNotNull()
        if tolerance is not None:
            ok = ok & (fwd[right_ts] <= F.col(_TS) + tolerance)
        filled = filled.withColumn("__fwd", masked(fwd, ok))

    if direction == "backward":
        pick = F.col("__back")
    elif direction == "forward":
        pick = F.col("__fwd")
    else:
        d_back = F.unix_micros(F.col(_TS)) - F.unix_micros(
            F.col("__back")[right_ts]
        )
        d_fwd = F.unix_micros(F.col("__fwd")[right_ts]) - F.unix_micros(
            F.col(_TS)
        )
        pick = (
            F.when(F.col("__back").isNull(), F.col("__fwd"))
            .when(F.col("__fwd").isNull(), F.col("__back"))
            .when(d_back <= d_fwd, F.col("__back"))
            .otherwise(F.col("__fwd"))
        )
    return (
        filled.filter(F.col(_LEFT_ORD) == 1)
        .withColumn("__pick", pick)
        .select(
            *left.columns,
            F.col("__pick")[right_ts].alias(f"{right_ts}_asof"),
            *[F.col("__pick")[p].alias(p) for p in payload],
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    strategy: str = "sorted",
) -> DataFrame:
    """Latest right row at-or-before each left row. ``strategy``:
    'sorted' (scale path, default) or 'reference' (join+rank shape)."""
    if strategy == "sorted":
        return asof_join_sorted(left, right, on, left_ts, right_ts, payload)
    if strategy == "reference":
        return asof_join_reference(left, right, on, left_ts, right_ts, payload)
    raise ValueError(f"unknown asof strategy {strategy!r}")
