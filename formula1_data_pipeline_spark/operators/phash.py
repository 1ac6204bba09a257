"""Perceptual image hashing (aHash / dHash) over binary media
columns — dedup for the MULTIMODAL column (SURVEY.md §2.12; round-11
verdict stretch item: "complete dedup across the multimodal column,
reusing the hamming near-dup machinery").

The standard image near-dup pipeline (imagehash/pHash family):
average-hash thresholds a downsampled grayscale grid against its own
mean; difference-hash takes horizontal gradients — both tolerant to
re-encoding/resize, both reduce near-dup detection to HAMMING
distance over fixed-width fingerprints, which this repo already
scales (``dedup.simhash_group_pairs``: pigeonhole slice blocking,
candidates-only verification — never all-pairs).

Codec reality (the multimodal.py contract): real grayscale decode
needs PIL, absent in this container, so the "image" is the module's
deterministic fake — payload bytes laid out row-major at ``src_w``
bytes per row, each byte a pixel. Everything downstream of decode is
the real algorithm, and because the fake is bytes, every hash bit is
an integer expression both engines compute identically — the hashes
sit under the FULL cross-engine value hash (unlike any PIL-backed
hash, which would gate bounds-only). A deployment swaps the pixel
expression for a decoded-luma column; grid math, packing, blocking
and pairing don't change.

Spark shape: ONE codegen'd SQL expression per hash (the q22/q51
plan-construction lesson — a string, not a deep Column tree): 60
sampled-pixel extracts from ``hex(payload)``, an exact integer mean
compare (``n*b > sum`` — no division rounding), shift/OR packing into
a 60-bit BIGINT (the repo's 63-usable-bits discipline: DuckDB's
BIGINT ``<<`` overflows at the sign bit, and 60 bits slice evenly
into the simhash machinery's 4 x 15-bit pigeonhole lanes). No
explode, no shuffle, no Python row path (§2.9).

Near-dup: ``phash_neardup_pairs`` groups identical hashes (exact
dups) and feeds the distinct-hash groups through
``simhash_group_pairs`` — one shared scale path for text simhash and
image phash.

LANDING ROUTE: rides q55's r13 re-gate (q55 owns the multimodal
transform surface; r11-gated, due r13) as kind='ahash'/'dhash' rows
plus hamming pair rows. Draft: tests/test_r15_gate_drafts.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fake-image geometry (multimodal.resize_nearest's convention) and
#: the sampled grid: 6 x 10 = 60 bits — 4 x 15-bit slices, sign-safe
SRC_W = 16
GRID_ROWS = 6
GRID_COLS = 10


def _px(hx: str, h: str, i: int, j: int, n_cols: int,
        duck: bool) -> str:
    """SQL fragment: sampled pixel (i, j) of the row-major byte image
    — nearest-neighbor grid sampling, ``h`` = image height expression.
    ``duck`` switches integer-div / hex-parse dialect."""
    idiv = "//" if duck else " div "
    row = f"((({i}) * {h}) {idiv} {GRID_ROWS})"
    col = f"((({j}) * {SRC_W}) {idiv} {n_cols})"
    pos = f"(({row}) * {SRC_W} + ({col}))"
    if duck:
        return (f"CAST(('0x' || substr({hx}, 2 * {pos} + 1, 2)) "
                f"AS BIGINT)")
    return (f"CAST(conv(substring({hx}, 2 * {pos} + 1, 2), 16, 10) "
            f"AS BIGINT)")


def _sum_terms(terms: list[str], duck: bool) -> str:
    """Sum of many terms, dialect-aware: DuckDB's binder recurses
    per `+` node and a 60-term left-nested chain blows its 128-depth
    limit — `list_sum` binds flat; Spark keeps the plain chain
    (codegen folds it)."""
    if duck:
        return ("CAST(list_sum([" + ", ".join(terms)
                + "]) AS BIGINT)")
    return "(" + " + ".join(terms) + ")"


def ahash_expr(hx: str, h: str, duck: bool = False) -> str:
    """60-bit average-hash of the byte image as ONE SQL expression:
    bit (i, j) set iff 60 * px > sum(all px) — the exact-integer form
    of px > mean (strict, so a constant image hashes to 0)."""
    px = [
        _px(hx, h, i, j, GRID_COLS, duck)
        for i in range(GRID_ROWS) for j in range(GRID_COLS)
    ]
    total = _sum_terms(px, duck)
    n = GRID_ROWS * GRID_COLS
    terms = [
        f"((CASE WHEN {n} * {p} > {total} THEN CAST(1 AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END) << {k})"
        for k, p in enumerate(px)
    ]
    return _sum_terms(terms, duck)


def dhash_expr(hx: str, h: str, duck: bool = False) -> str:
    """60-bit difference-hash: bit (i, j) set iff px(i, j) >
    px(i, j+1) over a 6 x 11 sample grid (horizontal gradient — the
    classic dHash, robust to global brightness shifts the aHash mean
    is sensitive to)."""
    terms = []
    for i in range(GRID_ROWS):
        for j in range(GRID_COLS):
            a = _px(hx, h, i, j, GRID_COLS + 1, duck)
            b = _px(hx, h, i, j + 1, GRID_COLS + 1, duck)
            k = i * GRID_COLS + j
            terms.append(
                f"((CASE WHEN {a} > {b} THEN CAST(1 AS BIGINT) "
                f"ELSE CAST(0 AS BIGINT) END) << {k})"
            )
    return _sum_terms(terms, duck)


def phash_df(media: DataFrame, kind: str = "ahash",
             id_col: str = "media_id",
             payload_col: str = "payload") -> DataFrame:
    """(media_id, phash) for every payload tall enough to sample
    (height >= 1 row, the resize_nearest truncated-file convention).
    Shuffle-free codegen'd projections.

    Staged as pixel COLUMNS (r14 optimization): the one-expression
    form (``ahash_expr``/``dhash_expr``, kept as the semantic spec
    and the DuckDB twin) inlines every sampled-pixel extract at every
    use — the aHash mean appears inside all 60 bit terms, ~3.7k
    substring/conv nodes — and parse+analysis+Janino of that tree
    measured ~7 s at sf0.1 for microseconds of row work. Extracting
    the 60-66 pixels once into a projection, the mean into a second,
    and packing bits from plain attribute references is the same
    integer arithmetic on the same values (twin-pinned in
    test_phash) with a ~180-node plan. CollapseProject keeps the
    stages apart: every pixel column is referenced more than once
    and ``conv(substring(...))`` is not collapse-cheap."""
    base = media.select(
        F.col(id_col).alias("media_id"),
        F.hex(F.col(payload_col)).alias("hx"),
        F.expr(f"CAST(length({payload_col}) AS BIGINT) "
               f"div {SRC_W}").alias("h"),
    ).filter(F.col("h") >= 1)
    n_cols = {"ahash": GRID_COLS, "dhash": GRID_COLS + 1}[kind]
    px = base.selectExpr(
        "media_id",
        *[f"{_px('hx', 'h', i, j, n_cols, False)} AS _px_{i}_{j}"
          for i in range(GRID_ROWS) for j in range(n_cols)],
    )
    if kind == "ahash":
        n = GRID_ROWS * GRID_COLS
        total = " + ".join(f"_px_{i}_{j}" for i in range(GRID_ROWS)
                           for j in range(GRID_COLS))
        bits = " + ".join(
            f"((CASE WHEN {n} * _px_{i}_{j} > _total "
            f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) "
            f"<< {i * GRID_COLS + j})"
            for i in range(GRID_ROWS) for j in range(GRID_COLS))
        return px.selectExpr(
            "media_id", f"({total}) AS _total", *px.columns[1:],
        ).selectExpr("media_id", f"({bits}) AS phash")
    bits = " + ".join(
        f"((CASE WHEN _px_{i}_{j} > _px_{i}_{j + 1} "
        f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) "
        f"<< {i * GRID_COLS + j})"
        for i in range(GRID_ROWS) for j in range(GRID_COLS))
    return px.selectExpr("media_id", f"({bits}) AS phash")


def phash_groups(media: DataFrame, kind: str = "ahash",
                 id_col: str = "media_id",
                 payload_col: str = "payload") -> DataFrame:
    """(simhash, canonical_id, n_docs) exact-dup groups over the
    perceptual hash — the input shape ``dedup.simhash_group_pairs``
    pairs up. Column named ``simhash`` on purpose: one downstream
    machine for both fingerprint families."""
    return (
        phash_df(media, kind, id_col, payload_col)
        .groupBy(F.col("phash").alias("simhash"))
        .agg(
            F.min("media_id").alias("canonical_id"),
            F.count("*").alias("n_docs"),
        )
    )


def phash_neardup_pairs(media: DataFrame, kind: str = "ahash",
                        max_distance: int = 3,
                        id_col: str = "media_id",
                        payload_col: str = "payload",
                        n_slices: int = 4,
                        bits_per_slice: int = 15) -> DataFrame:
    """Near-duplicate IMAGE pairs within hamming distance
    [1, max_distance] of each other's perceptual hash — the
    multimodal twin of ``dedup.simhash_neardup_pairs``, sharing its
    pigeonhole blocking verbatim (default 60 bits = 4 x 15-bit
    slices; a pair within distance d < n_slices shares >= one slice,
    candidates join on (slice idx, slice value), exact
    bit_count(xor) verification on candidates only — never
    all-pairs).

    Pigeonhole completeness REQUIRES n_slices > max_distance (the
    simhash_neardup_pairs guard, enforced here too — a first draft
    called the pair stage directly and silently under-reported at
    distance 8 with 4 slices). For larger distances pick a slicing
    that still divides the 60 bits evenly (e.g. 10 x 6): more slices
    = completeness at higher distance, at the price of coarser slice
    keys (more candidates per bucket) — the standard hamming-join
    trade."""
    from formula1_data_pipeline_spark.operators.dedup import (
        simhash_group_pairs,
    )

    if n_slices <= max_distance:
        raise ValueError(
            "need n_slices > max_distance for pigeonhole "
            f"completeness: {n_slices} slices, distance "
            f"{max_distance}")
    if n_slices * bits_per_slice != GRID_ROWS * GRID_COLS:
        raise ValueError(
            f"slicing {n_slices} x {bits_per_slice} does not cover "
            f"the {GRID_ROWS * GRID_COLS}-bit hash exactly")
    return simhash_group_pairs(
        phash_groups(media, kind, id_col, payload_col),
        max_distance=max_distance,
        n_slices=n_slices,
        bits_per_slice=bits_per_slice,
    )
