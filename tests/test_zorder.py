"""Z-order layout (operators/zorder.py): Morton interleave vs a
Python bit reference, the multi-column pruning property a
single-column sort cannot give, exact-rank file assignment
invariance, and the end-to-end manifest-stats skip on BOTH columns."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators import zorder as Z
from formula1_data_pipeline_spark.scratch import scratch_dir


def _morton_ref(vals, bits):
    z = 0
    k = len(vals)
    for i in range(bits):
        for j, v in enumerate(vals):
            z += ((v >> i) & 1) << (i * k + j)
    return z


@pytest.fixture(scope="module")
def grid(spark):
    rows = [(32 * x + y, x, y) for x in range(32) for y in range(32)]
    return spark.createDataFrame(
        rows, "id long, x long, y long").cache()


def test_morton_matches_reference(spark):
    rows = [(i, (i * 37) % 61, (i * 17) % 53) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {r["id"]: r["z"] for r in df.select(
        "id", F.expr(Z.morton_sql(["a", "b"], 6)).alias("z")
    ).collect()}
    for i, a, b in rows:
        assert got[i] == _morton_ref([a, b], 6)


def test_morton_width_guard():
    with pytest.raises(ValueError, match="> 62"):
        Z.morton_sql(["a", "b", "c", "d"], 16)


def test_non_integral_column_rejected(spark):
    df = spark.createDataFrame([(1, 1.5)], "id long, x double")
    with pytest.raises(TypeError, match="integral"):
        Z.scaled_cols(df, ["x"])


def test_extreme_range_does_not_wrap(spark):
    """Round-10 ADVICE regression: with the subtractions in BIGINT, a
    column whose range exceeds 2^63 silently wrapped in non-ANSI mode
    and produced a meaningless layout. In DECIMAL(38,0) the scaled
    values must span [0, 2^bits) monotonically."""
    lo, hi = -(1 << 62), (1 << 62)  # range 2^63 > BIGINT max
    df = spark.createDataFrame(
        [(0, lo), (1, 0), (2, hi)], "id long, x long")
    got = {r["id"]: r["_s0"]
           for r in Z.scaled_cols(df, ["x"], bits=8).collect()}
    top = (1 << 8) - 1
    assert got[0] == 0 and got[2] == top
    assert 0 < got[1] < top and got[0] < got[1] < got[2]


def test_box_queries_prune_on_both_dims(spark, grid):
    """The layout property itself: cut the 32x32 grid into 16
    segments; a quarter-range predicate on EITHER dimension must
    touch fewer segments than all under z-order, while an x-sorted
    layout leaves y-predicates touching every segment."""
    asg = Z.zorder_assignment(grid, ["x", "y"], 16, "id", bits=5)
    j = grid.join(asg, "id")

    def files_touched(frame, pred):
        return frame.filter(pred).select("file_id").distinct().count()

    z_x = files_touched(j, F.col("x") < 8)
    z_y = files_touched(j, F.col("y") < 8)
    assert z_x < 16 and z_y < 16

    # x-sorted layout: file = x-rank quartile — y predicates are blind
    xs = grid.withColumn(
        "file_id", F.floor(F.col("x") / 2).cast("long"))
    assert files_touched(xs, F.col("x") < 8) == 4      # x prunes
    assert files_touched(xs, F.col("y") < 8) == 16     # y cannot
    assert z_y < 16


def test_assignment_exact_ranks_and_invariance(spark, grid):
    asg = {r["id"]: (r["zvalue"], r["file_id"])
           for r in Z.zorder_assignment(
               grid, ["x", "y"], 8, "id", bits=5).collect()}
    rep = {r["id"]: (r["zvalue"], r["file_id"])
           for r in Z.zorder_assignment(
               grid.repartition(7), ["x", "y"], 8, "id",
               bits=5).collect()}
    assert asg == rep
    # equal-count cut: 1024 rows / 8 files = 128 each, exactly
    sizes = {}
    for _, fid in asg.values():
        sizes[fid] = sizes.get(fid, 0) + 1
    assert sizes == {f: 128 for f in range(8)}
    # file order follows z order
    by_z = sorted(asg.values())
    assert [fid for _, fid in by_z] == sorted(
        fid for _, fid in by_z)


def test_land_prunes_files_on_both_columns(spark, grid):
    from formula1_data_pipeline_spark.sources.txn import read_table

    path = str(scratch_dir(prefix="zorder_land_")) + "/t"
    Z.zorder_land(spark, grid, ["x", "y"], 4, path, "id", bits=5)
    full = read_table(spark, path)
    assert full.count() == 1024
    n_full = len(full.inputFiles())
    for col in ("x", "y"):
        pruned = read_table(spark, path, prune={col: (0, 7)})
        assert len(pruned.inputFiles()) < n_full, f"{col} blind"
        # superset contract: pruning drops only non-matching segments
        assert pruned.filter(F.col(col) <= 7).count() == \
            full.filter(F.col(col) <= 7).count()


def test_three_column_interleave_and_assignment(spark):
    rows = [(i, i % 8, (i * 3) % 8, (i * 5) % 8) for i in range(256)]
    df = spark.createDataFrame(rows, "id long, x long, y long, z long")
    got = {r["id"]: r["m"] for r in df.select(
        "id", F.expr(Z.morton_sql(["x", "y", "z"], 3)).alias("m")
    ).collect()}
    for i, x, y, z in rows:
        assert got[i] == _morton_ref([x, y, z], 3)
    asg = Z.zorder_assignment(df, ["x", "y", "z"], 4, "id", bits=3)
    sizes = {}
    for r in asg.collect():
        sizes[r["file_id"]] = sizes.get(r["file_id"], 0) + 1
    assert sizes == {f: 64 for f in range(4)}
