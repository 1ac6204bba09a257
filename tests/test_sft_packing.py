"""No-straddle greedy packing + SFT loss-mask layout
(operators/packing.py, round 10) vs a Python reference of the same
bucket-aligned greedy fold."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.packing import (
    pack_examples_nostraddle,
    sft_pack_with_loss_mask,
)

_SETTINGS = dict(max_examples=8, deadline=None)


def _ref_pack(items, budget, bucket_size):
    """(id, n) -> {id: (bin, pos)} — greedy fill, bins never cross
    bucket boundaries, global bin ids by bucket prefix."""
    from collections import defaultdict

    buckets = defaultdict(list)
    for i, n in items:
        buckets[i // bucket_size].append((i, n))
    out, bin_off = {}, 0
    for b in sorted(buckets):
        cur, fill = 0, 0
        for i, n in sorted(buckets[b]):
            if fill + n > budget:
                cur, fill = cur + 1, 0
            out[i] = (bin_off + cur, fill)
            fill += n
        bin_off += cur + 1
    return out


@settings(**_SETTINGS)
@given(data=st.lists(
    st.integers(min_value=1, max_value=64),
    min_size=1, max_size=40,
), budget=st.sampled_from([64, 100]), bucket=st.sampled_from([7, 1000]))
def test_matches_greedy_reference(spark, data, budget, bucket):
    items = list(enumerate(data))
    df = spark.createDataFrame(items, "example_id long, n long")
    got = {
        r.example_id: (r.bin_id, r.pack_pos)
        for r in pack_examples_nostraddle(
            df, F.col("n"), budget=budget, id_col="example_id",
            bucket_size=bucket,
        ).collect()
    }
    assert got == _ref_pack(items, budget, bucket)


def test_no_straddle_invariant(spark):
    df = spark.createDataFrame(
        [(i, 30) for i in range(50)], "example_id long, n long"
    )
    rows = pack_examples_nostraddle(
        df, F.col("n"), budget=100, id_col="example_id"
    ).collect()
    for r in rows:
        assert r.pack_pos + r.n_tokens <= 100  # fully inside the bin
    # 3 per bin (30*3=90 <= 100 < 120)
    from collections import Counter
    per_bin = Counter(r.bin_id for r in rows)
    assert set(per_bin.values()) <= {3, 2, 1}
    assert max(per_bin.values()) == 3


def test_oversized_example_fails_loudly(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 999)], "example_id long, n long"
    )
    with pytest.raises(Exception, match="exceeds the bin budget"):
        pack_examples_nostraddle(
            df, F.col("n"), budget=100, id_col="example_id"
        ).collect()


def test_sft_mask_spans_and_attention_segments(spark):
    df = spark.createDataFrame(
        [(0, 10, 20), (1, 5, 15), (2, 40, 50), (3, 1, 2)],
        "example_id long, p long, c long",
    )
    rows = {
        r.example_id: r
        for r in sft_pack_with_loss_mask(
            df, F.col("p"), F.col("c"), budget=100,
            id_col="example_id",
        ).collect()
    }
    # ex0: 30 toks at pos 0; ex1: 20 toks at pos 30; ex2: 90 -> new
    # bin; ex3: 3 toks after ex2
    assert (rows[0].bin_id, rows[0].pack_pos) == (0, 0)
    assert (rows[1].bin_id, rows[1].pack_pos) == (0, 30)
    assert (rows[2].bin_id, rows[2].pack_pos) == (1, 0)
    assert (rows[3].bin_id, rows[3].pack_pos) == (1, 90)
    # loss spans cover exactly the completion
    assert (rows[0].loss_start, rows[0].loss_end) == (10, 30)
    assert (rows[1].loss_start, rows[1].loss_end) == (35, 50)
    assert (rows[2].loss_start, rows[2].loss_end) == (40, 90)
    # attention segments: index within bin by position
    assert (rows[0].attn_seg, rows[1].attn_seg) == (0, 1)
    assert (rows[2].attn_seg, rows[3].attn_seg) == (0, 1)


def test_fractional_id_rejected_loudly(spark):
    """Review regression: a double id was silently truncated inside
    the bucket fold (1.5 -> 1), and the loss-mask join-back dropped
    every row with zero output; integral ids are now required."""
    import pytest
    from pyspark.sql import functions as F

    from formula1_data_pipeline_spark.operators.packing import (
        pack_examples_nostraddle,
    )

    df = spark.createDataFrame(
        [(1.5, 10), (2.5, 10)], "example_id double, n long")
    with pytest.raises(TypeError, match="integral"):
        pack_examples_nostraddle(df, F.col("n"), budget=64,
                                 id_col="example_id")


def test_zero_token_example_attn_seg_deterministic(spark):
    """Review regression: equal pack_pos rows (a zero-token example
    and its successor) had a layout-dependent row_number; the id
    tiebreak pins the segment ids."""
    from pyspark.sql import functions as F

    from formula1_data_pipeline_spark.operators.packing import (
        sft_pack_with_loss_mask,
    )

    df = spark.createDataFrame(
        [(5, 0, 0), (6, 4, 6), (7, 2, 2)],
        "example_id long, p long, c long",
    )
    out = {r["example_id"]: r["attn_seg"]
           for r in sft_pack_with_loss_mask(
               df, F.col("p"), F.col("c"), budget=64).collect()}
    rep = {r["example_id"]: r["attn_seg"]
           for r in sft_pack_with_loss_mask(
               df.repartition(5), F.col("p"), F.col("c"),
               budget=64).collect()}
    assert out == rep
    # zero-token id 5 shares pack_pos 0 with id 6: id order pins 5
    # to segment 0, 6 to 1
    assert out[5] == 0 and out[6] == 1 and out[7] == 2
