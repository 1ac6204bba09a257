"""Count-Min sketch — the bounded-memory frequency path for corpus
heavy-hitter n-grams (Cormode & Muthukrishnan 2005).

The exact heavy-hitter computation is ``groupBy(gram).count()
.filter(cnt >= T)``: its shuffle carries EVERY distinct gram in the
corpus, and a 100 TB corpus has billions of distinct n-grams almost
all of which are far below any useful threshold. The CMS path caps
state at a fixed ``d x 2^w_bits`` integer counter table (64 KiB of
counts at the 4 x 2^14 default) regardless of corpus size, at the
price of bounded, DETERMINISTIC overestimation — estimates never
undercount (every occurrence increments all d of its buckets, so
``est >= true`` always; collisions only inflate), which makes the
CMS a prefilter with the same contract as the Bloom contamination
tier (``operators/bloom.py``): grams passing ``est >= T`` are a
strict SUPERSET of the true heavy set, so the deployment is
CMS-prefilter map-side -> exact count on the surviving occurrences
only. The final shuffle carries just the near-heavy tail instead of
the full distinct-gram set.

Everything is integer math on the repo's one 60-bit md5 keyed hash
(``sampling.md5_hash60``, salts ``cms0..cms{d-1}`` giving the d
independent rows), so the DuckDB oracle replays the counter table —
collisions and overestimates included — and the gate is a full value
hash, not a bound.

Plan shapes (the Bloom discipline):

* Build: d counter increments per occurrence collapse via map-side
  partial aggregation before ONE bounded shuffle of at most
  ``d * 2^w_bits`` rows per partition — corpus size never reaches
  the exchange. Counter tables from disjoint corpora MERGE by
  summing (``cms_merge``) — the sketch is a distributive aggregate,
  so incremental corpus builds stay one bounded table.
* Probe: d BROADCAST joins of the bounded counter table onto the
  probe frame + a ``least()`` projection — zero shuffles on the big
  side, no explode, no per-gram aggregation.
* Heavy hitters: probe per OCCURRENCE map-side, filter
  ``est >= T``, exact groupBy on survivors — the only full-width
  shuffle in the pipeline is over occurrences of near-heavy grams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.sampling import md5_hash60

N_ROWS = 4        # sketch depth d (independent hash rows)
W_BITS = 14       # sketch width = 2^14 buckets per row


def _bucket(gram, row_i: int, w_bits: int):
    """Row-``row_i``'s bucket for ``gram``: the repo's one keyed hash
    under salt ``cms{row_i}``, folded to ``2^w_bits`` buckets."""
    return F.pmod(md5_hash60(gram, f"cms{row_i}"), F.lit(1 << w_bits))


def cms_counters(grams: DataFrame, gram_col: str = "gram",
                 d: int = N_ROWS, w_bits: int = W_BITS) -> DataFrame:
    """(row, bucket, cnt) sparse Count-Min counter table over the
    OCCURRENCES in ``grams[gram_col]`` (one input row = one count;
    pre-aggregated inputs should explode back or use cms_merge over
    batch builds). Sparse on purpose: untouched buckets are zero,
    the broadcast ships only touched rows, and the count partial
    aggregation collapses the build map-side before its single
    bounded shuffle."""
    inc = F.explode(F.array(*[
        F.struct(F.lit(i).alias("row"),
                 _bucket(F.col(gram_col), i, w_bits).alias("bucket"))
        for i in range(d)
    ])).alias("rb")
    return (
        grams.select(inc)
        .groupBy(F.col("rb.row").alias("row"),
                 F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*counter_frames: DataFrame) -> DataFrame:
    """Sum counter tables built from disjoint corpora/batches — the
    CMS is a distributive aggregate, so the merged table is exactly
    the table a one-shot build over the union would produce."""
    out = counter_frames[0]
    for nxt in counter_frames[1:]:
        out = out.unionByName(nxt)
    return out.groupBy("row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_probe(df: DataFrame, gram_col: str, counters: DataFrame,
              d: int = N_ROWS, w_bits: int = W_BITS,
              est_col: str = "est_count") -> DataFrame:
    """``df`` + an ``est_col`` column: the Count-Min estimate
    min over the d rows of each gram's bucket counter (0 for grams
    the build never saw). d broadcast joins of the bounded counter
    table + one least() projection — the big side never shuffles."""
    probed = df.select(
        "*",
        *[_bucket(F.col(gram_col), i, w_bits).alias(f"_pb{i}")
          for i in range(d)],
    )
    for i in range(d):
        side = counters.filter(F.col("row") == i).select(
            F.col("bucket").alias(f"_pb{i}"),
            F.col("cnt").alias(f"_pc{i}"),
        )
        probed = probed.join(F.broadcast(side), f"_pb{i}", "left")
    est = F.least(*[
        F.coalesce(F.col(f"_pc{i}"), F.lit(0)) for i in range(d)
    ]).alias(est_col)
    return probed.select(*df.columns, est)


def heavy_hitters(grams: DataFrame, gram_col: str = "gram",
                  threshold: int = 10, d: int = N_ROWS,
                  w_bits: int = W_BITS,
                  counters: DataFrame | None = None) -> DataFrame:
    """(gram, n_occurrences, est_count) for every gram whose
    Count-Min estimate reaches ``threshold`` — a deterministic
    SUPERSET of the true heavy set (no false negatives: est >= true
    always), with each survivor's EXACT occurrence count from the
    second pass over the filtered stream. ``is_heavy`` is the exact
    verdict; rows with ``is_heavy = false`` are the sketch's
    collision-inflated near-misses (the bounded price of the bounded
    state). The pre-filter runs map-side (broadcast probe), so the
    exact pass's shuffle carries only near-heavy occurrences.

    ``counters``: a prebuilt counter table over the SAME corpus and
    (d, w_bits) — e.g. streaming-maintained state
    (``streaming/heavyhitters.py``); built from ``grams`` when
    omitted."""
    # The exact two-pass is inherent (build pass + filtered count
    # pass — the theoretical minimum for exact survivor counts). The
    # build output is BOUNDED at d * 2^w_bits rows, so it
    # materializes executor-side with an eager localCheckpoint (the
    # coreset discipline): the build scan runs exactly once and no
    # downstream action re-derives it — without shipping the table
    # through the driver as Python rows (a 4 x 2^20 sketch would be
    # 4M-row plan bloat) and without turning a caller-supplied
    # counter frame into eager work.
    if counters is None:
        counters = cms_counters(
            grams, gram_col, d, w_bits).localCheckpoint(eager=True)
    survivors = cms_probe(
        grams.select(gram_col), gram_col, counters, d, w_bits
    ).filter(F.col("est_count") >= threshold)
    return (
        survivors.groupBy(gram_col)
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("est_count").alias("est_count"),
        )
        .withColumn("is_heavy", F.col("n_occurrences") >= threshold)
    )


def gram_occurrences(docs: DataFrame, n: int = 2,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, pos, gram) word n-gram OCCURRENCES per document — the
    posexplode + lead() bulk shape (the q65/shingle discipline: the
    array-HOF form evaluates interpreted and re-materializes the
    gram array per referencing column; one narrow doc-id exchange
    here beats that by ~20x at sf0.1)."""
    from pyspark.sql import Window

    from formula1_data_pipeline_spark.operators.dedup import tokens

    ex = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "t"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    parts = [F.col("t")] + [F.lead("t", i).over(w) for i in range(1, n)]
    return ex.select(
        "id", "pos",
        F.concat_ws(" ", *parts).alias("gram"),
        parts[-1].isNotNull().alias("_full"),
    ).filter(F.col("_full")).drop("_full")


def corpus_heavy_ngrams(docs: DataFrame, n: int = 2,
                        threshold: int = 10,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        d: int = N_ROWS,
                        w_bits: int = W_BITS) -> DataFrame:
    """Corpus-level frequent word n-grams (boilerplate phrases,
    template chrome) via the CMS-prefilter -> exact-count pattern:
    (gram, n_occurrences, est_count, is_heavy) for every n-gram the
    sketch flags at ``threshold``."""
    return heavy_hitters(
        gram_occurrences(docs, n, text_col, id_col),
        "gram", threshold, d, w_bits,
    )
