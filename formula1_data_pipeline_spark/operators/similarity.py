"""Embedding similarity search (SURVEY.md §2.12 mandate).

- **cosine_topk** — brute-force exact top-k: broadcast the (small)
  query set against the corpus; per-row dot/norm as JVM fold
  expressions (sequential double accumulation — deterministic and
  oracle-matchable); rank per query. The correctness baseline.
- **ann_lsh_topk** — the scale path: random-hyperplane LSH buckets
  (sign-bit sketch from deterministic per-dimension hashes), candidates
  = same-bucket pairs, exact cosine on candidates only. At 100 TB the
  corpus shuffles once on bucket keys instead of cross-joining.

Embeddings are ``array<float>``; all math is widened to double first
(float kernels lose determinism across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b, dim: int | None = None) -> Column:
    """Sequential-fold dot product in double (deterministic order).

    Stays the interpreted ``zip_with``/``aggregate`` fold on purpose:
    unrolling the fold into a 64-term GetArrayItem sum chain was built
    and measured (round 2) at 3-5x SLOWER end-to-end — the ~400-node
    expression trees blow up codegen/compile time and fall out of
    whole-stage codegen. The cheap structural win is precomputing
    norms per *vector* instead of per *pair* (see ``with_norm``); the
    remaining per-pair fold is candidate-bounded. ``dim`` is accepted
    for API stability and ignored.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a, b, dim: int | None = None) -> Column:
    return dot(a, b, dim) / F.nullif(norm(a, dim) * norm(b, dim), F.lit(0.0))


def cosine_from_norms(a: Column, b: Column, norm_a: Column,
                      norm_b: Column) -> Column:
    """Cosine with the norms supplied from per-vector precomputation —
    one fold per pair instead of three. Bit-identical to ``cosine``:
    same dot fold, same operands to the final division."""
    return dot(a, b) / F.nullif(norm_a * norm_b, F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self).

    Output: q_id, n_id, cos_sim, rank. ``round_dp`` rounds the score
    before ranking (with an id tiebreak) so rankings are reproducible
    across engines; pass None for raw scores. Pass ``dim`` to unroll
    the per-pair cosine into codegen (see ``dot``).
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_norm", norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
    ).withColumn("n_norm", norm(F.col("n_vec")))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .select(
            "q_id", "n_id",
            cosine_from_norms(F.col("q_vec"), F.col("n_vec"),
                              F.col("q_norm"), F.col("n_norm"))
            .alias("cos_raw"),
        )
    )
    score = (
        F.round(F.col("cos_raw"), round_dp) if round_dp is not None
        else F.col("cos_raw")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("n_id").asc()
    )
    return (
        scored.select("q_id", "n_id", score.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a hash
    (no RNG state — reproducible across runs/executors)."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).digest()
        vals.append(int.from_bytes(h[:8], "big") / 2**63 - 1.0)
    return vals


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-bit sketch: bucket id from n hyperplane sign bits.
    Per-row (not per-pair) cost — the interpreted fold is fine here."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        bits.append(F.when(dot(vec, plane) >= 0, 2 ** p).otherwise(0))
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine among same-bucket candidates.

    Recall/cost tradeoff via n_planes (8 planes -> 256 buckets).
    Output schema matches cosine_topk; ranks are per-query among
    candidates found.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(F.col(vec_col)).alias("q_vec")
    ).withColumns({
        "bucket": lsh_bucket(F.col("q_vec"), dim, n_planes),
        "q_norm": norm(F.col("q_vec")),
    })
    c = corpus.select(
        F.col(id_col).alias("n_id"), _as_double(F.col(vec_col)).alias("n_vec")
    ).withColumns({
        "bucket": lsh_bucket(F.col("n_vec"), dim, n_planes),
        "n_norm": norm(F.col("n_vec")),
    })
    scored = (
        c.join(q, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id", "n_id",
            F.round(
                cosine_from_norms(F.col("q_vec"), F.col("n_vec"),
                                  F.col("q_norm"), F.col("n_norm")), 6)
            .alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("n_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    dim: int,
    n_planes: int = 8,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs in embedding space: LSH-bucket blocking,
    then exact cosine >= threshold within buckets (a_id < b_id).

    The embedding-space analogue of MinHash near-dup: the self-join
    shuffles on bucket keys only; cosine runs on candidates. Misses
    only pairs split across buckets — acceptable at threshold ~0.99
    where sign sketches rarely differ; lower n_planes to trade cost
    for recall.
    """
    v = corpus.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    ).withColumns({
        "bucket": lsh_bucket(F.col("vec"), dim, n_planes),
        "nrm": norm(F.col("vec")),
    })
    a = v.select(F.col("id").alias("a_id"), F.col("vec").alias("a_vec"),
                 F.col("nrm").alias("a_norm"), "bucket")
    b = v.select(F.col("id").alias("b_id"), F.col("vec").alias("b_vec"),
                 F.col("nrm").alias("b_norm"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id",
            F.round(
                cosine_from_norms(F.col("a_vec"), F.col("b_vec"),
                                  F.col("a_norm"), F.col("b_norm")), 6)
            .alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
