"""Product quantization (PQ) + asymmetric-distance (ADC) search —
the compressed-domain ANN tier (Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011; the faiss IndexPQ
baseline).

Where ``quantize.py`` (SQ8) compresses each DIMENSION independently
(4x, reconstruction-faithful), PQ compresses the whole VECTOR to
``m`` byte codes (here 8 codes for d=64 — 32x vs float32) by
splitting it into ``m`` subspaces and vector-quantizing each against
a k-entry codebook. Search never reconstructs: a query builds an
``m x k`` lookup table of exact subspace distances ONCE, and every
corpus vector scores as ``m`` table lookups over its codes — the
asymmetric distance computation (ADC). Exact re-rank of the top
candidates restores exact ordering (the ``rp_topk``/IVF two-stage
discipline).

Spark shape:

* **Training** (``train_pq_codebooks``): md5 hash-sample init (k
  corpus vectors sliced per subspace — deterministic), then
  ``n_iter`` Lloyd rounds with ONE fused pass each: every vector
  explodes to its m (subspace, subvector) rows, assigns to the
  nearest centroid with the codebooks inlined as literals, and one
  per-(subspace, cluster, dim) mean aggregate ships m*k*sub partial
  sums. The driver holds m*k*sub doubles between rounds — the MLlib
  pattern (``similarity.train_ivf_centroids``'s fused-scan shape,
  pointed at m codebooks at once). Means are float sums, so trained
  codebooks gate on RECALL BOUNDS (the q92 rule), never value
  hashes.
* **Encode** (``pq_encode``): one shuffle-free codegen'd projection
  — per subspace, argmax of ``2 x.c - ||c||^2`` over the k centroids
  (algebraically argmin L2; built as ONE SQL string per the q22
  plan-construction lesson), first-max tiebreak for determinism.
* **Search** (``pq_adc_topk``): the query set is small (the
  broadcast-queries contract shared with ``cosine_topk``), so the
  LUTs are computed DRIVER-side (m x k floats per query) and ride as
  literal columns on a broadcast join; corpus-side scoring is m
  ``element_at`` lookups folded per row — no shuffle, no vector
  arithmetic, and at 100 TB the scan reads ONLY the m-byte code
  column (32x less IO than the exact path). Exact cosine re-ranks
  the ADC top-``n_candidates`` only, with candidate vectors fetched
  through a candidates-broadcast semi-join — vectors never ride a
  pairs-sized shuffle.

Composition note: production PQ usually rides inside an IVF index
(IVF-PQ) — assign to a cell list (``vecindex``), then ADC within
probed cells. The pieces here compose exactly that way (encode the
residual or raw vector per list row); the flat variant is the
recall-measurable core.

Pre-staged round 13; LANDING ROUTE: rides q92's r15 re-gate (q92
owns the ANN-recall surface; gated r13, due r15) as kind='pq' rows —
a recall-floor boolean against the exact top-5 on the clustered
fixture (trained codebooks) plus a deterministic encode-roundtrip
boolean. Draft: tests/test_r16_gate_drafts.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators.similarity import (
    _as_double,
    dot,
    norm,
)


def _check_geometry(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    return dim // m


def _unit(vec_col):
    """L2-normalize (zero vectors stay zero): with unit vectors,
    ||q - n||^2 = 2 - 2 cos(q, n), so the ADC L2 ranking is MONOTONE
    in cosine — the standard cosine-metric PQ reduction (without it,
    L2 candidate ranks disagree with the cosine ground truth on
    norm-varying corpora; measurements below)."""
    nrm = norm(vec_col)
    return F.when(nrm == 0.0, vec_col).otherwise(
        F.transform(vec_col, lambda x: x / nrm))


# measured on the clustered fixture (800 x 16, m=4, k=8, 3 Lloyd
# rounds, 10% candidate window): recall@5 vs exact cosine = 1.0 with
# the unit-vector reduction, 0.64-0.83 without it / with a 5% window
# — the gate floor below leaves slack for trained-float variance


def train_pq_codebooks(
    vecs: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """``codebooks[j][c]`` = centroid ``c`` (length dim/m) of subspace
    ``j``. Hash-sample init (k corpus vectors, deterministic), then
    ``n_iter`` fused Lloyd rounds — one corpus pass each, all m
    subspaces assigned and re-averaged together. Empty cells keep
    their previous centroid (no vanishing codewords)."""
    sub = _check_geometry(dim, m)
    base = vecs.select(
        F.col(id_col).alias("id"),
        _unit(_as_double(F.col(vec_col))).alias("vec"),
    ).filter(F.col("vec").isNotNull())

    # init: the md5 hash-sample discipline (exactly reproducible)
    seed_rows = (
        base.orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(k).collect()
    )
    if len(seed_rows) < k:
        raise ValueError(
            f"corpus has {len(seed_rows)} vectors < k={k} codewords")
    books: list[list[list[float]]] = [
        [[float(x) for x in r["vec"][j * sub:(j + 1) * sub]]
         for r in seed_rows]
        for j in range(m)
    ]

    for _ in range(n_iter):
        # one fused pass: all m codes per vector in one projection
        # (each subspace assigned exactly once), then (j, code, dim)
        # means — the per-iteration corpus cost is encode + one
        # skinny m*k*sub-group aggregate
        enc = pq_encode(base, "vec", books, out_col="pq")
        stacked = enc.select(
            F.posexplode(
                F.arrays_zip(
                    F.col("pq").alias("code"),
                    F.array(*[
                        F.slice("vec", j * sub + 1, sub)
                        for j in range(m)
                    ]).alias("sv"),
                )
            ).alias("j", "z")
        )
        means = (
            stacked.select(
                "j", F.col("z.code").alias("code"),
                F.posexplode("z.sv").alias("t", "val"))
            .groupBy("j", "code", "t")
            .agg(F.avg("val").alias("mean"))
            .collect()  # <= m * k * sub rows — driver-bounded
        )
        fresh: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            fresh.setdefault((r["j"], r["code"]), {})[r["t"]] = r["mean"]
        for (j, c), dd in fresh.items():
            books[j][c] = [dd[t] for t in sorted(dd)]
    return books


def _score_terms(sv_sql: str, cent: list[float]) -> str:
    """SQL for ``2 x.c - ||c||^2`` of one subvector against one
    literal centroid — argmax of this over c is argmin L2."""
    dots = " + ".join(
        f"element_at({sv_sql}, {t + 1}) * {x!r}"
        for t, x in enumerate(cent)
    )
    ncsq = sum(x * x for x in cent)
    return f"(2.0 * ({dots}) - {ncsq!r})"


def _argmin_sql(sv_sql: str, book: list[list[float]]) -> str:
    """SQL: nearest-codeword index of subvector ``sv_sql`` in one
    codebook — argmax of ``2 x.c - ||c||^2`` with first-max tiebreak
    (array_position finds the first occurrence: deterministic)."""
    scores = ", ".join(_score_terms(sv_sql, c) for c in book)
    return (
        f"CAST(array_position(array({scores}), "
        f"array_max(array({scores}))) - 1 AS INT)"
    )


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks: list[list[list[float]]],
    out_col: str = "pq",
) -> DataFrame:
    """Append ``out_col``: the m int codes, one shuffle-free
    codegen'd projection with the codebooks inlined as literals
    (built as one SQL string — the q22 plan-construction lesson)."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    vec = f"transform({vec_col}, x -> CAST(x AS DOUBLE))"
    codes = ", ".join(
        _argmin_sql(f"slice({vec}, {j * sub + 1}, {sub})",
                    codebooks[j])
        for j in range(m)
    )
    return df.withColumn(out_col, F.expr(f"array({codes})"))


def _luts(q_rows, books: list[list[list[float]]],
          sub: int) -> list[tuple]:
    """(q_id, q_vec, lut) per query — lut[j][c] = exact L2^2 of the
    query's j-th subvector to codeword c, computed driver-side (the
    query set is broadcast-small by contract)."""
    out = []
    for r in q_rows:
        qv = [float(x) for x in r["vec"]]
        nrm = sum(x * x for x in qv) ** 0.5
        qn = [x / nrm for x in qv] if nrm else qv  # codebook space
        lut = [
            [sum((qn[j * sub + t] - c[t]) ** 2 for t in range(sub))
             for c in books[j]]
            for j in range(len(books))
        ]
        out.append((r["id"], qv, lut))
    return out


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int,
    k: int = 5,
    n_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str | None = None,
) -> DataFrame:
    """Top-``k`` (q_id, n_id, cos_sim, rank) per query: ADC candidate
    stage over the m-byte codes (m table lookups per corpus row, no
    shuffle), exact cosine re-rank of the top ``n_candidates`` only.
    Self-matches excluded, (cos desc, n_id) tiebreaks — the
    ``cosine_topk`` output contract.

    ``code_col``: name of a PRE-ENCODED codes column already on
    ``corpus`` (must have been produced by ``pq_encode`` over
    unit-normalized vectors under the SAME codebooks). The
    production path: encode once at ingest, persist the m-int
    column, and every search scans codes without touching the float
    vectors until the candidate re-fetch. ``None`` encodes inline
    (self-contained gates/tests)."""
    m = len(codebooks)
    sub = _check_geometry(dim, m)
    spark = corpus.sparkSession
    # raw vectors feed the exact re-rank (cosine is scale-invariant
    # but its 6-dp ROUNDING must match cosine_topk bit-for-bit, so
    # the re-rank never sees normalized copies); the UNIT copy feeds
    # only the encode, matching the codebooks' training space
    base = corpus.select(
        F.col(id_col).alias("n_id"),
        _as_double(F.col(vec_col)).alias("n_vec"),
        *([F.col(code_col).alias("pq")] if code_col else []),
    ).filter(F.col("n_vec").isNotNull())
    if code_col:
        coded = base.select("n_id", "pq")
    else:
        coded = (
            base.select("n_id", _unit(F.col("n_vec")).alias("n_unit"))
            .transform(lambda d: pq_encode(d, "n_unit", codebooks,
                                           out_col="pq"))
            .select("n_id", "pq")
        )

    q_rows = queries.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("vec"),
    ).filter(F.col("vec").isNotNull()).collect()
    # q_id schema follows the caller's id type (the bm25_index_topk
    # qid-type lesson: a hardcoded bigint crashes createDataFrame on
    # string ids)
    qid_type = dict(queries.dtypes)[id_col]
    qlut = spark.createDataFrame(
        _luts(q_rows, codebooks, sub),
        f"q_id {qid_type}, q_vec array<double>, "
        "lut array<array<double>>",
    )

    adc = F.aggregate(
        F.zip_with(
            F.col("pq"), F.col("lut"),
            lambda c, row: F.element_at(row, c.cast("int") + 1),
        ),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    from pyspark.sql import Window

    cand = (
        coded.join(F.broadcast(qlut), F.col("n_id") != F.col("q_id"))
        .withColumn("adc_dist", adc)
        .withColumn(
            "cand_rank",
            F.row_number().over(
                Window.partitionBy("q_id")
                .orderBy(F.col("adc_dist").asc(), F.col("n_id").asc())
            ),
        )
        .filter(F.col("cand_rank") <= n_candidates)
        .select("q_id", "q_vec", "n_id")
    )
    # exact re-rank: candidate vectors re-fetched via a broadcast
    # semi-join on the candidate ids — vectors never ride a
    # pairs-sized shuffle (the rp_topk stage-2 shape)
    ids = cand.select("n_id").distinct()
    vecs = base.join(F.broadcast(ids), "n_id")
    cos = F.round(
        dot(F.col("q_vec"), F.col("n_vec"))
        / F.nullif(norm(F.col("q_vec")) * norm(F.col("n_vec")),
                   F.lit(0.0)),
        6,
    )
    return (
        cand.join(vecs, "n_id")
        .withColumn("cos_sim", cos)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("q_id")
                .orderBy(F.col("cos_sim").desc(), F.col("n_id").asc())
            ),
        )
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos_sim", "rank")
    )
