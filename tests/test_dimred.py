"""Dimensionality reduction (operators/dimred.py): bit-exact
engine-parity of the sparse random projection (the oracle twin
replays the identical IEEE fold), JL distance preservation, PCA
structural guarantees (Gram symmetry, orthonormality, descending
eigenvalues, better-than-isotropic variance capture), and the
shuffle-free plan shape of both projections."""
from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from formula1_data_pipeline_spark.operators import dimred as DR

SF = "/root/testdata/sf0.001"
D, K = 64, 16


@pytest.fixture(scope="module")
def emb(spark):
    # yield + unpersist: a leaked cache over a raw parquet scan leaks
    # InMemoryTableScan into later tests' plans over the same file
    # (see test_aggmart.docs)
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    yield df
    df.unpersist()


def test_sign_matrix_is_deterministic_and_balanced():
    m = DR.rp_matrix(D, K)
    assert m == DR.rp_matrix(D, K)
    assert all(v in (1.0, -1.0) for row in m for v in row)
    # md5-driven signs are near-balanced (not degenerate)
    total = sum(v for row in m for v in row)
    assert abs(total) < 0.25 * D * K


def test_projection_bit_identical_to_oracle(spark, emb):
    import duckdb

    got = {r["vec_id"]: list(r["proj"]) for r in
           DR.random_project(emb, "embedding", d=D, k=K)
           .select("vec_id", "proj").collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS "
            f"SELECT * FROM '{SF}/embeddings.parquet'")
    expr = DR.rp_oracle_expr(
        "list_transform(embedding, x -> CAST(x AS DOUBLE))", D, K)
    for vid, p in con.sql(
            f"SELECT vec_id, {expr} FROM embeddings").fetchall():
        assert got[vid] == list(p)  # exact float equality


def test_jl_distance_preservation(spark, emb):
    """Pairwise squared distances in the projected space concentrate
    around the originals (the JL property the reducer exists for):
    median ratio within 1 +- 0.15 and the central 90% within
    [0.4, 2.2] on a 50-vector sample — k=16 keeps a wide single-pair
    tail, so the extremes are deliberately not bounded."""
    rows = (DR.random_project(emb, "embedding", d=D, k=K)
            .filter(F.col("vec_id") < 50)
            .select("vec_id", "embedding", "proj").collect())
    ratios = []
    for i in range(len(rows)):
        vi = np.array(rows[i]["embedding"], dtype=np.float64)
        pi = np.array(rows[i]["proj"])
        for j in range(i + 1, len(rows)):
            dv = vi - np.array(rows[j]["embedding"], dtype=np.float64)
            dp = pi - np.array(rows[j]["proj"])
            d2 = float(dv @ dv)
            if d2 > 0:
                ratios.append(float(dp @ dp) / d2)
    ratios.sort()
    n = len(ratios)
    assert abs(ratios[n // 2] - 1.0) < 0.15
    assert 0.4 < ratios[int(n * 0.05)] and ratios[int(n * 0.95)] < 2.2


def test_projection_plan_is_shuffle_free(spark, emb):
    plan = (DR.random_project(emb, "embedding", d=D, k=K)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_gram_matrix_matches_numpy(spark, emb):
    X = np.array([r["embedding"] for r in
                  emb.select("embedding").collect()], dtype=np.float64)
    g = np.array(DR.gram_matrix(emb, "embedding", D))
    assert g.shape == (D, D)
    assert np.allclose(g, g.T, atol=0.0)  # exact symmetry by construction
    assert np.allclose(g, X.T @ X, rtol=1e-9)


def test_pca_structure_and_variance_capture(spark, emb):
    ev, comps = DR.pca_fit(emb, "embedding", d=D, k=8)
    assert all(ev[i] >= ev[i + 1] for i in range(7))
    C = np.array(comps)
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-8)
    g = np.array(DR.gram_matrix(emb, "embedding", D))
    # top-8 directions must beat the isotropic floor 8/64
    assert sum(ev) / np.trace(g) > 8 / 64


def test_pca_projection_matches_numpy(spark, emb):
    ev, comps = DR.pca_fit(emb, "embedding", d=D, k=4)
    got = {r["vec_id"]: np.array(r["pca"]) for r in
           DR.pca_project(emb, "embedding", comps)
           .select("vec_id", "pca").collect()}
    C = np.array(comps)
    for r in emb.select("vec_id", "embedding").limit(20).collect():
        want = C @ np.array(r["embedding"], dtype=np.float64)
        assert np.allclose(got[r["vec_id"]], want, rtol=1e-9)


def test_gram_mart_fold_matches_one_shot(spark, emb, tmp_path):
    mart = str(tmp_path / "gm")
    for b in range(3):
        n = DR.gram_mart_append(
            spark, emb.filter(F.col("vec_id") % 3 == b),
            mart, "embedding", D, f"b{b}")
        # gram upper triangle + d sum cells + the count cell
        assert n == D * (D + 1) // 2 + D + 1
    # re-delivery is caught by the marker probe
    assert DR.gram_mart_append(
        spark, emb.filter(F.col("vec_id") % 3 == 0),
        mart, "embedding", D, "b0") == 0
    got = np.array(DR.gram_from_mart(spark, mart, D))
    want = np.array(DR.gram_matrix(emb, "embedding", D))
    assert np.allclose(got, want, rtol=1e-9)


def test_pca_fit_from_mart_matches_full_fit(spark, emb, tmp_path):
    """Refit from landed cells == full-corpus fit to float-sum
    tolerance: eigenvalues close, and the spanned subspaces agree
    (projector comparison — eigenVECTOR signs are arbitrary)."""
    mart = str(tmp_path / "gm")
    for b in range(4):
        DR.gram_mart_append(
            spark, emb.filter(F.col("vec_id") % 4 == b),
            mart, "embedding", D, f"b{b}")
    ev_m, comps_m = DR.pca_fit_from_mart(spark, mart, D, 6)
    ev_f, comps_f = DR.pca_fit(emb, "embedding", D, 6)
    assert np.allclose(ev_m, ev_f, rtol=1e-8)
    Pm = np.array(comps_m).T @ np.array(comps_m)
    Pf = np.array(comps_f).T @ np.array(comps_f)
    assert np.allclose(Pm, Pf, atol=1e-6)


def test_centered_pca_matches_numpy_covariance(spark, emb):
    """center=True must equal numpy PCA on the centered data: same
    eigenvalues and the same spanned subspace, from BOTH the one-shot
    fit and a 3-batch mart refit (the sum/count cells every append
    lands make centering free)."""
    X = np.array([r["embedding"] for r in
                  emb.select("embedding").collect()], dtype=np.float64)
    mu = X.mean(axis=0)
    Xc = X - mu
    vals, vecs = np.linalg.eigh(Xc.T @ Xc)
    want = np.sort(vals)[::-1][:6]

    ev, comps = DR.pca_fit(emb, "embedding", d=D, k=6, center=True)
    assert np.allclose(ev, want, rtol=1e-8)
    C = np.array(comps)
    assert np.allclose(C @ C.T, np.eye(6), atol=1e-8)

    # mean from the same moment pass
    got_mu = np.array(DR.pca_mean(emb, "embedding", D))
    assert np.allclose(got_mu, mu, rtol=1e-9)

    # centered projection: literal offsets, never a second fold
    got = {r["vec_id"]: np.array(r["pca"]) for r in
           DR.pca_project(emb, "embedding", comps, mean=list(got_mu))
           .select("vec_id", "pca").collect()}
    for r in emb.select("vec_id", "embedding").limit(10).collect():
        wantp = C @ (np.array(r["embedding"], dtype=np.float64) - got_mu)
        assert np.allclose(got[r["vec_id"]], wantp, atol=1e-6)


def test_centered_fit_from_mart_matches_full(spark, emb, tmp_path):
    mart = str(tmp_path / "gm")
    for b in range(3):
        DR.gram_mart_append(spark, emb.filter(F.col("vec_id") % 3 == b),
                            mart, "embedding", D, f"b{b}")
    ev_m, comps_m = DR.pca_fit_from_mart(spark, mart, D, 6, center=True)
    ev_f, comps_f = DR.pca_fit(emb, "embedding", D, 6, center=True)
    assert np.allclose(ev_m, ev_f, rtol=1e-8)
    Pm = np.array(comps_m).T @ np.array(comps_m)
    Pf = np.array(comps_f).T @ np.array(comps_f)
    assert np.allclose(Pm, Pf, atol=1e-6)


def test_rp_topk_recall_on_clustered_data(spark):
    """Binding recall on a CLUSTERED fixture (the q92 Lloyd-gate
    discipline): JL projection preserves distances to (1 +- eps) with
    eps ~ sqrt(8 ln n / k), so candidate generation recovers true
    neighbors when inter-point margins exceed eps — i.e. on data
    with structure. On the near-isotropic synthetic embeddings table
    the top-5 margins sit BELOW eps at k=16 (measured: recall@5 0.38
    at m=30, rising monotonically to 0.62 at m=100), which is the
    JL bound behaving, not a defect — so the binding assertion lives
    here, where margins are real: 8 md5-derived centroids, 40 points
    each with small deterministic perturbations, recall@5 >= 0.9 at
    m=30."""
    import hashlib

    from formula1_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    def unit(tag, i):
        h = hashlib.md5(f"{tag}|{i}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) % 2 == 0 else -1.0

    rows = []
    vid = 0
    for c in range(8):
        cent = [unit(f"cent{c}", i) for i in range(D)]
        for p in range(40):
            vec = [cent[i] + 0.15 * unit(f"pt{c}|{p}", i)
                   for i in range(D)]
            rows.append((vid, vec))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") % 40 == 0)  # one per cluster
    got = DR.rp_topk(df, queries, d=D, k_proj=K, n_candidates=30,
                     top_k=5).collect()
    exact = cosine_topk(df, queries, k=5).collect()
    exact_pairs = {(r["q_id"], r["n_id"]) for r in exact}
    exact_scores = {(r["q_id"], r["n_id"]): r["cos_sim"] for r in exact}
    hit = sum((r["q_id"], r["n_id"]) in exact_pairs for r in got)
    assert hit / len(exact_pairs) >= 0.9
    # re-rank IS exact on survivors: returned scores equal the exact
    # cosine wherever the pair is a true top-5 member
    for r in got:
        key = (r["q_id"], r["n_id"])
        if key in exact_scores:
            assert r["cos_sim"] == exact_scores[key]


def test_rp_topk_full_candidates_equals_exact(spark, emb):
    """With n_candidates covering the whole corpus the re-rank IS the
    exact search — row-identical to cosine_topk."""
    from formula1_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    queries = emb.filter(F.col("vec_id") < 5)
    n = emb.count()
    got = sorted(
        tuple(r) for r in
        DR.rp_topk(emb, queries, d=D, k_proj=K, n_candidates=n,
                   top_k=5).collect())
    want = sorted(tuple(r) for r in
                  cosine_topk(emb, queries, k=5).collect())
    assert got == want


def test_scale_is_exact_for_square_k():
    # k=16 -> 1/sqrt(k) = 0.25 exactly; the projection introduces no
    # scale rounding beyond the fold itself
    assert 1.0 / math.sqrt(16) == 0.25


def test_short_or_null_vectors_raise_loudly(spark):
    """Round-12 ADVICE: a short or NULL-element vector used to make
    element_at yield NULLs whose products the sum silently dropped —
    an undetectably undercounted Gram mart. Both the gram pass and
    random_project must fail LOUDLY instead."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from formula1_data_pipeline_spark.operators import dimred as DR

    bad_short = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id int, embedding array<double>")
    bad_null = spark.createDataFrame(
        [(1, [1.0, None, 3.0])], "vec_id int, embedding array<double>")
    for bad in (bad_short, bad_null):
        with pytest.raises((SparkRuntimeException, Py4JJavaError),
                           match="NULL-free length-3"):
            DR._gram_cells(bad, "embedding", 3).collect()
        with pytest.raises((SparkRuntimeException, Py4JJavaError),
                           match="NULL-free length-3"):
            DR.random_project(bad, "embedding", d=3, k=4).collect()


def test_null_vector_passes_through_as_null_components(spark):
    """Round-12 ADVICE follow-up: size(NULL) is NULL, so the shape
    guard's WHEN fell to the error arm for a NULL VECTOR — raising
    with a NULL-propagated, empty message. A NULL vector now passes
    through (NULL components, the pre-guard behavior _gram_cells'
    isNotNull filter mirrors); only genuinely malformed vectors
    raise, and with an informative size in the message."""
    from formula1_data_pipeline_spark.operators import dimred as DR

    mixed = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, None)],
        "vec_id int, embedding array<double>")
    rows = {r["vec_id"]: r["proj"]
            for r in DR.random_project(mixed, "embedding",
                                       d=3, k=4).collect()}
    assert all(v is not None for v in rows[1])
    assert all(v is None for v in rows[2])
