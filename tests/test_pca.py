"""operators/similarity.pca_whiten_params + j45 — distributed PCA fit
must equal single-node numpy under the same conventions (population
covariance, descending eigenvalues, max-|loading|-positive sign,
1/sqrt(eig) whitening), and the whitened output must satisfy the
definitional law cov(projections) = I."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from scopus_spark.catalog import table
from scopus_spark.operators.similarity import pca_whiten_params


def _numpy_fit(x: np.ndarray, q: int):
    n = x.shape[0]
    mean = x.mean(axis=0)
    cov = (x.T @ x) / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:q]
    vals, vecs = eigvals[order], eigvecs[:, order]
    for j in range(vecs.shape[1]):
        if vecs[np.argmax(np.abs(vecs[:, j])), j] < 0:
            vecs[:, j] = -vecs[:, j]
    return mean, vecs / np.sqrt(np.maximum(vals, 1e-12)), vals, n


def test_fit_matches_numpy(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    x = np.stack(
        [np.array(r.embedding, dtype=np.float64) for r in e.collect()]
    )
    want_mean, want_w, want_vals, want_n = _numpy_fit(x, 4)
    got_mean, got_w, got_vals, got_n = pca_whiten_params(e, q=4)
    assert got_n == want_n
    np.testing.assert_allclose(got_mean, want_mean, atol=1e-9)
    np.testing.assert_allclose(got_vals, want_vals, rtol=1e-8)
    np.testing.assert_allclose(got_w, want_w, rtol=1e-5, atol=1e-8)


def test_whitened_covariance_is_identity(spark, sf_dir):
    from scopus_spark.queries.pipeline import j45_pca_whiten

    out = j45_pca_whiten(spark, sf_dir).toPandas()
    p = out[["pc1", "pc2", "pc3", "pc4"]].to_numpy()
    cov = (p.T @ p) / p.shape[0] - np.outer(p.mean(0), p.mean(0))
    np.testing.assert_allclose(cov, np.eye(4), atol=1e-3)
    assert len(out) == out["vec_id"].nunique()


def test_projection_plan_is_jvm_side(spark, sf_dir):
    """The hot path must stay inside codegen: after the fit, the
    projection plan may contain no Python eval operator of any kind."""
    from scopus_spark.queries.pipeline import j45_pca_whiten

    plan = (
        j45_pca_whiten(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "InPandas" not in plan
