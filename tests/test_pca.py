"""Distributed PCA (functions/pca.py): numpy parity of the fitted model,
projection invariants, and the one-row-per-task partial contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from starryskyqueryengine_spark.functions.pca import pca_fit, pca_project
from starryskyqueryengine_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_np(spark):
    emb = load_table(spark, SF, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return np.asarray([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def test_fit_matches_numpy(spark, emb_np):
    emb = load_table(spark, SF, "embeddings").repartition(7)  # odd split
    model = pca_fit(emb, k=8)

    mean = emb_np.mean(axis=0)
    cov = (emb_np.T @ emb_np) / len(emb_np) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:8]
    want_ev = evals[order]

    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["explained_variance"], want_ev, rtol=1e-8)
    # eigenvectors match up to the pinned sign convention
    for i, j in enumerate(order):
        v = evecs[:, j]
        v = v * np.sign(v[np.abs(v).argmax()])
        assert np.allclose(model["components"][i], v, atol=1e-8), i
    # variances are sorted descending and nonnegative
    ev = model["explained_variance"]
    assert np.all(np.diff(ev) <= 1e-12) and ev[-1] >= -1e-12


def test_fit_partition_invariant(spark):
    emb = load_table(spark, SF, "embeddings")
    m1 = pca_fit(emb.repartition(3), k=4)
    m2 = pca_fit(emb.repartition(13), k=4)
    assert np.allclose(m1["components"], m2["components"], atol=1e-8)
    assert np.allclose(
        m1["explained_variance"], m2["explained_variance"], rtol=1e-9
    )


def test_project_invariants(spark, emb_np):
    emb = load_table(spark, SF, "embeddings")
    model = pca_fit(emb, k=8)
    out = pca_project(emb, model, out_col="pca")
    rows = out.select("vec_id", "pca").collect()
    rows.sort(key=lambda r: r["vec_id"])
    y = np.asarray([r["pca"] for r in rows])
    assert y.shape == (len(emb_np), 8)
    # parity with the numpy projection
    want = (emb_np - model["mean"]) @ model["components"].T
    assert np.allclose(y, want, atol=1e-8)
    # projected coords are centered and their variance equals the eigenvalue
    assert np.allclose(y.mean(axis=0), 0, atol=1e-7)
    assert np.allclose(y.var(axis=0), model["explained_variance"], rtol=1e-6)
    # mean squared reconstruction error == sum of the discarded spectrum
    recon = y @ model["components"] + model["mean"]
    resid = ((emb_np - recon) ** 2).sum(axis=1).mean()
    tail = pca_fit(emb, k=64)["explained_variance"][8:].sum()
    assert np.isclose(resid, tail, rtol=1e-6)


def test_empty_input_raises(spark):
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="empty"):
        pca_fit(emb, k=2)


def test_pca_fit_rejects_out_of_range_k(spark):
    """Review r10: k > d used to silently return d components (argsort
    slice), breaking caller shapes far from the cause; k <= 0 returned
    an empty model.  Both now raise a named error."""
    import pytest

    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0]) for i in range(10)],
        "id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match=r"k=4 must be in \[1, d=3\]"):
        pca_fit(emb, k=4)
    with pytest.raises(ValueError, match="must be in"):
        pca_fit(emb, k=0)
    assert pca_fit(emb, k=3)["components"].shape == (3, 3)


def test_project_refuses_existing_output_column(spark):
    """Review r12: a duplicate out_col built a two-field schema that
    errored in the Arrow serializer far from the cause; refuse at entry."""
    import pytest

    from starryskyqueryengine_spark.functions.pca import pca_fit, pca_project

    df = spark.createDataFrame(
        [(i, [float(i), float(i % 3)]) for i in range(12)],
        "id long, embedding array<double>",
    )
    model = pca_fit(df, "embedding", k=1)
    out = pca_project(df, model, "embedding", out_col="pca")
    assert out.columns == ["id", "embedding", "pca"]
    with pytest.raises(ValueError, match="already exists"):
        pca_project(out, model, "embedding", out_col="pca")
