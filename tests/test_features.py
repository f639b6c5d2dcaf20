"""MLlib feature pipelines: shape/determinism/persistence contracts."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_text_features_shape_and_determinism(spark, sf_dir):
    from de4ml_spark.features import fit_text_features
    from de4ml_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    model = fit_text_features(docs, num_features=1 << 10)
    out = model.transform(docs).select("doc_id", "tfidf")
    rows = {r["doc_id"]: r["tfidf"] for r in out.collect()}
    assert len(rows) == docs.count()
    v = next(iter(rows.values()))
    assert v.size == 1 << 10
    assert all(x >= 0 for x in v.values)  # tf-idf is nonnegative
    # refit + retransform on a repartitioned input -> identical vectors
    model2 = fit_text_features(docs.repartition(7), num_features=1 << 10)
    rows2 = {
        r["doc_id"]: r["tfidf"]
        for r in model2.transform(docs).select("doc_id", "tfidf").collect()
    }
    for k in rows:
        a, b = rows[k], rows2[k]
        assert list(a.indices) == list(b.indices)
        assert all(
            math.isclose(x, y, rel_tol=1e-9)
            for x, y in zip(a.values, b.values)
        )


def test_numeric_features_standardized(spark, sf_dir):
    from de4ml_spark.features import fit_numeric_features
    from de4ml_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice", "l_discount"
    )
    model = fit_numeric_features(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    )
    out = model.transform(li).select("features")
    import numpy as np

    m = np.array([r["features"].toArray() for r in out.collect()])
    # standardized: per-dim mean ~0, std ~1
    assert np.abs(m.mean(axis=0)).max() < 1e-9
    assert np.abs(m.std(axis=0, ddof=1) - 1.0).max() < 1e-6


def test_pipeline_persistence_roundtrip(spark, sf_dir, tmp_path):
    """Fitted pipelines must persist and reload as identical transformers
    (the deployment contract: fit once, ship the model)."""
    from pyspark.ml import PipelineModel

    from de4ml_spark.features import fit_text_features
    from de4ml_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    model = fit_text_features(docs, num_features=1 << 8)
    path = str(tmp_path / "tfidf_model")
    model.write().overwrite().save(path)
    back = PipelineModel.load(path)
    a = model.transform(docs).select("doc_id", "tfidf").collect()
    b = back.transform(docs).select("doc_id", "tfidf").collect()
    av = {r["doc_id"]: r["tfidf"] for r in a}
    bv = {r["doc_id"]: r["tfidf"] for r in b}
    for k in av:
        assert list(av[k].indices) == list(bv[k].indices)
        assert list(av[k].values) == list(bv[k].values)
