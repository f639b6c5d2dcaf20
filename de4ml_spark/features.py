"""MLlib feature pipelines over the warehouse tables — the
feature-engineering tier the north star calls out ("DataFrame ops +
feature engineering"), built on ``pyspark.ml`` so fitted pipelines are
reusable, persistable Transformers.

Two standard pipelines:

- ``text_features``: Tokenizer -> HashingTF -> IDF over ``documents.text``
  — the classic sparse lexical featurization (hashing trick keeps the
  vocabulary unbounded-safe at 100 TB; IDF is a fitted, broadcastable
  1-row model).
- ``numeric_features``: VectorAssembler -> StandardScaler over numeric
  event/lineitem measures — the dense-feature normalization step ahead of
  any MLlib estimator.

Scale notes: every stage is a narrow map transform once fitted (HashingTF
is stateless; IDF/Scaler models are small broadcast vectors); fitting
costs one aggregation pass each. Feature vectors stay in MLlib's
VectorUDT, which parquet round-trips, so featurized tables persist like
any other warehouse table. These are deliberately tests-gated (no DuckDB
oracle: VectorUDT and MLlib's hashing are engine-specific), exercised in
tests/test_features.py including fit/transform determinism and pipeline
persistence.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import (
    IDF,
    HashingTF,
    StandardScaler,
    Tokenizer,
    VectorAssembler,
)
from pyspark.sql import DataFrame


def text_feature_pipeline(
    num_features: int = 1 << 12,
    text_col: str = "text",
    out_col: str = "tfidf",
) -> Pipeline:
    """Tokenizer -> HashingTF -> IDF (unfitted)."""
    tok = Tokenizer(inputCol=text_col, outputCol="__tokens")
    tf = HashingTF(
        inputCol="__tokens", outputCol="__tf", numFeatures=num_features
    )
    idf = IDF(inputCol="__tf", outputCol=out_col)
    return Pipeline(stages=[tok, tf, idf])


def fit_text_features(
    docs: DataFrame,
    num_features: int = 1 << 12,
    text_col: str = "text",
    out_col: str = "tfidf",
) -> PipelineModel:
    return text_feature_pipeline(num_features, text_col, out_col).fit(docs)


def numeric_feature_pipeline(
    cols: list[str], out_col: str = "features"
) -> Pipeline:
    """VectorAssembler -> StandardScaler (with mean centering) (unfitted)."""
    asm = VectorAssembler(inputCols=cols, outputCol="__raw")
    scaler = StandardScaler(
        inputCol="__raw", outputCol=out_col, withMean=True, withStd=True
    )
    return Pipeline(stages=[asm, scaler])


def fit_numeric_features(
    df: DataFrame, cols: list[str], out_col: str = "features"
) -> PipelineModel:
    return numeric_feature_pipeline(cols, out_col).fit(df)
