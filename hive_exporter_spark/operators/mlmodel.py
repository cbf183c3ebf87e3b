"""Distributed model training for corpus curation: a fastText-style
linear quality classifier trained with spark.ml.

Real pipelines (CCNet, RefinedWeb, FineWeb) gate documents with a
cheap linear classifier over hashed bag-of-words features — trained on
"known good" vs "known bad" seed sets, then applied to the full crawl.
The heuristic `llm.quality_score` is the cold-start gate; this module
is the learned upgrade, and the whole thing — featurization, IDF fit,
logistic regression — runs distributed (spark.ml is Catalyst
DataFrames + JVM tree aggregation; no data ever sits on the driver).

Scale shape: HashingTF is a stateless map (no vocabulary shuffle —
the hashing trick is what makes it 100 TB-safe), IDF is one
aggregate, LogisticRegression is L-BFGS over treeAggregate gradient
passes. Scoring a new corpus is a pure map of broadcast coefficients.

Relationship to `pipeline.quality_classifier_*` (r7): this module is
the spark.ml-Pipeline variant — TF-IDF-weighted murmur3 features,
model-OBJECT scoring via transform(), labels distilled from the
heuristic gate; inherently rows-only (engine-internal hashing and
interpolation). The pipeline module is the PORTABLE lifecycle of the
same idea: raw-count md5 features, weights-as-DataFrame broadcast
scoring whose dataflow is hash-checked against DuckDB, an acceptance
report under the driver gate, and the `quality` CLI verb. Use this
one when you want IDF weighting and are happy with an opaque model;
use the pipeline one when scoring must be auditable/replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_exporter_spark.operators.llm import tokens_col

HASH_FEATURES = 1 << 12
QUALITY_LABEL_THRESHOLD = 0.5


def _featurizer(num_features: int):
    from pyspark.ml.feature import IDF, HashingTF

    return [
        HashingTF(inputCol="tokens", outputCol="tf",
                  numFeatures=num_features),
        IDF(inputCol="tf", outputCol="features"),
    ]


def train_quality_classifier(
    documents: DataFrame,
    labels: DataFrame | None = None,
    num_features: int = HASH_FEATURES,
    max_iter: int = 30,
    reg_param: float = 0.01,
):
    """Fit the classifier; returns (PipelineModel, training DataFrame).

    `labels` is an optional (doc_id, label double) seed set. Without
    one, labels bootstrap from the heuristic `quality_score >= 0.5` —
    the standard trick of distilling a cheap rule into a model that
    generalizes past it.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    if labels is None:
        from hive_exporter_spark.operators.llm import quality_score

        labels = quality_score(documents).select(
            "doc_id",
            (F.col("quality_score") >= QUALITY_LABEL_THRESHOLD)
            .cast("double").alias("label"),
        )
    train = (
        documents.withColumn("tokens", tokens_col())
        .join(labels, "doc_id")
        .select("doc_id", "tokens", "label")
    )
    lr = LogisticRegression(maxIter=max_iter, regParam=reg_param,
                            featuresCol="features", labelCol="label")
    model = Pipeline(stages=[*_featurizer(num_features), lr]).fit(train)
    return model, train


def score_documents(model, documents: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """Apply a trained classifier: (id, p_good, predicted_label).
    Pure map stage — coefficients ride along as a broadcast."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(documents.withColumn("tokens", tokens_col()))
    p_good = F.element_at(vector_to_array("probability"), 2)
    return scored.select(
        F.col(id_col),
        F.round(p_good, 6).alias("p_good"),
        F.col("prediction").cast("int").alias("predicted_label"),
    )
