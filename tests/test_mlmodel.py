"""spark.ml quality-classifier pipeline: the distilled model must
recover the heuristic labels it was trained on (they are a function of
the text, so a linear model over hashed BoW should separate them) and
scoring must be deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_exporter_spark.operators import mlmodel
from hive_exporter_spark.operators.llm import quality_score
from hive_exporter_spark.sources.files import read_table


def test_classifier_learns_heuristic_labels(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").cache()
    model, train = mlmodel.train_quality_classifier(docs)
    scored = mlmodel.score_documents(model, docs)

    truth = quality_score(docs).select(
        "doc_id", (F.col("quality_score") >= 0.5).cast("int").alias("y"))
    joined = scored.join(truth, "doc_id")
    acc = joined.where(F.col("predicted_label") == F.col("y")).count() / docs.count()
    assert acc >= 0.85, f"train accuracy {acc:.2f} too low to be a usable gate"
    # Both classes must actually occur (guard against a degenerate
    # always-one model scoring well on an imbalanced fixture).
    assert truth.select("y").distinct().count() == 2


def test_scoring_is_deterministic_and_bounded(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    model, _ = mlmodel.train_quality_classifier(docs)
    a = {r["doc_id"]: r["p_good"] for r in
         mlmodel.score_documents(model, docs).collect()}
    b = {r["doc_id"]: r["p_good"] for r in
         mlmodel.score_documents(model, docs).collect()}
    assert a == b
    assert all(0.0 <= p <= 1.0 for p in a.values())
