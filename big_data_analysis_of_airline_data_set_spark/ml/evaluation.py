"""Six-metric evaluation (M22/M23) with cached predictions.

Reference: 6 evaluator.evaluate calls over the SAME predictions
DataFrame without caching (Scripts/3_...py:106-111) — the full
test-set prediction plan recomputes 6×. Fixed here: persist the
predictions projection once, release after (SURVEY.md §7.2.6).
"""

from __future__ import annotations

from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

METRIC_NAMES = ("area_ROC", "accuracy", "tpr", "fpr", "precision", "f1_score")


def evaluate_predictions(predictions: DataFrame) -> dict[str, float]:
    """All six reference metrics off one cached projection."""
    needed = predictions.select("label", "prediction", "rawPrediction")
    needed.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        bc = BinaryClassificationEvaluator(metricName="areaUnderROC")

        def mc(name: str) -> float:
            return MulticlassClassificationEvaluator(metricName=name).evaluate(needed)

        return {
            "area_ROC": bc.evaluate(needed),
            "accuracy": mc("accuracy"),
            "tpr": mc("truePositiveRateByLabel"),
            "fpr": mc("falsePositiveRateByLabel"),
            "precision": mc("precisionByLabel"),
            "f1_score": mc("f1"),
        }
    finally:
        needed.unpersist()
