"""Evaluation metrics as grouped aggregations (SURVEY.md §2.4).

Restates the reference's metric accumulators
(/root/reference/cogie/core/metrics.py — SpanFPreRecMetric 560-698,
AccuracyMetric 231-292, ConfusionMatrixMetric 162-229) as joins +
groupBy aggregations: the defaultdict counters become full-outer joins
with summed TP/FP/FN; micro vs macro become two grouping levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_prf(predicted: DataFrame, labeled: DataFrame) -> dict[str, float]:
    """Pairwise precision/recall/F1 of predicted match pairs against the
    labeled ground truth, evaluated over the labeled (co-blocked) pairs —
    BASELINE.json: 'pairwise F1 ... at the same blocking key'.

    predicted: (left_id, right_id) — the engine's matched pairs.
    labeled:   (left_id, right_id, is_match) — fixture ground truth.

    One full-outer join + one aggregation; the reference's analogue is
    the span-F1 TP/FP/FN counting (metrics.py:599-649).
    """
    pred = predicted.select("left_id", "right_id").withColumn("pred", F.lit(True))
    lab = labeled.select("left_id", "right_id", "is_match")
    joined = lab.join(pred, ["left_id", "right_id"], "left").select(
        "is_match", F.coalesce("pred", F.lit(False)).alias("pred")
    )
    row = joined.agg(
        F.sum(F.when(F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_match") & ~F.col("pred"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = int(row["tp"]), int(row["fp"]), int(row["fn"])
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": p, "recall": r, "f1": f1}


def confusion_matrix(df: DataFrame, target: str, pred: str) -> DataFrame:
    """groupBy(target, pred).count — reference ConfusionMatrixMetric
    (/root/reference/cogie/core/metrics.py:162-229)."""
    return df.groupBy(
        F.col(target).alias("target"), F.col(pred).alias("pred")
    ).agg(F.count("*").alias("n"))


def accuracy(df: DataFrame, target: str, pred: str) -> DataFrame:
    """Masked accuracy as avg(indicator) — reference AccuracyMetric
    (/root/reference/cogie/core/metrics.py:231-292)."""
    return df.agg(
        F.avg(F.when(F.col(target) == F.col(pred), 1.0).otherwise(0.0)).alias("accuracy")
    )


def grouped_accuracy_macro(df: DataFrame, group: str, target: str, pred: str) -> DataFrame:
    """Per-group accuracy then unweighted macro mean — reference
    per-world accuracy (/root/reference/cogie/toolkit/el/el_toolkit.py:574-621)."""
    per = df.groupBy(group).agg(
        F.avg(F.when(F.col(target) == F.col(pred), 1.0).otherwise(0.0)).alias("acc")
    )
    return per.agg(F.avg("acc").alias("macro_acc"))
