"""Sequence-labeling span operators: BIO decode via sessionization.

Distributed restatement of the reference's stateful BIO tag scan
(_bio_tag_to_spans, /root/reference/cogie/toolkit/ner/ner_toolkit.py:212-229;
BMES/BIOES variants /root/reference/cogie/core/metrics.py:419-505): the
prev-tag state machine becomes lag() over a position window, new-span
flags become a running sum() segment id, and spans fall out of a
groupBy — classic sessionization (SURVEY.md §2.5 W5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bio_decode(tokens_df: DataFrame) -> DataFrame:
    """(doc_id, sent_id, pos, token, tag[BIO]) -> spans
    (doc_id, sent_id, label, start, end, text).

    end is exclusive. Tags: 'B-X', 'I-X', 'O'. An 'I-X' that follows
    'O' or a different label starts a new span (the reference treats
    it as B — ner_toolkit.py:222-227).
    """
    w = Window.partitionBy("doc_id", "sent_id").orderBy("pos")
    prefix = F.substring("tag", 1, 1)
    label = F.substring("tag", 3, 1000)
    prev_tag = F.lag("tag").over(w)
    prev_label = F.substring(prev_tag, 3, 1000)
    new_span = (
        (prefix == "B")
        | ((prefix == "I") & (prev_tag.isNull() | (F.substring(prev_tag, 1, 1) == "O") | (prev_label != label)))
    ).cast("int")
    tagged = (
        tokens_df.withColumn("_label", label)
        .withColumn("_is_o", (prefix == "O").cast("int"))
        .withColumn("_new", new_span)
        .withColumn("_seg", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        tagged.filter(F.col("_is_o") == 0)
        .groupBy("doc_id", "sent_id", "_seg", "_label")
        .agg(
            F.min("pos").alias("start"),
            (F.max("pos") + 1).alias("end"),
            F.concat_ws(" ", F.collect_list("token")).alias("text"),
        )
        .select(
            "doc_id", "sent_id", F.col("_label").alias("label"), "start", "end", "text"
        )
    )


def span_f1(pred: DataFrame, gold: DataFrame, keys=("doc_id", "sent_id", "label", "start", "end")) -> DataFrame:
    """Span micro-F1 via full-outer join — reference SpanFPreRecMetric
    (/root/reference/cogie/core/metrics.py:599-698) restated as one join
    + one aggregation."""
    p = pred.select(*keys).withColumn("_p", F.lit(1))
    g = gold.select(*keys).withColumn("_g", F.lit(1))
    j = p.join(g, list(keys), "full_outer")
    return j.agg(
        F.sum(F.when(F.col("_p").isNotNull() & F.col("_g").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("_p").isNotNull() & F.col("_g").isNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("_p").isNull() & F.col("_g").isNotNull(), 1).otherwise(0)).alias("fn"),
    )
