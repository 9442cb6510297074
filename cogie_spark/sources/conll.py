"""CoNLL-2003 scan as a declarative pipeline.

The reference parses CoNLL with a stateful line loop — blank-line-
delimited sentences, col0=token, last col=tag
(/root/reference/cogie/io/loader/ner/conll2003.py:16-38). The Spark
restatement (SURVEY.md §2.1 S3): wholetext read → posexplode lines
(order-preserving within a file) → blank-line running-sum sessionization
→ groupBy sentence → collect ordered token/tag arrays. No Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """-> (doc_id: file path, sent_id, tokens array<string>, tags array<string>)."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("doc_id"), F.col("value")
    )
    lines = raw.select(
        "doc_id", F.posexplode(F.split(F.col("value"), "\n")).alias("line_no", "line")
    )
    w = Window.partitionBy("doc_id").orderBy("line_no")
    sent = lines.withColumn(
        "_blank", (F.trim("line") == "").cast("int")
    ).withColumn("sent_id", F.sum("_blank").over(w))
    toks = (
        sent.filter((F.col("_blank") == 0) & ~F.col("line").startswith("-DOCSTART-"))
        .withColumn("_cols", F.split(F.trim("line"), r"\s+"))
        .withColumn("token", F.col("_cols").getItem(0))
        .withColumn("tag", F.element_at("_cols", -1))
    )
    return (
        toks.groupBy("doc_id", "sent_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("line_no", "token", "tag"))).alias("_rows")
        )
        .select(
            "doc_id",
            "sent_id",
            F.transform("_rows", lambda r: r["token"]).alias("tokens"),
            F.transform("_rows", lambda r: r["tag"]).alias("tags"),
        )
    )
