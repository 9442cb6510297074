"""T-REx corpus loader (S2): char-boundary JSON -> per-sentence tokens +
entity word-index sets, all native DataFrame ops.

Restates /root/reference/cogie/io/loader/ner/trex_ner.py:22-64: the
reference walks sentences_boundaries / words_boundaries building a
charid2wordid dict per sentence, then maps each entity's char range to
distinct word indices. Here the dict becomes a range-containment join
(SURVEY.md §2.3 J8) and the per-sentence word index a row_number.

Word/sentence containment semantics match the reference exactly:
- a word belongs to a sentence iff word.start >= sent.start and
  word.end <= sent.end (trex_ner.py:41);
- an entity belongs to a sentence iff its boundaries are contained the
  same way (trex_ner.py:53);
- an entity covers word w iff any char in [e.start, e.end) falls in
  [w.start, w.end] — the reference's charid2wordid covers the word's
  INCLUSIVE end char (``range(start, end + 1)``, trex_ner.py:44), so
  overlap is w.start <= e.end - 1 and w.end >= e.start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TREX_SCHEMA = (
    "text string, "
    "entities array<struct<boundaries:array<bigint>, uri:string>>, "
    "sentences_boundaries array<array<bigint>>, "
    "words_boundaries array<array<bigint>>"
)


def read_trex_json(spark: SparkSession, path: str) -> DataFrame:
    """Read T-REx-shaped JSON (one doc per line or a JSON array) with a
    deterministic doc_id derived from the document text hash."""
    raw = spark.read.schema(TREX_SCHEMA).option("multiLine", "false").json(path)
    return raw.withColumn("doc_id", F.xxhash64("text"))


def trex_tokens(docs: DataFrame) -> DataFrame:
    """docs -> (doc_id, sent_id, pos, token, char_start, char_end).

    pos is the per-sentence word index (the reference's j - prev_length,
    trex_ner.py:42-44) — a row_number over word start within sentence.
    """
    sents = docs.select(
        "doc_id", "text", F.posexplode("sentences_boundaries").alias("sent_id", "sb")
    )
    words = docs.select(
        "doc_id", F.explode("words_boundaries").alias("wb")
    ).select("doc_id", F.col("wb")[0].alias("w_start"), F.col("wb")[1].alias("w_end"))
    j = sents.join(words, "doc_id").filter(
        (F.col("w_start") >= F.col("sb")[0]) & (F.col("w_end") <= F.col("sb")[1])
    )
    w = Window.partitionBy("doc_id", "sent_id").orderBy("w_start")
    return j.select(
        "doc_id",
        "sent_id",
        (F.row_number().over(w) - 1).alias("pos"),
        F.expr("substring(text, w_start + 1, w_end - w_start)").alias("token"),
        F.col("w_start").alias("char_start"),
        F.col("w_end").alias("char_end"),
    )


def trex_entity_indices(docs: DataFrame) -> DataFrame:
    """docs -> (doc_id, sent_id, entity_id, uri, pos): one row per
    (entity, covered word) — the exploded form of the reference's
    ``index`` list (trex_ner.py:55-59). Aggregate with collect_set for
    the array form; the exploded form is the join-friendly one.
    """
    toks = trex_tokens(docs)
    ents = docs.select(
        "doc_id", F.posexplode("entities").alias("entity_id", "e")
    ).select(
        "doc_id",
        "entity_id",
        F.col("e.uri").alias("uri"),
        F.col("e.boundaries")[0].alias("e_start"),
        F.col("e.boundaries")[1].alias("e_end"),
    )
    # entity must be contained in the token's sentence; word overlap per
    # the inclusive-end charid map (see module docstring)
    return (
        ents.join(toks, "doc_id")
        .filter(
            (F.col("char_start") <= F.col("e_end") - 1)
            & (F.col("char_end") >= F.col("e_start"))
        )
        .join(
            # sentence containment (trex_ner.py:53): the entity range
            # must fall inside the sentence that owns these tokens
            docs.select("doc_id", F.posexplode("sentences_boundaries").alias("sent_id", "sb")),
            ["doc_id", "sent_id"],
        )
        .filter((F.col("e_start") >= F.col("sb")[0]) & (F.col("e_end") <= F.col("sb")[1]))
        .select("doc_id", "sent_id", "entity_id", "uri", "pos")
        .distinct()
    )
