"""Entity linking: mentions -> canonical entities.

The reusable restatement of the reference's ElToolkit.run
(/root/reference/cogie/toolkit/el/el_toolkit.py:84-152):

  normalize (el_toolkit.py:87-96)
  -> candidate generation via blocking join       [run_biencoder+FAISS,
     el_toolkit.py:511-535 — here a prefix/LSH equi-join]
  -> pairwise re-scoring                          [run_crossencoder,
     el_toolkit.py:631-645 — here Arrow-batched Jaro-Winkler]
  -> argmax winner                                [el_toolkit.py:131-133]
  -> entity enrichment joins                      [id2title/id2url,
     el_toolkit.py:133-135]
  -> owl:sameAs left join, miss -> 'unk'          [el_toolkit.py:136-142,
     cogie/utils/cognet.py:47-58]

Entities/sameas are dimension tables (broadcast when they fit); the
mention side streams. At catalogue scale (5.9M entities in the
reference), the prefix-block join bounds candidates per mention the
way FAISS top-k=10 does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cogie_spark.functions.similarity import jaro_winkler
from cogie_spark.functions.text import normalize_text


def link_mentions(
    mentions: DataFrame,
    entities: DataFrame,
    sameas: DataFrame | None = None,
    mention_col: str = "mention",
    block_prefix: int = 6,
    top_k: int = 1,
    score_round: int = 4,
) -> DataFrame:
    """(mention_id, mention) x (local_id, title, wikipedia_id, url)
    -> winners with enrichment and cognet_link.

    top_k > 1 returns the ranked candidate list per mention (the
    reference's top_k=10 retrieve stage); top_k = 1 is the winner-only
    output of the full /linking chain.
    """
    m = mentions.withColumn("_m", normalize_text(mention_col))
    cands = m.join(
        F.broadcast(entities),
        F.substring("_m", 1, block_prefix) == F.substring("title", 1, block_prefix),
    ).withColumn("score", F.round(jaro_winkler(F.col("_m"), F.col("title")), score_round))
    w = Window.partitionBy("mention_id").orderBy(
        F.desc("score"), F.asc("title"), F.asc("local_id")
    )
    ranked = cands.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= top_k)
    out = ranked.drop("_m")
    if sameas is not None:
        out = out.join(F.broadcast(sameas), "wikipedia_id", "left").withColumn(
            "cognet_link", F.coalesce("cognet_id", F.lit("unk"))
        ).drop("cognet_id")
    return out
