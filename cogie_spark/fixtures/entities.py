"""Deterministic EL fixture: entities catalogue, mention records, sameAs
dim (FIXTURES.md §2/§3) — the data contracts of the reference's linking
stage (mention records /root/reference/cogie/toolkit/el/el_toolkit.py:
88-96; catalogue cogie/utils/util.py:419-450; sameAs
cogie/utils/cognet.py:47-58), synthesized at small scale with seed=42.

Mentions reference a gold entity; surface forms are light corruptions
(case changes, dropped word, transposition) of the gold title so the
deterministic scorers rank gold first — mirroring the wide-margin
design of the code_files fixture.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession

from cogie_spark.fixtures.codefiles import _IDENT_STEMS, _rng


def _title(rng: random.Random) -> str:
    n = rng.randint(2, 4)
    return " ".join(rng.choice(_IDENT_STEMS) + str(rng.randint(0, 99)) for _ in range(n))


def entity_catalogue(spark: SparkSession, n: int = 500, seed: int = 42) -> DataFrame:
    rows = []
    for i in range(n):
        rng = _rng(seed, "entity", i)
        title = _title(rng)
        wikipedia_id = 1000 + i * 7
        rows.append(
            (
                i,
                title,
                f"description of {title} ({rng.choice(_IDENT_STEMS)})",
                wikipedia_id,
                f"https://en.wikipedia.org/wiki?curid={wikipedia_id}",
            )
        )
    return spark.createDataFrame(
        rows, "local_id long, title string, text string, wikipedia_id long, url string"
    )


def mentions(spark: SparkSession, entities_n: int = 500, n: int = 300, seed: int = 42) -> DataFrame:
    """Mention records with gold label_id; ~10% unknowns (label_id = -1,
    label 'unkonwn' — the reference's own spelling, el_toolkit.py:95)."""
    rows = []
    for i in range(n):
        rng = _rng(seed, "mention", i)
        if rng.random() < 0.1:
            surface = _title(rng)
            gold_id, gold_title = -1, "unkonwn"
        else:
            gold_id = rng.randrange(entities_n)
            erng = _rng(seed, "entity", gold_id)
            gold_title = _title(erng)
            words = gold_title.split()
            kind = rng.choice(["case", "same", "swap"])
            if kind == "case":
                surface = gold_title.upper() if rng.random() < 0.5 else gold_title.title()
            elif kind == "swap" and len(words) > 2:
                j = rng.randrange(len(words) - 2) + 1
                words[j], words[j + 1] = words[j + 1], words[j]
                surface = " ".join(words)
            else:
                surface = gold_title
        left = [rng.choice(_IDENT_STEMS) for _ in range(rng.randint(0, 5))]
        right = [rng.choice(_IDENT_STEMS) for _ in range(rng.randint(0, 5))]
        rows.append((i, surface, left, right, gold_title, gold_id))
    return spark.createDataFrame(
        rows,
        "mention_id long, mention string, context_left array<string>, "
        "context_right array<string>, label string, label_id long",
    )


def sameas(spark: SparkSession, entities_n: int = 500, seed: int = 42) -> DataFrame:
    """owl:sameAs dim — only ~60% of entities have a CogNet link (misses
    must yield 'unk', FIXTURES.md §3)."""
    rows = []
    for i in range(entities_n):
        if _rng(seed, "sameas", i).random() < 0.6:
            rows.append((1000 + i * 7, f"cognet:{hashlib.sha1(str(i).encode()).hexdigest()[:8]}"))
    return spark.createDataFrame(rows, "wikipedia_id long, cognet_id string")
