"""W2NER grid decode: per-sentence word-pair grid -> entity index lists.

Restates /root/reference/cogie/toolkit/ner/ner_toolkit.py:242-285
(w2ner_decode): the model emits, per sentence, a word-pair grid where
the upper triangle holds NNW (next-neighboring-word) links
(``instance[i, j] == 1`` for i < j) and the lower triangle holds THW
(tail-head-word) entries carrying the entity type
(``instance[j, i] > 1`` for j >= i, head = i, tail = j). Decoding walks
NNW chains from each head and emits every path that ends on a matching
tail — inherently an imperative per-sentence DFS, so this is the
SURVEY.md §2.10 mapInPandas/applyInPandas case (UDTF shape: one
sentence in, N entity rows out), not a join restatement.

Scale shape: the grid is passed SPARSE as (doc_id, sent_id, row, col,
val) cells — sentences are bounded (~10² words), so each group is tiny;
millions of sentences decode in parallel, one group per sentence, and
nothing ever materializes a dense seq_len² matrix on the driver.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame

CELL_SCHEMA = "doc_id long, sent_id long, row int, col int, val int"
ENTITY_SCHEMA = "doc_id long, sent_id long, indices string, entity_type int"


def w2ner_decode_py(cells: Iterable[tuple[int, int, int]]) -> list[tuple[str, int]]:
    """Reference-faithful single-sentence decode over sparse cells
    (row, col, val). Returns sorted ('-'-joined index list, type) pairs
    — the reference's convert_index_to_text keys (ner_toolkit.py:230-239)
    split back apart.
    """
    forward: dict[int, list[int]] = {}
    heads: dict[int, set[int]] = {}
    ht_type: dict[tuple[int, int], int] = {}
    for row, col, val in sorted(cells):
        if val == 1 and row < col:
            forward.setdefault(row, []).append(col)  # NNW: row -> col
        elif val > 1 and col <= row:
            # THW stored transposed: instance[j, i] (j = tail, i = head)
            ht_type[(col, row)] = val
            heads.setdefault(col, set()).add(row)

    predicts: list[list[int]] = []

    def find_entity(key: int, entity: list[int], tails: set[int]) -> None:
        entity.append(key)
        if key not in forward:
            if key in tails:
                predicts.append(entity.copy())
            entity.pop()
            return
        if key in tails:
            predicts.append(entity.copy())
        for k in forward[key]:
            find_entity(k, entity, tails)
        entity.pop()

    for head in heads:
        find_entity(head, [], heads[head])

    uniq = {
        ("-".join(str(i) for i in path), ht_type[(path[0], path[-1])])
        for path in predicts
    }
    return sorted(uniq)


def w2ner_decode(cells: DataFrame) -> DataFrame:
    """(doc_id, sent_id, row, col, val) sparse grid cells -> entities
    (doc_id, sent_id, indices: '-'-joined word ids, entity_type).

    One applyInPandas group per sentence; the DFS never leaves the
    executor and the shuffle key is (doc_id, sent_id).
    """

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = int(pdf["doc_id"].iloc[0])
        sent_id = int(pdf["sent_id"].iloc[0])
        ents = w2ner_decode_py(
            zip(pdf["row"].tolist(), pdf["col"].tolist(), pdf["val"].tolist())
        )
        return pd.DataFrame(
            {
                "doc_id": [doc_id] * len(ents),
                "sent_id": [sent_id] * len(ents),
                "indices": [e[0] for e in ents],
                "entity_type": [e[1] for e in ents],
            }
        )

    return cells.groupBy("doc_id", "sent_id").applyInPandas(decode, schema=ENTITY_SCHEMA)
