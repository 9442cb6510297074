"""Entity-typing post-processing: multi-label sigmoid thresholding.

Restates the reference ET toolkit's logit thresholding
(/root/reference/cogie/toolkit/et/et_toolkit.py:120-126:
``torch.where(output_logits >= 0.5, 1, 0)`` then nonzero -> type
strings, empty list if nothing clears the bar) over a long-format
(mention, label, prob) table: a filter + groupBy collect, with a left
join preserving no-type mentions as empty arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def threshold_labels(
    df: DataFrame,
    id_cols: list[str] | tuple[str, ...],
    label_col: str = "type_label",
    prob_col: str = "prob",
    threshold: float = 0.5,
) -> DataFrame:
    """(ids..., label, prob) -> (ids..., types: array<string>, n_types).

    Labels with prob >= threshold are kept, sorted for determinism;
    mentions where nothing clears the threshold get an empty array
    (the reference's ``types = []`` branch, et_toolkit.py:124-126).
    """
    ids = df.select(*id_cols).distinct()
    kept = (
        df.filter(F.col(prob_col) >= threshold)
        .groupBy(*id_cols)
        .agg(F.array_sort(F.collect_list(label_col)).alias("types"))
    )
    return (
        ids.join(kept, list(id_cols), "left")
        .withColumn("types", F.coalesce("types", F.expr("cast(array() as array<string>)")))
        .withColumn("n_types", F.size("types").cast("long"))
    )
