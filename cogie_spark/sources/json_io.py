"""JSON corpus scan/sink (SURVEY.md §2.1 S1/S5/S8).

The reference loads whole JSON arrays into RAM (load_json,
/root/reference/cogie/utils/util.py:186-191) and writes JSONL one line
per record (json_to_text, util.py:202-208); directory unions are Python
loops (preprocess_trex.py:19-42). Spark: schema-on-read multi-file
scans and distributed JSONL sinks — the union across files is the
reader's own multi-path support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_json_corpus(
    spark: SparkSession, path: str | list[str], schema: StructType | str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """Read one file, a glob, or a directory of JSON/JSONL files.

    Always pass a schema in production — schema inference is a full
    extra pass over 100 TB.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if multiline:
        reader = reader.option("multiLine", True)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line, one file per partition."""
    df.write.mode(mode).json(path)
