"""Plan-quality gates: the physical plans must show predicate pushdown,
column pruning, broadcast joins, and zero row-wise Python UDFs — the
properties that decide 100 TB behavior (north rule: 'no per-row
Python'; SURVEY.md §7.3)."""

from __future__ import annotations

import re

from cogie_spark.queries import QUERIES


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_pushdown_and_pruning(spark):
    df = QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200], plan[:2000]
    # column pruning: the scan must not read columns the query never uses
    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert read_schema and "l_shipdate" not in read_schema.group(1)


def test_q04_broadcast_joins(spark):
    df = QUERIES["q04_enrich_join"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]


def test_no_rowwise_python_udfs_in_source():
    """The engine must never register a row-at-a-time Python UDF
    (BASELINE.json: vectorized pandas/Arrow UDFs only). ``F.udf(`` /
    ``@udf`` are banned in the package source."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "cogie_spark"
    offenders = []
    for py in root.rglob("*.py"):
        src = py.read_text()
        if re.search(r"(?<!pandas_)\budf\(", src.replace("pandas_udf(", "")):
            # allow pandas_udf, catch bare udf(
            for m in re.finditer(r"\b(F\.)?udf\(", src):
                offenders.append(f"{py.name}:{src[:m.start()].count(chr(10)) + 1}")
    assert not offenders, offenders


def test_whole_stage_codegen_covers_blocking(spark):
    """The signature/banding path must be JVM-side (WholeStageCodegen
    present, no Python eval nodes)."""
    from cogie_spark.fixtures.codefiles import code_files
    from cogie_spark.operators.blocking import signature_table

    files = code_files(spark, n_groups=5, seed=42)
    sigs = signature_table(files, num_perm=8, mode="fast")
    plan = _plan(sigs)
    # map-side combine of the per-permutation minima before the shuffle
    assert "partial_min" in plan
    # one shuffle for the signature aggregation — formatted output names
    # each node twice (tree header + detail section)
    assert plan.count("Exchange") <= 2, plan
    # the only Python in the whole lineage is the fixture generator
    assert plan.count("ArrowEvalPython") == 0
    assert plan.count("BatchEvalPython") == 0
