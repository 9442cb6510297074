"""Deterministic synthetic ``code_files`` table + labeled ground truth.

BASELINE.json input_hint mandates the input shape:
(repo:string, path:string, commit:string, lang:string, content:string).
We add ``sha256`` (per-row invariant; checked in pytest) and ``file_id``
(stable CC node id, FIXTURES.md §1).

Generation is fully distributed and order-free: a Spark ``range`` of
duplicate-group ids is expanded to member rows inside ``mapInPandas``;
every value is a pure function of (seed, group_id, member_idx), so any
partitioning / re-run yields byte-identical rows. This is how the fixture
scales from 2k rows (unit tests) to 200k+ (bench) without a driver loop.

Duplicate groups model the reference's gold entity clusters
(/root/reference/cogie/toolkit/el/el_toolkit.py:408-448 gold-in-candidates
design): members of a group are light mutations (comment edit, identifier
rename, whitespace) of a base file, keeping intra-group shingle similarity
high and cross-group similarity near zero — wide margins so deterministic
scorers reach pairwise F1 >= 0.99 (SURVEY.md §7.3).
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "java", "c", "go", "js"]

_KEYWORDS = {
    "python": ["def", "return", "class", "import", "for", "in", "if", "else", "None", "self"],
    "java": ["public", "static", "void", "class", "return", "new", "int", "final", "private", "this"],
    "c": ["int", "char", "void", "return", "struct", "static", "const", "sizeof", "while", "for"],
    "go": ["func", "return", "package", "import", "type", "struct", "range", "defer", "var", "nil"],
    "js": ["function", "return", "const", "let", "var", "class", "async", "await", "export", "import"],
}

_IDENT_STEMS = [
    "parse", "build", "merge", "split", "scan", "load", "dump", "hash", "sort", "index",
    "batch", "token", "score", "block", "match", "link", "align", "rank", "probe", "chunk",
]


def _rng(seed: int, *parts) -> random.Random:
    key = ":".join(["cogie", str(seed), *map(str, parts)])
    return random.Random(int.from_bytes(hashlib.sha256(key.encode()).digest()[:8], "big"))


def _base_content(rng: random.Random, lang: str) -> list[str]:
    """A base file as a list of lines (so mutations are line-local)."""
    kws = _KEYWORDS[lang]
    n_funcs = rng.randint(2, 5)
    lines: list[str] = [f"// module {rng.choice(_IDENT_STEMS)}_{rng.randint(0, 9999)}"]
    for _ in range(n_funcs):
        name = f"{rng.choice(_IDENT_STEMS)}_{rng.choice(_IDENT_STEMS)}_{rng.randint(0, 99)}"
        arity = rng.randint(1, 3)
        args = ", ".join(f"arg{i}" for i in range(arity))
        lines.append(f"{rng.choice(kws)} {name}({args}) {{")
        for _ in range(rng.randint(3, 8)):
            a = rng.choice(_IDENT_STEMS)
            b = rng.choice(_IDENT_STEMS)
            op = rng.choice(["+", "-", "*", "&&", "||", "=="])
            lines.append(f"  {rng.choice(kws)} {a}_{rng.randint(0, 999)} = {a}({b}) {op} {b}_{rng.randint(0, 999)};")
        lines.append(f"  return {rng.choice(_IDENT_STEMS)};")
        lines.append("}")
    return lines


def _mutate(rng: random.Random, lines: list[str]) -> list[str]:
    """Light, similarity-preserving mutation of a base file."""
    out = list(lines)
    kind = rng.choice(["comment", "rename", "whitespace", "append"])
    if kind == "comment":
        pos = rng.randrange(len(out))
        out.insert(pos, f"// note {rng.randint(0, 9999)}")
    elif kind == "rename":
        i = rng.randrange(len(out))
        out[i] = out[i].replace("arg0", f"param{rng.randint(0, 99)}")
    elif kind == "whitespace":
        i = rng.randrange(len(out))
        out[i] = "  " + out[i]
    else:
        out.append(f"// trailing {rng.randint(0, 9999)}")
    return out


# group size distribution: mostly singletons, tail up to 8 (FIXTURES.md §1)
_SIZE_CHOICES = [1, 1, 1, 1, 2, 2, 3, 3, 4, 5, 6, 8]


def _group_rows(seed: int, gid: int) -> list[dict]:
    rng = _rng(seed, "group", gid)
    lang = rng.choice(LANGS)
    size = rng.choice(_SIZE_CHOICES)
    base = _base_content(rng, lang)
    org = f"org{rng.randint(0, 49)}"
    rows = []
    for m in range(size):
        mrng = _rng(seed, "member", gid, m)
        lines = base if m == 0 else _mutate(mrng, base)
        content = "\n".join(lines)
        repo = f"{org}/proj{mrng.randint(0, 9)}"
        path = f"src/{mrng.choice(_IDENT_STEMS)}/{mrng.choice(_IDENT_STEMS)}{m}.{lang[:2]}"
        commit = hashlib.sha1(f"{seed}:{gid}:{m}".encode()).hexdigest()
        sha = hashlib.sha256(content.encode()).hexdigest()
        file_id = hashlib.sha256(f"{repo}{path}{commit}".encode()).hexdigest()
        rows.append(
            dict(
                repo=repo, path=path, commit=commit, lang=lang, content=content,
                sha256=sha, file_id=file_id, group_id=gid, member_idx=m,
            )
        )
    return rows


CODE_FILES_SCHEMA = (
    "repo string, path string, commit string, lang string, content string, "
    "sha256 string, file_id string, group_id long, member_idx int"
)


def code_files(
    spark: SparkSession,
    n_groups: int = 400,
    seed: int = 42,
    with_truth: bool = False,
) -> DataFrame:
    """Distributed deterministic code_files table (~2.7 rows/group).

    ``with_truth`` keeps the generator-internal (group_id, member_idx)
    columns — tests and the labeled-pairs builder use them; the pipeline
    input drops them (the engine must not see ground truth).
    """
    seed_b = seed

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for gid in pdf["id"]:
                rows.extend(_group_rows(seed_b, int(gid)))
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {c.split()[0]: [] for c in CODE_FILES_SCHEMA.split(", ")}
            )

    # partition count tracks cores (generation is Python-CPU-bound) but
    # caps rows-per-partition so huge fixtures still stream
    n_part = max(spark.sparkContext.defaultParallelism, n_groups // 200, 2)
    df = spark.range(0, n_groups, 1, numPartitions=n_part).mapInPandas(
        gen, schema=CODE_FILES_SCHEMA
    )
    if not with_truth:
        df = df.drop("group_id", "member_idx")
    return df


def labeled_pairs(files_with_truth: DataFrame) -> DataFrame:
    """Ground-truth labeled pairs at the shared blocking key (= lang).

    Positives: all intra-group pairs. Negatives: same-lang cross-group
    pairs sampled deterministically (each file paired with the next few
    files in group-id order within its lang) — the 'co-blocked non-match'
    population the pairwise F1 is evaluated over (BASELINE.json:
    'evaluated at the same blocking key'). Pure joins, no driver loop.
    """
    f = files_with_truth.select("file_id", "lang", "group_id").alias("a")
    g = files_with_truth.select("file_id", "lang", "group_id").alias("b")
    pos = (
        f.join(g, (F.col("a.group_id") == F.col("b.group_id")) & (F.col("a.file_id") < F.col("b.file_id")))
        .select(
            F.col("a.file_id").alias("left_id"),
            F.col("b.file_id").alias("right_id"),
            F.col("a.lang").alias("blocking_key"),
            F.lit(True).alias("is_match"),
        )
    )
    # deterministic negatives: order files within lang by group order and
    # pair each with the next 2 files (different group => non-match).
    # lead() over ONE window pass — the original join formulation's only
    # equi key was lang (5 values), which sort-merge-degenerates to a
    # within-lang all-pairs loop (~280k x 280k per lang at 450k groups);
    # lead() yields the identical (rk, rk+1/rk+2) pairs with no join.
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("group_id", "file_id")
    led = files_with_truth.select(
        "file_id",
        "lang",
        "group_id",
        F.lead("file_id", 1).over(w).alias("n1_id"),
        F.lead("group_id", 1).over(w).alias("n1_gid"),
        F.lead("file_id", 2).over(w).alias("n2_id"),
        F.lead("group_id", 2).over(w).alias("n2_gid"),
    )
    neg = (
        led.select(
            "file_id",
            "lang",
            "group_id",
            F.explode(
                F.array(
                    F.struct(F.col("n1_id").alias("nid"), F.col("n1_gid").alias("ngid")),
                    F.struct(F.col("n2_id").alias("nid"), F.col("n2_gid").alias("ngid")),
                )
            ).alias("nxt"),
        )
        .filter(F.col("nxt.nid").isNotNull() & (F.col("nxt.ngid") != F.col("group_id")))
        .select(
            F.least("file_id", F.col("nxt.nid")).alias("left_id"),
            F.greatest("file_id", F.col("nxt.nid")).alias("right_id"),
            F.col("lang").alias("blocking_key"),
            F.lit(False).alias("is_match"),
        )
    )
    return pos.unionByName(neg).dropDuplicates(["left_id", "right_id"])
