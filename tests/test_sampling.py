from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cogie_spark.operators.sampling import mix_report, mix_sample


def _corpus(spark, n=6000, seed=7):
    """Deterministic synthetic corpus: 3 strata with skewed supply."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.element_at(
                F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("fr"), F.lit("code")),
                (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(5)) + 1).cast("int"),
            ).alias("lang"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(900)) + 100).alias("n_tokens"),
        )
    )


def test_report_arithmetic(spark):
    df = _corpus(spark)
    avail = {
        r["lang"]: r["w"]
        for r in df.groupBy("lang").agg(F.sum("n_tokens").alias("w")).collect()
    }
    budget = 500_000.0
    mix = {"en": 0.5, "fr": 0.3, "code": 0.1, "de": 0.1}
    rows = {r["stratum"]: r for r in mix_report(df, mix, budget)}
    assert rows["en"]["target"] == pytest.approx(250_000.0)
    assert rows["en"]["rate"] == pytest.approx(250_000.0 / avail["en"])
    # stratum in the mix but absent from the data is visible, not silent
    assert rows["de"]["available"] == 0.0 and rows["de"]["rate"] == 0.0
    assert rows["de"]["action"] == "absent"
    # every data stratum is accounted for (none here falls outside the mix)
    assert set(rows) == {"en", "fr", "code", "de"}


def test_mix_proportions_and_budget(spark):
    df = _corpus(spark)
    # supply at n=6000, seed=7: en ~1.94M, fr ~0.69M, code ~0.69M tokens
    # -> fr's 0.7 share of 1.4M (980k) exceeds supply: genuinely upsampled
    budget = 1_400_000.0
    mix = {"en": 0.2, "fr": 0.7, "code": 0.1}
    rep: list[dict] = []
    out = mix_sample(df, mix, budget, report=rep).persist()
    got = {
        r["lang"]: r["w"]
        for r in out.groupBy("lang").agg(F.sum("n_tokens").alias("w")).collect()
    }
    # expected emitted weight per stratum == target within sampling noise
    # (Bernoulli over thousands of docs: 5% tolerance is > 4 sigma here)
    for s, p in mix.items():
        assert got[s] == pytest.approx(p * budget, rel=0.05), (s, got[s], p * budget)
    assert sum(got.values()) == pytest.approx(budget, rel=0.04)
    # fr is under-supplied at this budget -> upsampled copies exist
    rates = {r["stratum"]: r["rate"] for r in rep}
    assert rates["fr"] > 1.0
    assert out.filter((F.col("lang") == "fr") & (F.col("copy_idx") >= 1)).count() > 0
    # originals of an upsampled stratum are all kept
    n_fr_orig = out.filter((F.col("lang") == "fr") & (F.col("copy_idx") == 0)).count()
    assert n_fr_orig == df.filter(F.col("lang") == "fr").count()
    out.unpersist()


def test_deterministic_across_partitionings(spark):
    df = _corpus(spark, n=3000)
    mix = {"en": 0.6, "fr": 0.2, "code": 0.2}
    a = mix_sample(df.repartition(2), mix, 200_000.0, seed=11)
    b = mix_sample(df.repartition(17, "lang"), mix, 200_000.0, seed=11)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # a different seed draws a different sample
    c = mix_sample(df.repartition(2), mix, 200_000.0, seed=12)
    assert a.exceptAll(c).count() > 0


def test_downsample_only_mode_and_drops(spark):
    df = _corpus(spark)
    # 'code' absent from the mix -> dropped, visible in the report
    mix = {"en": 0.8, "fr": 0.2}
    rep: list[dict] = []
    out = mix_sample(df, mix, 100_000.0, upsample=False, report=rep).persist()
    assert out.filter(F.col("lang") == "code").count() == 0
    actions = {r["stratum"]: r["action"] for r in rep}
    assert actions["code"] == "drop"
    # upsample=False caps every rate at 1 -> no copies anywhere
    assert out.filter(F.col("copy_idx") >= 1).count() == 0
    assert out.count() <= df.count()
    out.unpersist()


def test_mix_must_sum_to_one(spark):
    df = _corpus(spark, n=100)
    with pytest.raises(ValueError):
        mix_report(df, {"en": 0.5, "fr": 0.2}, 1000.0)


def test_row_path_has_no_exchange(spark):
    """The sampling scan itself must not shuffle: one filter + one
    generate over the input (the only aggregation is the bounded
    driver-side report, which runs before the plan is built)."""
    df = _corpus(spark, n=500)
    out = mix_sample(df, {"en": 0.6, "fr": 0.2, "code": 0.2}, 50_000.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_report_null_stratum_and_null_weights(spark):
    """Code-review regression: a NULL stratum (lang undetected) must land
    in the 'drop' rows instead of crashing the report sort, and a
    stratum whose weights are all NULL must read as available=0
    ('absent' when named in the mix), not TypeError on float(None)."""
    df = spark.createDataFrame(
        [
            (0, "en", 100),
            (1, None, 50),     # NULL stratum — never nameable in a mix
            (2, "fr", None),   # named stratum, all-NULL supply
            (3, None, None),
        ],
        "doc_id long, lang string, n_tokens long",
    )
    rows = {r["stratum"]: r for r in mix_report(df, {"en": 0.5, "fr": 0.5}, 100.0)}
    assert rows["en"]["action"] == "down" and rows["en"]["available"] == 100.0
    assert rows["fr"]["action"] == "absent" and rows["fr"]["available"] == 0.0
    assert rows[None]["action"] == "drop" and rows[None]["available"] == 50.0
    # and the sampler drops the NULL-stratum rows (consistent with 'drop')
    out = mix_sample(df, {"en": 0.5, "fr": 0.5}, 100.0)
    assert {r["doc_id"] for r in out.select("doc_id").collect()} <= {0}
