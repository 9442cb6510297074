"""Domain-mix sampling: hit a target per-stratum token mix, deterministically.

LLM training corpora are MIXED to target proportions (so much code, so
much encyclopedia, so much web) before packing — the step between
cleaning/dedup (plans/corpus.py) and sequence packing (operators/
packing.py). The reference's analogue is the pluggable sampler it
threads into every training DataLoader
(/root/reference/cogie/core/trainer.py:31-32,112-113,135 — a
torch.utils.data sampler decides which rows feed the model at what
ratio); here the ratio is enforced declaratively over ONE table at any
scale instead of per-process at iteration time.

Semantics (mix_sample):
- per stratum s with target proportion p_s and total budget B (in
  ``weight_col`` units, e.g. tokens): target_s = p_s * B.
- over-supplied stratum (available_s >= target_s): DOWN-sample by
  deterministic Bernoulli with rate target_s/available_s.
- under-supplied stratum: keep everything, and if ``upsample=True``
  emit each row floor(f) or ceil(f) times (f = target_s/available_s)
  via explode(sequence(...)), so the EXPECTED emitted weight is exactly
  target_s. Copies are numbered in ``copy_idx`` — downstream packing
  treats them as distinct rows (the standard multi-epoch upsampling of
  scarce high-quality sources).
- strata not named in the mix are dropped (explicitly, counted in the
  report — north rule: no silent caps).

Determinism: every keep/repeat decision is a pure function of
(id_col, seed) via xxhash64 — re-running at any parallelism, partition
count, or cluster size emits the identical multiset of rows. No RNG
state, no per-partition dependence (`F.rand` is neither: its draw
depends on row-to-partition placement).

Scale: one map-side-combined aggregation over #strata groups (collected
to the driver — bounded by the mix's own size, like the vocab path),
then ONE scan with codegen'd filter/explode. No shuffle of the data
itself, no Python in the row path. Survives 10^12 rows as long as the
mix has bounded strata (it does by construction — it is human-written).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# xxhash64 -> uniform in [0,1): low 30 bits / 2^30 (positive, exact in double)
_U_BITS = 30
_U_DENOM = float(1 << _U_BITS)


def _unit_hash(id_col: str, seed: int, salt: str) -> F.Column:
    h = F.xxhash64(F.col(id_col).cast("string"), F.lit(salt), F.lit(seed))
    return (F.pmod(h, F.lit(1 << _U_BITS))).cast("double") / F.lit(_U_DENOM)


def mix_report(
    df: DataFrame,
    mix: dict[str, float],
    budget: float,
    stratum_col: str = "lang",
    weight_col: str = "n_tokens",
) -> list[dict]:
    """Per-stratum plan: available weight, target, rate. One bounded agg.

    Rows: {stratum, available, target, rate, action} where action is
    'down' (rate < 1), 'up' (rate > 1), 'keep' (rate == 1) or 'drop'
    (stratum absent from the mix). Strata named in the mix but absent
    from the data appear with available=0 so a typo'd mix is visible.
    """
    total_p = sum(mix.values())
    if not mix or abs(total_p - 1.0) > 1e-9:
        raise ValueError(f"mix proportions must sum to 1 (got {total_p})")
    # null-safe on both sides of the agg: a NULL stratum (e.g. lang
    # undetected) is a real group that can never be named in a mix —
    # it lands in the 'drop' rows below; an all-NULL weight group sums
    # to NULL -> 0 available.
    avail = {
        r["s"]: float(r["w"] or 0.0)
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.sum(F.col(weight_col)).alias("w"))
        .collect()
    }
    report = []
    for s, p in sorted(mix.items()):
        a = avail.pop(s, 0.0)
        target = p * budget
        rate = (target / a) if a > 0 else 0.0
        if a == 0:
            action = "absent"  # named in the mix, no supply — a loud typo guard
        else:
            action = "up" if rate > 1 else ("down" if rate < 1 else "keep")
        report.append(
            {"stratum": s, "available": a, "target": target, "rate": rate, "action": action}
        )
    for s, a in sorted(avail.items(), key=lambda kv: (kv[0] is None, kv[0] or "")):
        report.append({"stratum": s, "available": a, "target": 0.0, "rate": 0.0, "action": "drop"})
    return report


def mix_sample(
    df: DataFrame,
    mix: dict[str, float],
    budget: float,
    stratum_col: str = "lang",
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 42,
    upsample: bool = True,
    report: list[dict] | None = None,
) -> DataFrame:
    """Sample ``df`` so each stratum's expected total ``weight_col``
    equals ``mix[stratum] * budget``. Returns the sampled rows plus a
    ``copy_idx`` column (0 for originals, 1.. for upsampled copies).

    Pass ``report=[]`` to also receive the :func:`mix_report` rows the
    plan was built from (the bounded driver-side agg runs exactly once
    either way).
    """
    rows = mix_report(df, mix, budget, stratum_col=stratum_col, weight_col=weight_col)
    if report is not None:
        report.extend(rows)

    # rate literals per stratum, folded into one CASE expression
    rate_expr = None
    for r in rows:
        if r["action"] == "drop" or r["available"] == 0:
            continue
        rate = r["rate"] if upsample else min(r["rate"], 1.0)
        cond = F.col(stratum_col) == F.lit(r["stratum"])
        rate_expr = (
            F.when(cond, F.lit(rate))
            if rate_expr is None
            else rate_expr.when(cond, F.lit(rate))
        )
    if rate_expr is None:
        # nothing in the mix exists in the data
        return df.withColumn("copy_idx", F.lit(0)).filter(F.lit(False))
    rate_col = rate_expr.otherwise(F.lit(0.0))

    # n_copies = floor(rate) + Bernoulli(frac(rate)); covers both the
    # down-sampling case (floor 0, frac = keep-probability) and the
    # upsampling case (floor >= 1 whole copies + one fractional)
    u = _unit_hash(id_col, seed, "mix")
    n_copies = (F.floor(rate_col) + (u < rate_col - F.floor(rate_col)).cast("int")).cast("int")
    return (
        df.withColumn("_n", n_copies)
        .filter(F.col("_n") >= 1)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )
