"""Deterministic stratified sampling — the data-mixture rebalancing op.

A 100 TB training corpus is never used at its natural mixture: web text is
downweighted, books/news upweighted, per-language quotas applied. This
operator keeps a row iff a uniform hash of its key falls under the
stratum's rate — a pure narrow FILTER:

- zero shuffle, zero UDF: the keep-predicate is one md5 + one integer
  compare, fully inside whole-stage codegen, so it composes with scan
  pushdown and costs ~nothing at any scale;
- deterministic and stable: the same (key, rates) always selects the same
  rows, on any cluster size, any partitioning, any run — reproducible
  mixtures and resumable jobs for free (no RNG state, unlike
  ``df.sample`` whose per-partition seeds change under repartitioning);
- unbiased: the emitted ``weight`` = 1/rate is the Horvitz-Thompson
  inverse-inclusion-probability weight, so downstream sums/counts over
  ``weight`` estimate full-corpus totals.

The threshold compare is done in INTEGER space (``h32 < floor(rate·2^32)``)
so a SQL oracle reproduces it bit-exactly with no float-rounding seam.

No counterpart in the reference (xcube-stac assembles cubes, it does not
sample corpora); the op is part of the engine's LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import _h32

#: hash-space size for the 32-bit uniform key hash
_H32_SPACE = 1 << 32


def rate_thresholds(rates: dict[str, float]) -> dict[str, int]:
    """Integer keep-thresholds per stratum: floor(rate * 2^32).

    Rates outside [0, 1] are rejected: a rate > 1 would silently keep
    everything while emitting a < 1 Horvitz-Thompson weight, biasing every
    reweighted total downstream."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"sampling rate for stratum {s!r} must be in [0, 1], got {r}")
    return {s: int(r * _H32_SPACE) for s, r in rates.items()}


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value -> keep rate in [0, 1]; strata absent
    from the map use ``default_rate``. The decision hash is salted with
    ``salt`` so independent sampling passes over the same corpus are
    uncorrelated. Appends ``weight`` = 1/rate (inverse inclusion
    probability) for unbiased reweighting downstream.
    """
    thr = rate_thresholds(rates)
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    dthr = int(default_rate * _H32_SPACE)
    s = F.col(strata_col)
    thr_col: Column = F.lit(dthr)
    rate_col: Column = F.lit(float(default_rate))
    for stratum, t in thr.items():
        thr_col = F.when(s == stratum, F.lit(t)).otherwise(thr_col)
        rate_col = F.when(s == stratum, F.lit(float(rates[stratum]))).otherwise(
            rate_col
        )
    u = _h32(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    return df.where(u < thr_col).withColumn(
        "weight", F.round(F.lit(1.0) / rate_col, 6)
    )
