"""Deterministic stratified sampling — the source-reweighting step of a
training-data pipeline.

After profiling a corpus (per-language counts from ``lang_id``, per-host
counts from ``url_host_stats``), a pipeline rebalances it by keeping each
stratum at its own rate. Two properties matter at 100 TB:

- **Deterministic**: the keep/drop decision is a pure function of a stable
  row key, so re-runs and checkpoint-resumed runs select the SAME rows, a
  row's fate never depends on partitioning or visit order, and two frames
  sampled with the same key agree (referential integrity across tables).
  Contrast ``DataFrame.sample``, whose output depends on partition layout.
- **Narrow**: the decision is one projection + filter inside whole-stage
  codegen — no shuffle, no RNG state, no driver round-trip — so it composes
  with pushed-down scans and costs one comparison per row.

Rate thresholds are pre-computed in INTEGER space (``int(rate * 2^32)``)
so there is no float rounding at the comparison and any engine that can
hash and compare 64-bit integers reproduces the exact sample (the DuckDB
oracle twin does).

Reference analog: GeoMesa's SamplingIterator / sample-by-key option
(/root/reference/geomesa-index-api/src/main/scala/org/locationtech/geomesa/
index/iterators/SamplingIterator.scala) keeps every n-th feature per
thread key; this operator is the rate-per-stratum generalization a corpus
pipeline needs. Re-implemented, not copied.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Unit interval is modeled as [0, 2^32) in integers.
_SCALE = 1 << 32

# Knuth multiplicative constant (2^32 / golden ratio, odd): the default
# cross-engine unit hash for non-negative integer keys. frac(k * A / 2^32)
# is equidistributed in k, and the arithmetic (one int64 multiply + mod)
# is exact in any engine — products stay < 2^63 for keys < 2^31.
KNUTH_A = 2654435761


def unit_hash_multiplicative(key: Column) -> Column:
    """``(key * KNUTH_A) mod 2^32`` — deterministic uniform-ish position in
    [0, 2^32) for a NON-NEGATIVE integer key; bit-exact across engines."""
    return F.pmod(key.cast("long") * F.lit(KNUTH_A), F.lit(_SCALE))


def unit_hash_xxhash(key: Column, salt: int = 0) -> Column:
    """xxhash64-based position in [0, 2^32) — the production default for
    arbitrary-typed keys (strings, structs). Spark-side only (DuckDB has
    no xxhash64), so oracle-twinned queries pass
    :func:`unit_hash_multiplicative` instead."""
    return F.pmod(F.xxhash64(key, F.lit(salt)), F.lit(_SCALE))


def stratified_sample(df: DataFrame, *, strata: str,
                      rates: dict[str, float], key: str,
                      default_rate: float = 0.0,
                      salt: int = 0,
                      unit_hash: Column | None = None) -> DataFrame:
    """Keep each row of stratum ``s`` with probability ``rates[s]``
    (``default_rate`` for unlisted strata), decided deterministically by a
    hash of ``key``: keep iff ``unit_hash(key) < int(rate * 2^32)``.

    ``unit_hash`` overrides the hash (default :func:`unit_hash_xxhash` of
    the key column with ``salt``); pass
    ``unit_hash_multiplicative(F.col(key))`` for a hash DuckDB replicates
    bit-exactly. Distinct ``salt`` values draw independent samples.

    The result is a filter over the input — all input columns survive, and
    the plan stays a single narrow codegen stage over the scan.

    NULL handling: a NULL stratum takes ``default_rate`` (the ``when``
    chain falls through, same as SQL ``CASE``). A NULL key under the
    default xxhash64 hash still produces a hash (all NULL-key rows share
    one keep/drop fate); under :func:`unit_hash_multiplicative` the NULL
    comparison is NULL and the row is DROPPED — the SQL-engine behavior.
    """
    if unit_hash is None:
        unit_hash = unit_hash_xxhash(F.col(key), salt)

    def _thr(rate: float) -> int:
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate {rate!r} outside [0, 1]")
        return int(rate * _SCALE)

    thr: Column | None = None
    for name, rate in rates.items():
        cond = F.col(strata) == name
        t = F.lit(_thr(rate))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default = F.lit(_thr(default_rate))
    thr = default if thr is None else thr.otherwise(default)
    return df.where(unit_hash < thr)
