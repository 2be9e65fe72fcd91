"""Small analytic/transform processes, as DataFrame programs.

Reference semantics re-derived (cited, not copied):
- Point2Point: group points into per-track consecutive segments sorted
  by a date field, optional day-boundary breaking, minimum group size,
  zero-length filtering (/root/reference/geomesa-process/
  geomesa-process-vector/src/main/scala/org/locationtech/geomesa/
  process/analytic/Point2PointProcess.scala:73-108).
- TrackLabel: one representative feature per track — the latest by the
  date field (TrackLabelProcess.scala:54-61; the reference's maxBy is
  tie-unstable, here ties break deterministically by ``tiebreak``).
- DateOffset: shift a date attribute by an ISO-8601 duration
  (DateOffsetProcess.scala:40-52).
- HashAttribute: deterministic hash bucket of an attribute modulo N
  (HashAttributeProcess.scala:48-58). The reference hashes with scala
  MurmurHash3 over UTF-16LE bytes; the hash function is engine-pinned
  (not part of the portable contract), so this build uses the same
  char-fold polynomial hash as the text fingerprints — bit-exactly
  replicable in the SQL oracle, same bucketing contract.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window, functions as F

EARTH_MEAN_RADIUS_M = 6371008.7714


def haversine_expr(lon1, lat1, lon2, lat2,
                   radius: float = EARTH_MEAN_RADIUS_M) -> Column:
    """Great-circle distance in meters, pure Catalyst (codegen)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = (rl2 - rl1) / 2
    dlon = (F.radians(lon2) - F.radians(lon1)) / 2
    a = F.sin(dlat) ** 2 + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) ** 2
    # clamp: float rounding can push a epsilon past 1 for antipodes
    return 2 * radius * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def point2point(df: DataFrame, *, group: str, sort: str,
                lon: str = "lon", lat: str = "lat",
                min_points: int = 2, break_on_day: bool = False,
                filter_singular: bool = True,
                tiebreak: list[str] | None = None) -> DataFrame:
    """Aggregate points into per-track consecutive line segments.

    Output: one row per consecutive point pair within a group (ordered
    by ``sort`` then ``tiebreak``): the group value, a per-group segment
    index, segment endpoints (x1, y1, x2, y2), the sort values at both
    ends (``<sort>_start`` / ``<sort>_end``) and the orthodromic length
    ``dist_m``. Groups need MORE than ``min_points`` rows (the
    reference's strict comparison); with ``break_on_day`` segments never
    cross a UTC day boundary and day-groups need >= 2 points; with
    ``filter_singular`` zero-length segments are dropped.

    Everything is windows + built-ins over one shuffle on the group key
    — no collect, scales with the number of tracks."""
    tb = [F.col(c) for c in (tiebreak or [])]
    part = [group, F.dayofyear(F.col(sort)), F.year(F.col(sort))] \
        if break_on_day else [group]
    w = Window.partitionBy(*part).orderBy(F.col(sort), *tb)
    wg = Window.partitionBy(group)
    wp = Window.partitionBy(*part)
    d = (df.withColumn("__n_grp__", F.count("*").over(wg))
           .withColumn("__n_day__", F.count("*").over(wp))
           .where(F.col("__n_grp__") > min_points))
    if break_on_day:
        d = d.where(F.col("__n_day__") >= 2)
    d = (d.withColumn("__x2__", F.lead(lon).over(w))
          .withColumn("__y2__", F.lead(lat).over(w))
          .withColumn("__s2__", F.lead(sort).over(w))
          .where(F.col("__x2__").isNotNull()))
    wseg = Window.partitionBy(group).orderBy(F.col(sort), *tb)
    out = d.select(
        F.col(group),
        (F.row_number().over(wseg) - 1).alias("seg"),
        F.col(lon).alias("x1"), F.col(lat).alias("y1"),
        F.col("__x2__").alias("x2"), F.col("__y2__").alias("y2"),
        F.col(sort).alias(f"{sort}_start"),
        F.col("__s2__").alias(f"{sort}_end"),
        haversine_expr(F.col(lon), F.col(lat),
                       F.col("__x2__"), F.col("__y2__")).alias("dist_m"))
    if filter_singular:
        out = out.where(F.col("dist_m") > 0.0)
    return out


def track_label(df: DataFrame, *, track: str, dtg: str | None = None,
                tiebreak: list[str] | None = None) -> DataFrame:
    """One label row per track: the latest by ``dtg`` (ties broken by
    ``tiebreak`` descending — the reference's maxBy keeps an arbitrary
    max; this contract is deterministic), or an arbitrary-but-
    deterministic first row when no date column is given."""
    order = ([F.col(dtg).desc()] if dtg else []) \
        + [F.col(c).desc() for c in (tiebreak or [])]
    if not order:
        raise ValueError("track_label needs dtg and/or tiebreak columns")
    w = Window.partitionBy(track).orderBy(*order)
    return (df.withColumn("__rn__", F.row_number().over(w))
            .where(F.col("__rn__") == 1).drop("__rn__"))


_DURATION_RE = re.compile(
    r"^(?P<sign>-)?P(?:(?P<d>\d+)D)?"
    r"(?:T(?:(?P<h>\d+)H)?(?:(?P<m>\d+)M)?(?:(?P<s>\d+)S)?)?$")


def parse_duration_seconds(offset: str) -> int:
    """ISO-8601 day/time duration (P1D, PT2H30M, -PT15S) -> seconds."""
    m = _DURATION_RE.match(offset.strip())
    if not m or offset.strip() in ("P", "PT", "-P", "-PT"):
        raise ValueError(f"invalid ISO-8601 duration: {offset!r}")
    g = m.groupdict()
    secs = (int(g["d"] or 0) * 86400 + int(g["h"] or 0) * 3600
            + int(g["m"] or 0) * 60 + int(g["s"] or 0))
    return -secs if g["sign"] else secs


def date_offset(df: DataFrame, *, date_col: str,
                offset: str) -> DataFrame:
    """Shift ``date_col`` by an ISO-8601 duration (DateOffsetProcess).
    Pure column arithmetic — no shuffle, no Python."""
    secs = parse_duration_seconds(offset)
    shifted = F.timestamp_add("SECOND", F.lit(secs), F.col(date_col))
    return df.withColumn(date_col, shifted)


def hash_attribute(df: DataFrame, *, attribute: str, modulo: int,
                   out: str = "hash") -> DataFrame:
    """Deterministic hash bucket of ``attribute`` in [0, modulo) — the
    HashAttribute process contract. Null attributes hash as the empty
    string (the reference's Option(...).getOrElse(""))."""
    from geomesa_spark.text.analysis import char_hash_expr
    s = F.coalesce(F.col(attribute).cast("string"), F.lit(""))
    return df.withColumn(out, (char_hash_expr(s) % modulo).cast("int"))


_COLORS = ("#6495ED", "#B0C4DE", "#00FFFF", "#9ACD32", "#00FA9A",
           "#FFF8DC", "#F5DEB3")


def hash_attribute_color(df: DataFrame, *, attribute: str, modulo: int,
                         out: str = "hash") -> DataFrame:
    """HashAttributeColorProcess: the hash bucket mapped onto the
    reference's 7-color viz palette."""
    d = hash_attribute(df, attribute=attribute, modulo=modulo, out=out)
    return d.withColumn(
        out, F.element_at(F.array(*[F.lit(c) for c in _COLORS]),
                          (F.col(out) % len(_COLORS)) + 1))
