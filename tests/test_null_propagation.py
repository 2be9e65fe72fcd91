"""Systematic null-propagation audit for every registered st_* function:
null in -> null out, the reference's nullableUDF guarantee
(/root/reference/geomesa-spark/geomesa-spark-jts/src/main/scala/org/
locationtech/geomesa/spark/jts/util/SQLFunctionHelper.scala:22-53).

Every UDF carries ``_st_sig`` (one char per arg: 'g' geometry WKB,
'v' raw value), so the audit is parametrized over the live registry —
a newly added function is covered automatically or fails the
metadata-presence check."""

from __future__ import annotations

import pytest

from geomesa_spark.functions.st import get_udfs

_NULL_FOR = {"g": "CAST(NULL AS BINARY)", "v": "CAST(NULL AS STRING)"}
# WKB hex of POINT(1 2), built by the engine itself in-session
_POINT_SQL = "st_geomFromWKT('POINT(1 2)')"


def _registered(spark):
    from geomesa_spark.functions.st import register_all
    register_all(spark)
    return get_udfs()


def test_every_udf_declares_signature():
    udfs = get_udfs()
    missing = [n for n, u in udfs.items() if not hasattr(u, "_st_sig")]
    assert not missing, f"st_* functions without _st_sig metadata: {missing}"
    assert len(udfs) >= 80  # the full surface stays registered


@pytest.fixture(scope="module")
def udfs(spark):
    return _registered(spark)


def test_all_args_null_yields_null(spark, udfs):
    """One batched query: every function applied to all-NULL args of its
    declared signature must return NULL."""
    exprs = []
    names = []
    for name, u in sorted(udfs.items()):
        args = ", ".join(_NULL_FOR[c] for c in u._st_sig)
        exprs.append(f"{name}({args}) AS `{name}`")
        names.append(name)
    row = spark.sql("SELECT " + ", ".join(exprs)).collect()[0]
    bad = [n for n in names if row[n] is not None]
    assert not bad, f"null-in did not yield null-out: {bad}"


def test_one_geometry_arg_null_yields_null(spark, udfs):
    """Two-geometry functions with only ONE side null must still null
    out (nullableUDF nulls if ANY input is null)."""
    exprs, names = [], []
    for name, u in sorted(udfs.items()):
        if u._st_sig != "gg":
            continue
        exprs.append(f"{name}({_POINT_SQL}, CAST(NULL AS BINARY)) "
                     f"AS `{name}_r`")
        exprs.append(f"{name}(CAST(NULL AS BINARY), {_POINT_SQL}) "
                     f"AS `{name}_l`")
        names += [f"{name}_r", f"{name}_l"]
    row = spark.sql("SELECT " + ", ".join(exprs)).collect()[0]
    bad = [n for n in names if row[n] is not None]
    assert not bad, f"one-side-null did not yield null: {bad}"


def test_quirky_nonnull_semantics_preserved(spark, udfs):
    """The audit must not regress the reference's quirky NON-null
    behaviors: st_isClosed is true for non-lines, st_x/st_y null for
    non-points (GeometricAccessorFunctions.scala)."""
    row = spark.sql(f"""
        SELECT st_isClosed(st_geomFromWKT('POINT(1 2)')) AS c,
               st_x(st_geomFromWKT('LINESTRING(0 0, 1 1)')) AS x,
               st_y(st_geomFromWKT('LINESTRING(0 0, 1 1)')) AS y,
               st_x({_POINT_SQL}) AS px
    """).collect()[0]
    assert row["c"] is True
    assert row["x"] is None and row["y"] is None
    assert row["px"] == pytest.approx(1.0)
