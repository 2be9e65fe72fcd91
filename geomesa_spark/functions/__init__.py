"""Spark SQL function surface: the ~75 st_* functions of the reference's
geomesa-spark-jts module, registered as Arrow-vectorized pandas UDFs."""

from geomesa_spark.functions.st import register_all  # noqa: F401
