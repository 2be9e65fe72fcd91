"""geomesa_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of GeoMesa's query surface
(reference: /root/reference, geomesa/geomesa) in idiomatic PySpark:

- ``cells``      : vectorized Z2 space-filling-curve cell index (numpy)
                   — semantics of geomesa-z3 ``Z2SFC.scala`` / ``NormalizedDimension.scala``
- ``geo``        : pure-numpy geometry kernels (WKB/WKT, DE-9IM predicates, measures)
                   — semantics of geomesa-spark-jts (JTS delegation) re-implemented
- ``functions``  : the ``st_*`` Spark SQL function surface as vectorized pandas UDFs
- ``operators``  : spatial join, kNN, density/tiling, dedup, similarity, text analysis
- ``plans``      : driver-side planning (cell covers -> partition filters, guards)
- ``sources``    : partitioned image-table layout (cell_prefix partitioning),
                   deterministic fixture generation, pure-python image codecs
- ``streaming``  : upsert + TTL-expiry feature cache semantics (geomesa-kafka analog)

Everything is DataFrame-first: Catalyst handles pushdown/pruning/codegen; Python
only supplies driver-side planning and Arrow-vectorized kernels.
"""

__version__ = "0.1.0"
