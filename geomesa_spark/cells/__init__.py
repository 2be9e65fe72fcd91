"""Vectorized space-filling-curve cell index (numpy).

Re-expresses GeoMesa's Z2 curve semantics (reference:
/root/reference/geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/Z2SFC.scala:15-41
and NormalizedDimension.scala:56-72) as pure-numpy kernels suitable for
Arrow-batch pandas UDFs: floor-binning normalization with upper-bound clamp,
bit-interleaved Morton codes, bbox range covers, prefix truncation for
partition columns (analog of geomesa-fs Z2Scheme partition names,
/root/reference/geomesa-fs/.../partitions/Z2Scheme.scala:31-55), and k-ring
neighborhoods for kNN expansion.
"""

from geomesa_spark.cells.z2 import (  # noqa: F401
    MAX_RES,
    PARTITION_RES,
    bbox_cover,
    cell_bounds,
    cell_center,
    cell_id,
    cell_prefix,
    cell_to_bins,
    k_ring,
    lonlat_to_bins,
    z_decode,
    z_encode,
)
