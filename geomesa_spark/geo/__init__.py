"""Pure-Python/numpy geometry kernels (no JVM, no C deps).

Re-implements the geometry semantics the reference delegates to JTS
(geomesa-spark-jts, /root/reference/geomesa-spark/geomesa-spark-jts/):
WKB/WKT/GeoJSON IO, DE-9IM relate + named predicates, measures
(area/length/centroid/distance, haversine + Vincenty geodesics), convex
hull, geohash, antimeridian-safe splitting, and geodesic point buffers.

Hot path: points are parsed from WKB with vectorized numpy (fixed 21-byte
layout); generic geometries go through the object model per batch inside
Arrow pandas UDFs.
"""

from geomesa_spark.geo.model import (  # noqa: F401
    Geometry,
    GeometryCollection,
    LineString,
    MultiLineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
)
from geomesa_spark.geo.io import (  # noqa: F401
    from_geojson,
    from_wkb,
    from_wkt,
    points_from_wkb,
    points_to_wkb,
    to_geojson,
    to_wkb,
    to_wkt,
)
