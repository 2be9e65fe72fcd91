"""Raster layer: image codecs, deterministic image+caption fixtures, and
raster<->vector tiling operators.

The relational layer treats the image payload (``bytes, w, h, fmt``) as an
opaque binary column — the same way GeoMesa treats geometry as opaque WKB at
the Catalyst layer (reference:
/root/reference/geomesa-spark/geomesa-spark-jts/src/main/scala/org/apache/spark/sql/jts/AbstractGeometryUDT.scala:29-42).
Pixels are only materialized inside Arrow-batched pandas UDFs
(``mapInPandas`` / ``applyInPandas``), never on the driver.
"""

from geomesa_spark.raster.codec import (  # noqa: F401
    decode_image,
    encode_image,
    psnr,
    supported_formats,
)
from geomesa_spark.raster.fixtures import (  # noqa: F401
    image_batch,
    images_df,
    reference_pixels,
)
