"""Table layout + ingest: cell-partitioned storage with lineage and
checkpointed resume."""

from geomesa_spark.sources.table import (  # noqa: F401
    RESERVED_CELL,
    completed_chunks,
    ingest_images,
    lineage_df,
    read_balanced,
    read_images,
    write_partitioned,
)
