"""Driver-side query planning: cell covers -> partition filters, guards."""

from geomesa_spark.plans.planner import (  # noqa: F401
    cell_cover_of_geometry,
    prune_by_geometry,
    query_guard,
)
