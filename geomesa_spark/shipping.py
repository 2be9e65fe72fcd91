"""Ship this package to executor Python workers via ``addPyFile``.

The driver process imports ``geomesa_spark`` through its own sys.path,
but UDF workers spawn from the JVM with their own environment: without
shipping, any pandas-UDF stage dies with ``ModuleNotFoundError`` the
moment the job runs from a cwd other than the repo root and the user
forgot ``spark-submit --py-files geomesa_spark.zip``. Every entry point
(the ``jobs/`` scripts, ``__spark_entry__``) calls :func:`ship_package`
right after building its session, so both invocation styles work:

    spark-submit --py-files geomesa_spark.zip jobs/ingest_images.py ...
    python jobs/ingest_images.py ...      # from any cwd

Re-shipping under an already-registered name is harmless (Spark keeps
the first registration); the per-SparkContext cache just avoids
rebuilding the zip on every query.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[str] = set()


def build_zip(out_path: str | None = None) -> str:
    """Zip the package sources (the same layout ``tools/package.py``
    builds for ``--py-files``) and return the zip path."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if out_path is None:
        out_path = os.path.join(tempfile.gettempdir(),
                                "geomesa_spark_pyfiles.zip")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for base, _, files in os.walk(os.path.join(root, "geomesa_spark")):
            if "__pycache__" in base:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(base, f)
                    zf.write(full, os.path.relpath(full, root))
    return out_path


def ship_package(spark) -> None:
    """Idempotently register the package zip with ``addPyFile``."""
    sc = spark.sparkContext
    # keyed on applicationId, NOT id(sc): a stopped context's memory
    # address can be reused by the next one, which would skip the ship
    # and fail every pandas-UDF stage of the new session
    app_id = sc.applicationId
    if app_id in _SHIPPED:
        return
    # Build OUTSIDE the guard: a zip-build failure (full disk, /tmp zip
    # owned by another user) must raise here, where it is diagnosable —
    # swallowing it would cache this context as shipped and every later
    # pandas-UDF stage would die with a worker-side ModuleNotFoundError.
    zip_path = build_zip()
    try:
        sc.addPyFile(zip_path)
    except Exception:
        pass  # e.g. already added under the same name by --py-files
    _SHIPPED.add(app_id)
