#!/usr/bin/env python3
"""Build geomesa_spark.zip for spark-submit --py-files distribution."""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(out: str = "geomesa_spark.zip") -> None:
    out_path = os.path.join(ROOT, out)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for base, _, files in os.walk(os.path.join(ROOT, "geomesa_spark")):
            if "__pycache__" in base:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(base, f)
                    zf.write(full, os.path.relpath(full, ROOT))
    print(out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
