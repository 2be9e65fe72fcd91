#!/usr/bin/env python3
"""Build geomesa_spark.zip for spark-submit --py-files distribution."""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from geomesa_spark.shipping import build_zip  # noqa: E402


def main(out: str = "geomesa_spark.zip") -> None:
    print(build_zip(os.path.join(ROOT, out)))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--out"]
    main(*args)
