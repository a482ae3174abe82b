#!/usr/bin/env python
"""Package greenex_py_spark for ``spark-submit --py-files`` (north_rule).

Produces dist/greenex_py_spark.zip containing the package only (no
tests/bench); ship with:

    spark-submit --py-files dist/greenex_py_spark.zip job.py
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_dir: str = "dist") -> str:
    dist = os.path.join(REPO, out_dir)
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "greenex_py_spark.zip")
    pkg = os.path.join(REPO, "greenex_py_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
