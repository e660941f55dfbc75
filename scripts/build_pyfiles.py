"""Build dist/graphblas_algorithms_spark.zip for ``spark-submit --py-files``.

The north_star packaging contract: the whole engine ships to executors
as ONE zip on the PYTHONPATH (no pip install on workers).  stdlib-only
and deterministic: files are added sorted, with a fixed timestamp, so
the artifact is byte-reproducible for a given tree.

Usage: python scripts/build_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "graphblas_algorithms_spark"
FIXED_DATE = (2026, 1, 1, 0, 0, 0)


def build(out_zip: str) -> str:
    os.makedirs(os.path.dirname(out_zip) or ".", exist_ok=True)
    entries = []
    for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, ROOT)))
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_zip


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "dist", f"{PKG}.zip")
    print(build(out))
