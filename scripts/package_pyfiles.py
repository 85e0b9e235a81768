"""Build the --py-files zip for spark-submit deployment.

Usage: python scripts/package_pyfiles.py [dist/png_from_pdf_extracter_spark.zip]

Zips the ``png_from_pdf_extracter_spark`` package (source only) so executors
can import the extractor kernel + plan code. Deterministic: fixed timestamps,
sorted entries — the zip digest is stable for lineage records.
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "png_from_pdf_extracter_spark"


def build(out_path: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    entries = []
    for dirpath, _, files in os.walk(os.path.join(root, PKG)):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                entries.append((os.path.relpath(full, root), full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/png_from_pdf_extracter_spark.zip"
    print(build(out))
