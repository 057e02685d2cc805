"""Package pcompress_spark for `spark-submit --py-files` (SURVEY M8).

Writes dist/pcompress_spark.zip containing only the package sources —
tests, fixtures, and repo metadata excluded — with deterministic entry
order and timestamps so the artifact is byte-stable for a given tree
(same reproducibility posture as the checkpoint lineage).

Usage: python scripts/make_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "pcompress_spark"


def build(out_zip: str) -> list[str]:
    os.makedirs(os.path.dirname(out_zip) or ".", exist_ok=True)
    names: list[str] = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                path = os.path.join(root, f)
                names.append(os.path.relpath(path, REPO))
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel in names:
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(os.path.join(REPO, rel), "rb") as fh:
                zf.writestr(info, fh.read(), zipfile.ZIP_DEFLATED)
    return names


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "pcompress_spark.zip"
    )
    names = build(out)
    print(f"{out}: {len(names)} files, {os.path.getsize(out)} bytes")
