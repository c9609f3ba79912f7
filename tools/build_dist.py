"""Build dist/hgcn_name_disambiguation_spark.zip for spark-submit --py-files.

Deterministic: fixed timestamps, sorted entries — the zip is
byte-identical for identical sources (useful for cache-keyed deploys).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "hgcn_name_disambiguation_spark"
OUT = os.path.join(REPO, "dist", f"{PKG}.zip")


def build() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    entries = []
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, full in entries:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data, zipfile.ZIP_DEFLATED)
    return OUT


if __name__ == "__main__":
    print(build())
