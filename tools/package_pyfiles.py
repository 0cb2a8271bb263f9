"""Build the --py-files artifact for cluster launch.

The north-rule launch contract is `spark-submit --py-files <zip> run.py
--config ...` on a multi-executor cluster (reference lifecycle EP1,
src/main.cpp:33-118 run-from-config). Executors unpickle vectorized UDF
closures that reference `sbm_communitydetection_spark.*`, so the package
must ship to every executor's PYTHONPATH — that is exactly what
--py-files does with this zip.

Deterministic output: fixed timestamps + sorted member order, so the
artifact hash is stable across rebuilds of the same tree.

Usage: python tools/package_pyfiles.py [out_zip]   (default dist/sbm_communitydetection_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "sbm_communitydetection_spark"


def build(out_zip: str) -> str:
    os.makedirs(os.path.dirname(out_zip) or ".", exist_ok=True)
    members: list[str] = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                members.append(os.path.join(root, f))
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in members:
            arcname = os.path.relpath(path, REPO)
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(path, "rb") as fh:
                zf.writestr(info, fh.read())
    return out_zip


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", f"{PKG}.zip")
    path = build(out)
    print(path)
