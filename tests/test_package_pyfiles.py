"""--py-files artifact: deterministic bytes, complete package contents."""

import hashlib
import os
import sys
import zipfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from package_pyfiles import PKG, REPO, build  # noqa: E402


def test_zip_is_deterministic_and_complete(tmp_path):
    a = build(str(tmp_path / "a.zip"))
    b = build(str(tmp_path / "b.zip"))
    ha = hashlib.sha256(open(a, "rb").read()).hexdigest()
    hb = hashlib.sha256(open(b, "rb").read()).hexdigest()
    assert ha == hb  # stable artifact hash across rebuilds of the same tree

    with zipfile.ZipFile(a) as zf:
        names = set(zf.namelist())
    # every package module ships; no caches sneak in
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                rel = os.path.relpath(os.path.join(root, f), REPO)
                assert rel in names
    assert not any("__pycache__" in n for n in names)
    assert all(n.startswith(PKG + "/") for n in names)
