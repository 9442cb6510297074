"""Ship the cogie_spark package to executor Python workers.

Executor workers do not inherit the driver's sys.path; on a real
cluster the package arrives via ``spark-submit --py-files`` (the north
rule's deployment contract — the reference's analogue is its model/
artifact download into ~/.cogie, /root/reference/cogie/utils/model.py:
23-40). For drivers that start a bare SparkSession (the grading
harness, notebooks), ``ensure_shipped`` builds the same zip artifact on
the fly and registers it with addPyFile — idempotent per session.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

_SHIPPED_ATTR = "_cogie_spark_shipped"


def _source_digest(pkg_dir: str) -> str:
    """Content hash of every .py in the package — the zip artifact name
    must change when the source changes, or executors keep importing a
    stale cached zip (addPyFile zips precede PYTHONPATH on executors)."""
    h = hashlib.sha256()
    for root, _dirs, fnames in sorted(os.walk(pkg_dir)):
        if "__pycache__" in root:
            continue
        for fn in sorted(fnames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(root, fn)
            h.update(os.path.relpath(full, pkg_dir).encode())
            with open(full, "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:16]


def package_zip() -> str:
    """Build (once per source state) a zip of the cogie_spark package."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(
        tempfile.gettempdir(), f"cogie_spark_pkg_{_source_digest(pkg_dir)}.zip"
    )
    if not os.path.exists(out):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _dirs, fnames in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for fn in fnames:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join("cogie_spark", os.path.relpath(full, pkg_dir))
                    z.write(full, rel)
        os.replace(tmp, out)
    return out


def ensure_shipped(spark) -> None:
    """Idempotently add the package zip to the session's Python path."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    sc.addPyFile(package_zip())
    setattr(sc, _SHIPPED_ATTR, True)
