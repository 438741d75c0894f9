"""Ship the reair_spark package to Python workers.

Closures sent to executors reference module-level classes/functions
(DirectoryCatalog, copy/commit task bodies), which cloudpickle
serializes BY REFERENCE — so Python workers must be able to
``import reair_spark``. On a production cluster the package is
installed or passed via ``spark-submit --py-files``; for a library
used from an arbitrary driver process we do the runtime equivalent:
zip the package once and ``sc.addPyFile`` it (idempotent per session).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_reair_spark_shipped"


def _package_zip() -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    sources = sorted(
        os.path.join(root, f)
        for root, _dirs, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(".py")
    )
    h = hashlib.md5()
    for s in sources:
        h.update(s.encode())
        h.update(str(os.path.getmtime(s)).encode())
    out = os.path.join(tempfile.gettempdir(), f"reair_spark_{h.hexdigest()[:12]}.zip")
    if not os.path.exists(out):
        tmp = f"{out}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for s in sources:
                zf.write(s, os.path.join("reair_spark", os.path.relpath(s, pkg_dir)))
        os.replace(tmp, out)
    return out


def ensure_shipped(spark: SparkSession) -> None:
    """Make ``import reair_spark`` work on executors (idempotent)."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    sc.addPyFile(_package_zip())
    setattr(sc, _SHIPPED_ATTR, True)
