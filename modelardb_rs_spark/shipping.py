"""Ship this package to Spark executors via ``addPyFile``.

The engine's Arrow UDFs (compression, decode) are pickled by reference,
so executor Python workers must be able to import ``modelardb_rs_spark``.
When the package is pip-installed cluster-wide that's automatic; when it
is run from a source checkout (tests, the driver harness), we zip the
package once and register it with ``SparkContext.addPyFile`` — the
idiomatic way to distribute Python dependencies to executors.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[str] = set()


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), f"modelardb_rs_spark_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for dirpath, _, files in os.walk(pkg_dir):
                if "__pycache__" in dirpath:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        rel = os.path.join(
                            "modelardb_rs_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED.add(app_id)
