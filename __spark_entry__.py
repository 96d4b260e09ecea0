"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real definitions live in the ``ner_spark`` package; this module is
a thin adapter over its operator registry (ner_spark.ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"

_SHIPPED: set[str] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to executor python workers via addPyFile —
    works for ANY session (the driver's own included), regardless of
    cwd/PYTHONPATH; the sandbox analog of ``--py-files ner_spark.zip``.
    """
    # applicationId, not id(sc): a restarted context can reuse the
    # freed object's address, which would skip shipping to the new
    # context's executors (ModuleNotFoundError in every UDF task)
    key = spark.sparkContext.applicationId
    if key in _SHIPPED:
        return
    import hashlib
    import tempfile
    import zipfile

    root = os.path.dirname(os.path.abspath(__file__))
    members = []
    for dirpath, _dirs, files in sorted(os.walk(os.path.join(root, "ner_spark"))):
        if "__pycache__" in dirpath:
            continue
        for fn in sorted(files):
            if fn.endswith((".py", ".npz")):
                members.append(os.path.join(dirpath, fn))
    # Zip name carries a content hash: a fixed name would silently
    # ship a STALE zip left in tempdir by an earlier run of different
    # code (executors then run old code while the driver runs new).
    h = hashlib.sha256()
    for full in members:
        h.update(full.encode())
        with open(full, "rb") as f:
            h.update(f.read())
    zpath = os.path.join(
        tempfile.gettempdir(), f"ner_spark_pkg-{h.hexdigest()[:12]}.zip"
    )
    if not os.path.exists(zpath):
        # tmp + atomic rename: a crash mid-write must not leave a
        # truncated zip at the content-hash name (it would be cached
        # forever — same commit-point pattern as checkpoint/lineage)
        tmp = f"{zpath}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for full in members:
                z.write(full, os.path.relpath(full, root))
        os.replace(tmp, zpath)
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # already added under this name
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG pipeline slice over transcripts synthesized
    deterministically from sf0.001 documents — tag mentions (BiLSTM-CRF
    mapInPandas), extract co-occurrence triples, return the triples."""
    _ensure_shipped(spark)
    from ner_spark.pipeline import flagship

    return flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ner_spark.ops import all_queries

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from ner_spark.ops import all_oracles

    return all_oracles()
