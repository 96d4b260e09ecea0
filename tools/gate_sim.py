#!/usr/bin/env python
"""Simulate the driver's correctness gate end-to-end: import
__spark_entry__ from OUTSIDE the repo (exactly like the driver), run
every catalog query at the gate scale factor, compare each
oracle-backed query against DuckDB, report rows-only carriers' counts,
and smoke-check entry().

Usage:  python tools/gate_sim.py [sf_dir] [cores]
        (defaults: /root/testdata/sf0.01, 8)

Exit code 0 iff every oracle matches and nothing errors — run this
before any commit that touches the catalog surface.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    import duckdb

    from ner_spark.session import get_spark
    from ner_spark.testing import compare_query

    qs, osql = m.queries(), m.oracle_sql()
    spark = get_spark("gate-sim", cores=cores)
    con = duckdb.connect()
    from ner_spark.io.read import TABLES

    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    fails = 0
    for name in qs:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            if name in osql:
                ok, msg = compare_query(df, con.sql(osql[name]))
                if not ok:
                    fails += 1
                status = "OK" if ok else f"FAIL {msg}"
            else:
                status = f"rows={df.count()}"
        except Exception as e:  # noqa: BLE001 - gate surfaces any error
            fails += 1
            status = f"ERROR {e!r}"
        print(f"{name}: {status} ({time.time() - t0:.1f}s)", flush=True)

    n = m.entry(spark).count()
    print(f"entry rows: {n}")
    print(f"FAILS: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
