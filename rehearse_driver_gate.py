"""Driver-gate rehearsal: the pandas-path twin of tests/test_entry_oracle.py.

The driver's correctness gate converts BOTH result sets to pandas
(duckdb ``.df()``, Spark ``toPandas()``), sorts columns by name, sorts
rows via ``sort_values``, and hashes stringified values.  That path has
failure modes the local ``fetchall`` gate cannot see:

- a nullable BIGINT oracle column degrades to float64 ("11.0" vs "11")
- array/struct columns make ``sort_values`` raise (unhashable list) —
  the CORRECTNESS_r03 ``graphql_nation`` err
- float formatting drift between numpy scalar reprs

Run over the first-50 driver window (default) or ``--all``::

    python rehearse_driver_gate.py [--sf-dir /root/testdata/sf0.01] [--all]

Prints one line per entry (OK / MISMATCH / ERR / dtype warnings) and a
final summary; exits non-zero on any failure.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver: columns sorted by name, rows sorted by all
    columns (raises on unhashable cells, as the driver does)."""
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float) and np.isnan(v):
        return "<nan>"
    return str(v)


def frame_strings(df: pd.DataFrame) -> list[list[str]]:
    return [[cell(v) for v in row] for row in df.itertuples(index=False)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true",
                    help="rehearse every catalog entry, not just the window")
    ap.add_argument("--only", default=None,
                    help="comma-separated entry names")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    # get_spark, NOT a bare builder: the epoch-us entries depend on the
    # session timezone being pinned UTC (NTZ parquet ts), and the dtype
    # class this tool rehearses travels through the Arrow toPandas path
    # get_spark configures — a hand-rolled session would rehearse the
    # wrong conversion pipeline on a non-UTC box
    from l_space_spark.session import get_spark

    spark = get_spark(app_name="driver_gate_rehearsal", cores=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = list(qs)
    if not args.all:
        names = names[:50]
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    failures: list[str] = []
    warnings: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            spark_pd = sdf.toPandas()
            if name not in oracles:
                status = f"rows-only ({len(spark_pd)})"
                canon(spark_pd)  # still must be driver-sortable
                print(f"{name:36s} {status:22s} {time.time()-t0:6.1f}s")
                continue
            oracle_pd = con.execute(oracles[name]).df()
            a, b = canon(spark_pd), canon(oracle_pd)
            msg = []
            if list(a.columns) != list(b.columns):
                msg.append(f"cols {list(a.columns)} vs {list(b.columns)}")
            elif len(a) != len(b):
                msg.append(f"rows {len(a)} vs {len(b)}")
            else:
                sa, sb = frame_strings(a), frame_strings(b)
                if sa != sb:
                    diffs = [
                        (i, ra, rb)
                        for i, (ra, rb) in enumerate(zip(sa, sb))
                        if ra != rb
                    ]
                    msg.append(
                        f"{len(diffs)} value diffs, first: row {diffs[0][0]}"
                        f" spark={diffs[0][1]} oracle={diffs[0][2]}"
                    )
                for col in a.columns:
                    da, db = str(a[col].dtype), str(b[col].dtype)
                    if da != db:
                        warnings.append(
                            f"{name}: dtype drift {col}: spark={da}"
                            f" oracle={db}"
                        )
            if msg:
                failures.append(f"{name}: " + "; ".join(msg))
                print(f"{name:36s} MISMATCH {time.time()-t0:6.1f}s  {msg}")
            else:
                print(f"{name:36s} OK ({len(a)} rows) {time.time()-t0:6.1f}s")
        except Exception as e:  # noqa: BLE001 — driver records err the same way
            failures.append(f"{name}: ERR {type(e).__name__}: {e}")
            print(f"{name:36s} ERR {time.time()-t0:6.1f}s  "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:120]}")

    print("\n--- summary ---")
    for w in warnings:
        print("WARN", w)
    for f in failures:
        print("FAIL", f)
    print(f"{len(names) - len(failures)}/{len(names)} clean, "
          f"{len(warnings)} dtype warnings")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
