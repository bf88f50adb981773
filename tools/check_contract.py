"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin side-by-side, compare row count, column
names, and (order-insensitively) values. Usage:

    python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def compare(name, spark_pdf, duck_pdf, float_exact=True):
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns differ: {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} vs {len(duck_pdf)}")
        return problems
    a, b = canon_pdf(spark_pdf), canon_pdf(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            avf = pd.to_numeric(a[c]).to_numpy(np.float64)
            bvf = pd.to_numeric(b[c]).to_numpy(np.float64)
            both_nan = np.isnan(avf) & np.isnan(bvf)
            eq = (avf == bvf) | both_nan
            if not eq.all():
                mx = np.nanmax(np.abs(avf - bvf))
                problems.append(f"float col {c}: {int((~eq).sum())} diffs, max abs {mx:.3e}")
        else:
            if not (pd.isna(av) == pd.isna(bv)).all() or not (
                    av[~pd.isna(av)] == bv[~pd.isna(bv)]).all():
                idx = int(np.flatnonzero(~(av == bv))[0]) if len(av) else 0
                problems.append(f"col {c}: first diff at row {idx}: {av[idx]!r} vs {bv[idx]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as E
    from lindorm_tsdb_contest_java_spark.plans.session import get_spark

    spark = get_spark("contract-check", parallelism=8, shuffle_partitions=8)
    con = duck_connection(sf_dir)
    qs, oracles = E.queries(), E.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spdf)} rows)")
            n_ok += 1
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            n_bad += 1
            continue
        problems = compare(name, spdf, dpdf)
        if problems:
            print(f"FAIL {name} ({len(spdf)} vs {len(dpdf)} rows): " + "; ".join(problems))
            n_bad += 1
        else:
            print(f"ok   {name}: {len(spdf)} rows match")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failing")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
