"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark AND its DuckDB oracle, compare row
count + column names + values (exact; floats bit-compared then at
1e-9 to localize near-misses).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from o2g_spark.session import get_spark  # noqa: E402
from o2g_spark.sources.tables import TPCH_TABLES  # noqa: E402


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object and len(pdf) and isinstance(pdf[c].iloc[0], (list, np.ndarray)):
            pdf[c] = pdf[c].map(lambda v: tuple(v))
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def compare(name: str, s: pd.DataFrame, d: pd.DataFrame) -> list[str]:
    errs = []
    if len(s) != len(d):
        errs.append(f"rows spark={len(s)} duck={len(d)}")
    if sorted(s.columns) != sorted(d.columns):
        errs.append(f"cols spark={sorted(s.columns)} duck={sorted(d.columns)}")
        return errs
    if errs:
        return errs
    s, d = canon(s), canon(d)
    for c in s.columns:
        a, b = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(s[c].dtype, np.floating):
            if not np.array_equal(a, b, equal_nan=True):
                close = np.isclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True)
                n_exact = int((a == b).sum())
                errs.append(
                    f"col {c}: exact {n_exact}/{len(a)}, within-1e-9 {int(close.sum())}/{len(a)}"
                    + (f", first diff: {a[~close][:3]} vs {b[~close][:3]}" if (~close).any() else " (ulp-level only)")
                )
        else:
            eq = pd.Series(a).astype(str).eq(pd.Series(b).astype(str))
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                errs.append(f"col {c}: {int(eq.sum())}/{len(a)} equal, first diff @{i}: {a[i]!r} vs {b[i]!r}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # data-dependent oracles (ann_ivf centroid literals) train on the
    # SAME sf as the queries under check
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = E.queries()
    oracles = E.oracle_sql()
    n_ok = n_bad = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s = sdf.toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {str(ex).splitlines()[0][:160]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(s)} rows (rows-only check)")
            n_rows_only += 1
            continue
        try:
            d = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {str(ex).splitlines()[0][:160]}")
            n_bad += 1
            continue
        errs = compare(name, s, d)
        if errs:
            n_bad += 1
            print(f"FAIL  {name}: " + "; ".join(errs))
        else:
            n_ok += 1
            print(f"ok    {name}: {len(s)} rows")
    print(f"\n{n_ok} ok, {n_bad} failed, {n_rows_only} rows-only")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
