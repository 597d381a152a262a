#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs graft.Verify's output (outDir/<name> parquet dirs + oracle_sql.json)
against DuckDB on the same sf tables, sorts columns by name, compares
row-by-row with a small float tolerance, and prints a per-query verdict.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def norm(v):
    """Map engine/pandas dtype artifacts to one comparable form:
    Decimal→float, None/NaN/NaT→one sentinel, numpy scalars→python."""
    import decimal
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return None
    try:  # pandas NaT / numpy nan in object columns
        import pandas as pd
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if hasattr(v, "item"):  # numpy scalar → python scalar
        v = v.item()
    return v


def rows_equal(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        x, y = norm(x), norm(y)
        if x is None and y is None:
            continue
        if (x is None) != (y is None):
            return False
        if isinstance(x, float) and isinstance(y, (float, int)):
            if not math.isclose(x, float(y), rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif isinstance(y, float) and isinstance(x, int):
            if not math.isclose(float(x), y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif str(x) != str(y):
            return False
    return True


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pq = Path(out_dir, name)
        if not pq.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{pq}/*.parquet')").fetch_df()
            want = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            if not rows_equal(list(got.iloc[i]), list(want.iloc[i])):
                bad = i
                break
        if bad is not None:
            print(f"FAIL {name}: first mismatch at row {bad}:")
            print(f"  spark: {list(got.iloc[bad])}")
            print(f"  duck : {list(want.iloc[bad])}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
