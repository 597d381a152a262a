#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs graft.Verify's output (outDir/<name> parquet dirs + oracle_sql.json)
against DuckDB on the same sf tables and prints a per-query verdict.

Default mode is EXACT and driver-faithful (round-2 lesson: the driver's
hash gate is output-TYPE sensitive, not just value sensitive):

  - the Spark side is read with pandas/pyarrow, so parquet DECIMAL
    columns stay `decimal.Decimal` objects (rendering "50.10"),
  - the oracle side is DuckDB `fetch_df()`, which renders DECIMAL and
    HUGEINT aggregates as float64 (rendering "50.1"),
  - cells are compared by str() rendering AND the pandas dtypes of both
    frames are compared.

A query that is value-equal but type-divergent (exactly the 13
CORRECTNESS_r02 misses) therefore FAILs here, tagged TYPE-ONLY when the
tolerant comparison would have passed. `--tolerant` restores the old
1e-9/str() behavior for debugging value-level diffs only.

Usage: python3 tools/check_oracle.py [--tolerant] <sfDir> <outDir>
"""
import glob
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd


def norm(v):
    """Tolerant-mode normalization: Decimal→float, None/NaN/NaT→one
    sentinel, numpy scalars→python."""
    import decimal
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return None
    try:  # pandas NaT / numpy nan in object columns
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if hasattr(v, "item"):  # numpy scalar → python scalar
        v = v.item()
    return v


def rows_equal_tolerant(a, b):
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


def render(v):
    """Exact-mode cell rendering: str() of the raw fetched value, with
    only NULL and calendar dates unified. NULL: Spark parquet→pandas
    gives NaN/NaT/None depending on dtype; so does DuckDB. Dates:
    pyarrow yields datetime.date objects ("1992-01-03") where DuckDB's
    fetch_df yields datetime64 ("1992-01-03 00:00:00") — the driver gate
    demonstrably canonicalizes these (q_minmax_orders passed r2 with two
    DATE columns) while it does NOT canonicalize Decimal-vs-float64 or
    int64-vs-float64, so we normalize exactly this one case."""
    import datetime
    if v is None:
        return "<null>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return str(pd.Timestamp(v))
    return str(v)


def rows_equal_exact(a, b):
    return len(a) == len(b) and all(render(x) == render(y) for x, y in zip(a, b))


def read_spark(pq):
    """Driver-faithful read of Spark's parquet output: pandas/pyarrow,
    decimals kept as Decimal objects (dtype object)."""
    files = sorted(glob.glob(str(pq / "*.parquet")))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def main(argv):
    tolerant = "--tolerant" in argv
    argv = [a for a in argv if not a.startswith("--")]
    sf_dir, out_dir = argv
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
            got = read_spark(pq)
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
        rows_equal = rows_equal_tolerant if tolerant else rows_equal_exact
        bad = None
        for i in range(len(got)):
            if not rows_equal(list(got.iloc[i]), list(want.iloc[i])):
                bad = i
                break
        # Fragility audit: an object (Decimal) column against float64
        # currently renders equal only while no value carries a trailing
        # zero — the r2 q_distinct_priority trap. Warn, don't fail: the
        # driver gate is render-based (int32-vs-int64 and
        # datetime64[ns]-vs-[us] columns passed it in r2).
        fragile = [
            (c, str(got[c].dtype), str(want[c].dtype))
            for c in got.columns
            if "object" in (str(got[c].dtype), str(want[c].dtype))
            and "float64" in (str(got[c].dtype), str(want[c].dtype))]
        if bad is None:
            warn = f"  [WARN fragile dtypes: {fragile}]" if fragile and not tolerant else ""
            print(f"PASS {name} ({len(got)} rows){warn}")
            n_pass += 1
            continue
        n_fail += 1
        type_only = rows_equal_tolerant(list(got.iloc[bad]), list(want.iloc[bad]))
        tag = " [TYPE-ONLY: values match under tolerance]" if type_only else ""
        print(f"FAIL {name}: first mismatch at row {bad}{tag}:")
        print(f"  spark: {[render(v) for v in got.iloc[bad]]}")
        print(f"  duck : {[render(v) for v in want.iloc[bad]]}")
    print(f"== {n_pass} pass, {n_fail} fail ({'tolerant' if tolerant else 'exact'} mode) ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
