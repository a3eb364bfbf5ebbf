#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the parquet tables in
sfDir, loads the Spark result parquet from verifyOutDir/<name>, sorts
columns by name and rows by all columns, rounds floats, and compares.
Dev-only tooling — NOT part of the shipped library.
"""
import json
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def check_scalar_cells(df: pd.DataFrame, name: str, side: str):
    """Driver-parity guard: the driver's canon crashes on non-scalar
    cells (ndarray/list/dict) — r07 branch_switch precedent. Fail the
    query here instead of silently stringifying."""
    for c in df.columns:
        if df[c].dtype == object:
            bad = df[c].dropna().map(
                lambda v: isinstance(v, (list, dict, set, tuple, np.ndarray)))
            if bad.any():
                raise ValueError(
                    f"{name} [{side}] column '{c}' has non-scalar cells "
                    f"(e.g. {type(df[c].dropna().iloc[0]).__name__}) — "
                    "arrays/maps/structs must be stringified before the dump")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        if df[c].dtype in (np.float32, np.float64):
            df[c] = df[c].round(6)
        if str(df[c].dtype) in ("int32", "uint32", "int16", "int8"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception as e:
            print(f"  [warn] view {t}: {e}")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    import glob
    import os
    for name, sql in sorted(oracles.items()):
        # Pair with Verify's SPARK_GRAFT_VERIFY_ONLY filter: a missing
        # Spark dump means the operator wasn't run this pass — skip.
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            raw_expected = con.execute(sql).df()
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            raw_actual = pd.concat([pd.read_parquet(p) for p in files])
            check_scalar_cells(raw_expected, name, "oracle")
            check_scalar_cells(raw_actual, name, "spark")
            expected = canon(raw_expected)
            actual = canon(raw_actual)
            if list(expected.columns) != list(actual.columns):
                print(f"FAIL {name}: columns {list(expected.columns)} vs {list(actual.columns)}")
                n_fail += 1
                continue
            if len(expected) != len(actual):
                print(f"FAIL {name}: rows {len(expected)} vs {len(actual)}")
                n_fail += 1
                continue
            # Driver parity: its hash is dtype-sensitive (r07 — DuckDB
            # HUGEINT sums surface as float64 vs Spark int64 and fail the
            # hash even when values match bitwise). Equal dtypes first.
            dt_diffs = [
                f"{c}: oracle {expected[c].dtype} vs spark {actual[c].dtype}"
                for c in expected.columns
                if str(expected[c].dtype) != str(actual[c].dtype)]
            if dt_diffs:
                print(f"FAIL {name}: dtype mismatch {dt_diffs}")
                n_fail += 1
                continue
            diffs = []
            for c in expected.columns:
                e, a = expected[c], actual[c]
                if e.dtype in (np.float64, np.float32):
                    ok = np.allclose(e.fillna(0), a.fillna(0), rtol=0, atol=1e-9)
                else:
                    ok = e.equals(a)
                if not ok:
                    diffs.append(c)
            if diffs:
                print(f"FAIL {name}: value mismatch in {diffs}")
                for c in diffs[:2]:
                    mask = ~(expected[c].astype(str) == actual[c].astype(str))
                    print(expected[mask].head(3))
                    print(actual[mask].head(3))
                n_fail += 1
            else:
                print(f"PASS {name} ({len(expected)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
