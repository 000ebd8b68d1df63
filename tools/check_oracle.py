#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name> dir in verifyOutDir: read the Spark result parquet, run the
matching oracle SQL from oracle_sql.json in DuckDB (tables = parquet views
over sfDir), canonicalize both (columns sorted by name, rows sorted), and
diff values. Exit nonzero if any query mismatches.
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(list(v)) if hasattr(v, "__len__")
                              and not isinstance(v, str) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        got = canon(pd.read_parquet(path))
        if name not in oracles:
            print(f"  {name}: NO ORACLE (rows-only check) rows={len(got)}")
            continue
        try:
            exp = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"✗ {name}: oracle SQL failed: {e}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"✗ {name}: column mismatch spark={list(got.columns)} duck={list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"✗ {name}: row count spark={len(got)} duck={len(exp)}")
            failures += 1
            continue
        bad = None
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (g, e) in enumerate(zip(gv, ev)):
                if not values_equal(g, e):
                    bad = (c, i, g, e)
                    break
            if bad:
                break
        if bad:
            c, i, g, e = bad
            print(f"✗ {name}: value mismatch col={c} row={i} spark={g!r} duck={e!r}")
            failures += 1
        else:
            print(f"✓ {name}: {len(got)} rows match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
