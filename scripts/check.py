#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:
    python3 scripts/check.py <sfDir> <outDir>

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran, so
<outDir> holds one parquet dir per query plus oracle_sql.json.  Runs each
oracle SQL in DuckDB over the raw testdata tables, loads the Spark result
parquet, normalizes (column order by name, row order by all columns) and
compares exactly.  Exit code = number of failing queries.
"""
import glob
import json
import math
import struct
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cell_eq(a, b):
    if a is b:
        return True
    a_f, b_f = isinstance(a, float), isinstance(b, float)
    if a_f != b_f:
        # int-vs-float (or str-vs-float) is a real mismatch: the driver's
        # hash is type-sensitive, so 12345 != 12345.0 here too.
        return False
    if a_f and b_f:
        if math.isnan(a) and math.isnan(b):
            return True
        # IEEE-754 bit-pattern equality, same as hashing the raw doubles.
        return struct.pack("<d", a) == struct.pack("<d", b)
    try:
        if a != a and b != b:  # NaN-ish (pandas NaT etc.)
            return True
    except Exception:
        pass
    if type(a) is not type(b) and isinstance(a, (int, bool)) != isinstance(b, (int, bool)):
        return False
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fails += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        exp, got = norm(exp), norm(got)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            fails += 1
            continue
        if [str(t) for t in exp.dtypes] != [str(t) for t in got.dtypes]:
            # Dtype mismatch is a FAIL, matching the driver's hash which is
            # type-sensitive (e.g. DuckDB HUGEINT vs Spark int64 — q170 r5).
            print(f"FAIL {name}: dtypes exp={list(map(str, exp.dtypes))} got={list(map(str, got.dtypes))}")
            fails += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            fails += 1
            continue
        bad = None
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if not cell_eq(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: cell mismatch col={c} row={i} exp={a!r} got={b!r}")
            fails += 1
        else:
            print(f"OK   {name}: {len(exp)} rows")
    print(f"== {len(oracle) - fails}/{len(oracle)} passed ==")
    sys.exit(min(fails, 125))


if __name__ == "__main__":
    main()
