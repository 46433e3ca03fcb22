#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against
views over <sfDir>/*.parquet, and diffs: schema (column names), row count,
and values (sorted columns by name, sorted rows; exact compare plus a
float-tolerance report so we can see *how* close near-misses are).
"""
import json
import os
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        return v
    return v


def norm_type(t):
    """Canonical DuckDB type string for driver-parity comparison.

    The driver's row hash is TYPE-sensitive (integer width, decimal vs
    int, float vs double), so the local gate must compare the DuckDB
    column types of both relations, not just Python-converted values.
    The only normalization: timezone flavor of TIMESTAMP (Spark parquet
    stamps isAdjustedToUTC, DuckDB CASTs don't — same instant values).
    """
    s = str(t)
    return s.replace(" WITH TIME ZONE", "")


def rows_of(rel):
    cols = rel.columns
    types = [norm_type(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    out = [tuple(r[i] for i in order) for r in data]
    return ([cols[i] for i in order], [types[i] for i in order],
            sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)))


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == 0.0 and b == 0.0:  # driver hashes bits: 0.0 != -0.0
            return math.copysign(1.0, a) == math.copysign(1.0, b)
        return a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b


def close(a, b, tol=1e-9):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(close(x, y, tol) for x, y in zip(a, b))
    return eq(a, b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; ScaleProbe dirs are
        # Spark-written directories of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got_cols, got_types, got = rows_of(con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            want_cols, want_types, want = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns spark={got_cols} oracle={want_cols}")
            n_fail += 1
            continue
        if got_types != want_types:
            diffs = [f"{c}: spark={g} oracle={w}"
                     for c, g, w in zip(got_cols, got_types, want_types) if g != w]
            print(f"FAIL {name}: column TYPES differ (driver hash is width-sensitive): "
                  + "; ".join(diffs))
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
            for r in got[:3]:
                print("   spark:", r)
            for r in want[:3]:
                print("  oracle:", r)
            n_fail += 1
            continue
        bad = [(g, w) for g, w in zip(got, want) if not all(eq(a, b) for a, b in zip(g, w))]
        if bad:
            nearly = all(all(close(a, b) for a, b in zip(g, w)) for g, w in bad)
            tag = "CLOSE" if nearly else "FAIL"
            print(f"{tag} {name}: {len(bad)}/{len(got)} mismatched rows; first:")
            for g, w in bad[:3]:
                print("   spark:", g)
                print("  oracle:", w)
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
