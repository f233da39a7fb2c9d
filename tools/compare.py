#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
testdata and compare (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/compare.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        # Bitwise-strict: the driver hashes stringified values, and
        # str(-0.0) != str(0.0), so -0.0 == 0.0 (True under ==) must FAIL
        # here. Round-8 lesson: DuckDB round() of a tiny negative emits
        # -0.0 while Spark's HALF_UP round emits +0.0; this mirror called
        # it green and the driver's hash called it red. copysign
        # distinguishes the zero signs; == handles everything else.
        return af == bf and math.copysign(1.0, af) == math.copysign(1.0, bf)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            mine = canon(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            ref = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(ref.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}")
            n_fail += 1
            continue
        # The driver hashes stringified values, so an int64 218 vs a float64
        # 218.0 (e.g. DuckDB HUGEINT from an uncast sum(int)) is a driver
        # failure even when float-tolerant compare passes. Fail on dtype-kind
        # divergence (int vs float vs bool vs object) so the local mirror
        # can't pass what the driver's hash would fail.
        kind_bad = [
            (c, str(mine[c].dtype), str(ref[c].dtype))
            for c in mine.columns
            if mine[c].dtype.kind != ref[c].dtype.kind
            # int-width differences (int32 vs int64) stringify identically
            and {mine[c].dtype.kind, ref[c].dtype.kind} != {"i", "u"}
        ]
        if kind_bad:
            c, mk, rk = kind_bad[0]
            print(f"FAIL {name}: dtype mismatch col {c}: mine={mk} oracle={rk}"
                  f" (driver hash stringifies; add CAST in oracle SQL)")
            n_fail += 1
            continue
        bad = None
        mv, rv = mine.values.tolist(), ref.values.tolist()
        for i, (r1, r2) in enumerate(zip(mv, rv)):
            for c, (x, y) in enumerate(zip(r1, r2)):
                # pandas NaN for SQL NULL in float cols
                xn = x if not (isinstance(x, float) and math.isnan(x)) else None
                yn = y if not (isinstance(y, float) and math.isnan(y)) else None
                if xn is None and yn is None:
                    continue
                if not cells_equal(x, y):
                    bad = (i, mine.columns[c], x, y)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: mine={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
