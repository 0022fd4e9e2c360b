#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling,
not part of the Spark library). Usage:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 scripts/localverify.py /tmp/verify_out /root/testdata/sf0.01

For each query: read our parquet dump, run the paired oracle SQL in
DuckDB against views named after the testdata tables, sort columns by
name, normalize rows, and diff values exactly.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(lambda v: (v is None or v != v, v)))
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if a != a and b != b:  # NaN
            return True
    except Exception:
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cell_eq(x, y) for x, y in zip(la, lb))
    return a == b


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            mine = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            oracle = norm(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(mine.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} "
                  f"vs oracle {list(oracle.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(oracle):
            print(f"FAIL {name}: rows {len(mine)} vs oracle {len(oracle)}")
            n_fail += 1
            continue
        bad = None
        for c in mine.columns:
            mv, ov = list(mine[c]), list(oracle[c])
            for i, (x, y) in enumerate(zip(mv, ov)):
                if not cell_eq(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            dt_m = {c: str(mine[c].dtype) for c in mine.columns}
            dt_o = {c: str(oracle[c].dtype) for c in oracle.columns}
            note = "" if dt_m == dt_o else f"  [dtype diff: {dt_m} vs {dt_o}]"
            print(f"PASS {name} ({len(mine)} rows){note}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
