#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the paired DuckDB oracle from oracle_sql.json over the same
testdata tables, and compares rows / schema(column names) / values
(order-insensitive: rows sorted by all columns, columns sorted by name
— mirrors the driver's sort-columns-then-hash compare).
"""
import duckdb, json, os, sys, math

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

# Columns the engine reads schema-adaptively (Tables.normalizeEventTs /
# normalizeNaiveTs): if the driver ever regenerates one as a raw BIGINT
# epoch, mirror the engine's magnitude dispatch in the view so oracles
# keep type-checking instead of erroring on date-literal compares.
# DuckDB `//` floors, matching the engine's floor-division nanos branch.
NORM_COLS = {"events": ["ts"], "orders": ["o_orderdate"],
             "lineitem": ["l_shipdate"]}

def view_sql(con, t, sfdir):
    path = f"{sfdir}/{t}.parquet"
    # Spark-written tables are DIRECTORIES of part files (the x10
    # overfit-sweep corpora under target/scale); glob them. Driver
    # testdata tables are single files and keep the plain path.
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    reps = []
    for c in NORM_COLS.get(t, []):
        typ = {r[0]: r[1] for r in con.execute(
            f"SELECT column_name, column_type FROM "
            f"(DESCRIBE SELECT * FROM '{path}')").fetchall()}.get(c)
        if typ in ("BIGINT", "INTEGER", "HUGEINT", "UBIGINT"):
            reps.append(
                f"make_timestamp(CASE "
                f"WHEN abs({c}) >= 100000000000000000 THEN {c} // 1000 "
                f"WHEN abs({c}) >= 100000000000000 THEN {c} "
                f"WHEN abs({c}) >= 100000000000 THEN {c} * 1000 "
                f"ELSE {c} * 1000000 END) AS {c}")
    if reps:
        return (f"CREATE VIEW {t} AS SELECT * REPLACE "
                f"({', '.join(reps)}) FROM '{path}'")
    return f"CREATE VIEW {t} AS SELECT * FROM '{path}'"

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # a sweep corpus may omit tables no checked query reads
        # (target/scale/x10 has no events); skip instead of erroring
        if not os.path.exists(f"{sfdir}/{t}.parquet"):
            continue
        con.execute(view_sql(con, t, sfdir))
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # Verify writes _errors.json (+ an error-marker parquet per failed
    # query slot): surface the real exception up front instead of the
    # marker's schema mismatch.
    try:
        verify_errors = json.load(open(f"{outdir}/_errors.json"))
    except Exception:
        verify_errors = {}
    n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        if name in verify_errors:
            print(f"FAIL {name}: query threw during verify: "
                  f"{verify_errors[name]}")
            n_fail += 1
            continue
        sql = oracle[name]
        try:
            sdf = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL {name}: schema spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        srows = sorted(tuple(canon(v) for v in row)
                       for row in sdf[scols].itertuples(index=False))
        orows = sorted(tuple(canon(v) for v in row)
                       for row in odf[ocols].itertuples(index=False))
        if srows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows))
                       if a != b)
            print(f"FAIL {name}: values differ, first diff row {bad}:")
            print(f"  spark : {srows[bad]}")
            print(f"  oracle: {orows[bad]}")
            n_fail += 1
            continue
        print(f"ok   {name} ({len(sdf)} rows)")
    # A query with no oracle pairing (none today — all 122 carry one,
    # but the hole must stay closed) that threw during verify would
    # otherwise produce zero FAIL rows: surface those too.
    for name in sorted(set(verify_errors) - set(oracle)):
        if only and name not in only:
            continue
        print(f"FAIL {name}: query threw during verify "
              f"(no-oracle slot): {verify_errors[name]}")
        n_fail += 1
    print(f"{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
