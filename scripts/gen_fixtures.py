#!/usr/bin/env python3
"""Generate the committed CSV fixtures + config JSONs for the ingest
queries (deterministic; run once, outputs are committed).

Layout mirrors the reference's inbound key convention
(`inbound/{source_system}/{table}/{file}`) and v2 config addressing
(`config/{src}/{tbl}/{tbl}_config.json`).
"""
import gzip, json, os

ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures")
INB = os.path.join(ROOT, "inbound", "sap", "customers")

CITIES = ["Austin", "Berlin", "Cairo", "Denver", "Esbjerg", "Fukuoka",
          "Graz", "Hanoi"]

def row(i, rev=0):
    name = f'"Cust {i}, r{rev}"' if i % 7 == 0 else f"Cust {i} r{rev}"
    city = CITIES[(i * 3 + rev) % len(CITIES)]
    bal = "" if i % 11 == 0 else f"{(i * 137 + rev * 1000) % 90000 / 100:.2f}"
    return f"{i},{name},{city},{bal},junk{i}"

HDR = "id,name,city,bal,junk"

def write_csv(path, ids, rev=0, gz=False):
    body = "\n".join([HDR] + [row(i, rev) for i in ids]) + "\n"
    if gz:
        with gzip.open(path, "wt", newline="") as f:
            f.write(body)
    else:
        with open(path, "w", newline="") as f:
            f.write(body)

def write_cfg(table, cfg):
    d = os.path.join(ROOT, "config", "sap", table)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{table}_config.json"), "w") as f:
        json.dump(cfg, f, indent=2)

SCHEMA = {"id": "IntegerType", "name": "StringType", "city": "StringType",
          "bal": "DoubleType", "junk": "StringType"}

def main():
    os.makedirs(INB, exist_ok=True)
    write_csv(os.path.join(INB, "customers_20240628.csv"), range(1, 21))
    write_csv(os.path.join(INB, "customers_r2_20240628.csv"),
              range(11, 26), rev=2)
    write_csv(os.path.join(INB, "customers_20240629.csv"),
              list(range(1, 6)) + list(range(26, 31)), rev=3)
    write_csv(os.path.join(INB, "customers_20240630.csv.gz"),
              range(41, 56), rev=4, gz=True)

    write_cfg("customers_append", {
        "schema": SCHEMA,
        "curated_load_strategy": "append",
        "landing_load_strategy": "append",
        "primary_key": [],
        "sort_column": ["city", "id"],
        "select_columns": ["id", "name", "city", "bal"],
        "delimiter": ","})
    # v1-style: no schema (all-string read), v1 overwrite spelling,
    # bogus landing strategy exercises the warn-and-skip path.
    write_cfg("customers_overwrite", {
        "curated_load_strategy": "truncate",
        "landing_load_strategy": "bogus",
        "primary_key": [],
        "sort_column": [],
        "select_columns": None,
        "delimiter": ","})
    write_cfg("customers_upsert", {
        "schema": SCHEMA,
        "curated_load_strategy": "upsert",
        "landing_load_strategy": "overwrite",
        "primary_key": ["id"],
        "sort_column": ["city", "id"],
        "select_columns": ["id", "name", "city", "bal"],
        "delimiter": ","})
    print("fixtures written under", os.path.abspath(ROOT))

if __name__ == "__main__":
    main()
