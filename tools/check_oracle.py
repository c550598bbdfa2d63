#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <name>/ parquet result written by graft.Verify, runs the
corresponding SQL from oracle_sql.json in DuckDB over the same parquet
tables, sorts columns by name and rows by value, and reports
row-count / schema-ish / value mismatches. This is tooling, not part of
the shipped library (driver-side python deps only).
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)

def type_class(duck_type):
    """Collapse a DuckDB column_type to the class the driver's hash
    compare distinguishes. DECIMAL vs DOUBLE is the q23/q67 bug class:
    fetchdf() silently coerces DECIMAL to float64, so the value compare
    alone cannot see it."""
    t = duck_type.upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    return t

def col_types(con, sql):
    return {r[0]: r[1] for r in
            con.execute(f"DESCRIBE {sql}").fetchall()}

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"[MISSING] {name}: no spark result")
            n_bad += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            n_bad += 1
            continue
        sdf = con.execute(
            "SELECT * FROM read_parquet(?)", [files]).fetchdf()
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"[SCHEMA] {name}: spark={scols} oracle={ocols}")
            n_bad += 1
            continue
        dt = [(c, str(sdf[c].dtype), str(odf[c].dtype)) for c in scols
              if str(sdf[c].dtype) != str(odf[c].dtype)]
        # DuckDB-level type classes: catches DECIMAL-vs-DOUBLE that the
        # pandas conversion hides (round-1 q23, round-3 q67).
        stypes = col_types(con, "SELECT * FROM read_parquet("
                           + repr(files) + ")")
        otypes = col_types(con, sql)
        dt += [(c, stypes[c], otypes[c]) for c in scols
               if type_class(stypes[c]) != type_class(otypes[c])]
        if dt:
            print(f"[DTYPE] {name}: {dt}")
            # dtype divergence is a warning-level finding (the driver may
            # or may not compare types) — still count it as bad so it
            # gets fixed.
            n_bad += 1
            continue
        srows = sorted([tuple(canon(v) for v in r)
                        for r in sdf[scols].itertuples(index=False)])
        orows = sorted([tuple(canon(v) for v in r)
                        for r in odf[ocols].itertuples(index=False)])
        if len(srows) != len(orows):
            print(f"[ROWS] {name}: spark={len(srows)} oracle={len(orows)}")
            n_bad += 1
        elif srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b]
            print(f"[VALUES] {name}: {len(diff)}/{len(srows)} rows differ; "
                  f"first: spark={diff[0][0]} oracle={diff[0][1]}")
            n_bad += 1
        else:
            print(f"[OK] {name}: {len(srows)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
