#!/usr/bin/env python3
"""Replicates the driver's correctness gate locally: runs each oracle SQL
from <outDir>/oracle_sql.json in DuckDB over <sfDir>/*.parquet and compares
against the engine's parquet dumps in <outDir>/<name>/.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]

Dev tooling only (duckdb/pyarrow are driver-side); not part of the library.
"""
import duckdb, json, math, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.10g}"
    except Exception:
        pass
    return repr(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], out


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        try:
            got = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
            exp = con.execute(oracle[name])
            e_cols = [d[0] for d in exp.description]
            e_rows = exp.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: {ex}")
            continue
        gc, gr = canon(g_cols, g_rows)
        ec, er = canon(e_cols, e_rows)
        if gc != ec:
            print(f"FAIL  {name}: columns {gc} != {ec}")
        elif len(gr) != len(er):
            print(f"FAIL  {name}: rows {len(gr)} != {len(er)}")
        elif gr != er:
            # row-order-insensitive fallback diagnosis
            if sorted(gr) == sorted(er):
                print(f"WARN  {name}: same multiset, different row order")
            else:
                bad = next(i for i, (a, b) in enumerate(zip(gr, er)) if a != b)
                print(f"FAIL  {name}: first diff at row {bad}:\n  got {gr[bad]}\n  exp {er[bad]}")
            continue
        else:
            n_ok += 1
            print(f"ok    {name} ({len(gr)} rows)")
    print(f"{n_ok}/{len(oracle)} queries match")


if __name__ == "__main__":
    main()
