#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Usage: tools/check_local.py <verify_out_dir> <sf_dir>
Reads each <out>/<name>/ parquet (Spark result) and oracle_sql.json,
runs the oracle in DuckDB over <sf_dir>/*.parquet views, compares
schema-insensitively (columns sorted by name) and value-exactly.
Not part of the shipped library.
"""
import sys, os, json, glob
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), out

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        scols, srows = canon(spark_rel.fetchall(), spark_rel.columns)
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(srows)} rows")
            continue
        try:
            orel = con.sql(oracle[name])
            ocols, orows = canon(orel.fetchall(), orel.columns)
            # Python ints compare equal regardless of width, but the
            # driver's hasher goes through pandas where HUGEINT/DECIMAL
            # become float/object and hash-mismatch vs Spark's int64.
            wide = [f"{c}:{t}" for c, t in zip(orel.columns, orel.types)
                    if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL")]
            if wide:
                print(f"FAIL {name}: oracle columns need BIGINT/DOUBLE casts: {wide}")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
        elif srows != orows:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            for i, (a, b) in enumerate(zip(srows, orows)):
                if a != b:
                    print(f"    first diff row {i}:\n      spark  ={a}\n      oracle ={b}")
                    break
        else:
            n_pass += 1
            print(f"  ok {name} ({len(srows)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
