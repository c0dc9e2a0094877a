#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Usage: tools/check_local.py <verify_out_dir> <sf_dir> [json_out]
Reads each <out>/<name>/ parquet (Spark result) and oracle_sql.json,
runs the oracle in DuckDB over <sf_dir>/*.parquet views, compares
schema-insensitively (columns sorted by name) and value-exactly.
With [json_out], also writes a driver-format CORRECTNESS json
(per-query rows/schema/hash match). DUCKDB_MEM_LIMIT (e.g. '100GB')
bounds the oracle engine; DUCKDB_SKIP (comma-separated query names)
records an explicit skip for oracles known not to complete on this
box (d10's recursive CTE at sf1 spills unboundedly under a memory
cap and OOMs a 128 GB box without one — measured round 7).
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
    json_out = sys.argv[3] if len(sys.argv) > 3 else None

    def connect():
        c = duckdb.connect()
        mem = os.environ.get("DUCKDB_MEM_LIMIT")
        if mem:
            c.execute(f"SET memory_limit='{mem}'")
        for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
            name = os.path.basename(p)[:-len(".parquet")]
            c.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
        return c

    # fresh connection per query: a disk-full/OOM abort leaves the
    # shared buffer manager wedged and every LATER oracle then fails
    # with spurious bad-allocation errors (measured at sf10: d11's
    # temp-disk fill poisoned 7 healthy sub-2s oracles after it)
    con = connect()
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    skip = set(filter(None, os.environ.get("DUCKDB_SKIP", "").split(",")))
    n_pass = n_fail = 0
    report = {}
    # Above this row count the exact compare runs INSIDE DuckDB as an
    # order-insensitive multiset digest — count(*) + sum(hash(cols in
    # sorted-name order)) — instead of materializing every row as a
    # Python tuple (the sf100 gate has 150M-row results; the Python
    # path needs ~50 GB there). Digest equality is multiset equality
    # up to 64-bit hash collisions; both sides run the IDENTICAL
    # expression, so type or value drift still fails loudly.
    hash_min = int(os.environ.get("DUCKDB_HASH_COMPARE_MIN", 5_000_000))

    def digest(con, sql_from, cols):
        expr = "hash(" + ", ".join(f'"{c}"' for c in sorted(cols)) + ")"
        n, h = con.sql(
            f"SELECT count(*), CAST(sum({expr}) AS VARCHAR) "
            f"FROM {sql_from}").fetchone()
        return n, h

    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_from = f"read_parquet('{qdir}/*.parquet')"
        spark_rel = con.sql(f"SELECT * FROM {spark_from}")
        spark_n = con.sql(f"SELECT count(*) FROM {spark_from}").fetchone()[0]
        if spark_n > hash_min and name in oracle and name not in skip:
            scols = sorted(spark_rel.columns)
            try:
                orel = con.sql(oracle[name])
                ocols = sorted(orel.columns)
                sn, sh = digest(con, spark_from, spark_rel.columns)
                on, oh = digest(con, f"({oracle[name]})", orel.columns)
            except Exception as e:
                print(f"FAIL {name}: oracle error: {e}", flush=True)
                n_fail += 1
                report[name] = {"rows_match": None, "schema_match": None,
                                "hash_match": None, "spark_rows": spark_n,
                                "oracle_rows": None,
                                "err": f"oracle error: {type(e).__name__}: {e}"}
                try:
                    con.close()
                except Exception:
                    pass
                import gc as _gc
                _gc.collect()
                con = connect()
                continue
            ok = scols == ocols and sn == on and sh == oh
            report[name] = {"rows_match": sn == on,
                            "schema_match": scols == ocols,
                            "hash_match": sh == oh and sn == on,
                            "spark_rows": sn, "oracle_rows": on,
                            "err": None,
                            "compare": "duckdb-multiset-digest"}
            if ok:
                n_pass += 1
                print(f"  ok {name} ({sn} rows, digest)", flush=True)
            else:
                n_fail += 1
                print(f"FAIL {name}: digest spark=({sn},{sh}) "
                      f"oracle=({on},{oh}) cols {scols} vs {ocols}",
                      flush=True)
            continue
        if name in skip:
            print(f"  [skipped] {name}: oracle skipped via DUCKDB_SKIP "
                  f"({spark_n} spark rows)", flush=True)
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": spark_n,
                            "oracle_rows": None,
                            "err": "oracle_skipped: known not to complete "
                                   "on this box at this SF"}
            continue
        if name not in oracle:
            print(f"  [rows-only] {name}: {spark_n} rows", flush=True)
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": spark_n,
                            "oracle_rows": None, "err": "no_oracle"}
            continue
        scols, srows = canon(spark_rel.fetchall(), spark_rel.columns)
        try:
            orel = con.sql(oracle[name])
            ocols, orows = canon(orel.fetchall(), orel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}", flush=True)
            n_fail += 1
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(srows),
                            "oracle_rows": None,
                            "err": f"oracle error: {type(e).__name__}: {e}"}
            # rebuild the connection so this failure can't poison the
            # rest; drop every reference first (relations pin the old
            # connection's buffer manager and its memory with it)
            orel = None
            try:
                con.close()
            except Exception:
                pass
            con = None
            import gc as _gc
            _gc.collect()
            con = connect()
            continue
        try:
            # Python ints compare equal regardless of width, but the
            # driver's hasher goes through pandas where HUGEINT/DECIMAL
            # become float/object and hash-mismatch vs Spark's int64.
            wide = [f"{c}:{t}" for c, t in zip(orel.columns, orel.types)
                    if str(t) in ("HUGEINT", "UHUGEINT") or str(t).startswith("DECIMAL")]
            if wide:
                print(f"FAIL {name}: oracle columns need BIGINT/DOUBLE casts: {wide}", flush=True)
                n_fail += 1
                report[name] = {"rows_match": None, "schema_match": False,
                                "hash_match": None, "spark_rows": len(srows),
                                "oracle_rows": len(orows),
                                "err": f"wide oracle types: {wide}"}
                continue
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}", flush=True)
            n_fail += 1
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(srows),
                            "oracle_rows": None,
                            "err": f"oracle error: {type(e).__name__}: {e}"}
            continue
        report[name] = {"rows_match": len(srows) == len(orows),
                        "schema_match": scols == ocols,
                        "hash_match": srows == orows,
                        "spark_rows": len(srows),
                        "oracle_rows": len(orows), "err": None}
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}", flush=True)
            n_fail += 1
        elif srows != orows:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}", flush=True)
            for i, (a, b) in enumerate(zip(srows, orows)):
                if a != b:
                    print(f"    first diff row {i}:\n      spark  ={a}\n      oracle ={b}")
                    break
        else:
            n_pass += 1
            print(f"  ok {name} ({len(srows)} rows)", flush=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
