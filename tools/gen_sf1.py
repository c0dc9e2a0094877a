#!/usr/bin/env python3
"""Dev-only sf1 testdata generator: scales the driver's sf0.1 tables
10x, deterministically, into <repo>/testdata_sf1 (gitignored), so the
sf1 crossover benchmark (SURVEY §6) is measured on files BOTH engines
read. /root/testdata is read-only and the driver's generator is not
available, so this derives sf1 from sf0.1 by replication with
per-replica key shifting:

- region/nation copy unchanged (genuinely fixed-cardinality dims).
- fact/dim tables replicate 10x; every join key shifts by
  replica * OFFSET, consistently across tables, so FK containment
  (lineitem->orders->customer, events.user_id ⊂ customer.c_custkey)
  is preserved and join fan-outs match sf0.1's per-key shape.
- documents: replica i > 0 suffixes every token with "_i" — a fresh
  vocabulary per replica, so NO cross-replica exact or near dups are
  introduced and the dedup workload scales linearly (naive replication
  would hand d01/d07 a 90% duplicate corpus and a different problem).
  n_chars is recomputed (it equals length(text) in the source).
- embeddings: vectors copy per replica with shifted vec_id —
  duplicated content, a realistic corpus shape for ANN/near-dup.

Default DuckDB row groups (~122k rows) mean the sf1 files are
multi-row-group, so BOTH engines can parallelize the scan — unlike
the single-row-group sf0.1 files (see SURVEY §6).

Usage: tools/gen_sf1.py [src_dir] [out_dir] [factor] [only_tables]
`only_tables` (comma-separated) restricts generation — round 13 used
it for an sf100 documents-only decade; round 14 widened sf100 to
every table EXCEPT lineitem (region,nation,customer,supplier,part,
orders,events,embeddings — ~6 GB total), so the relational/events/
similarity families gate a further 10x while the one 13 GB table
nobody's sf100 oracle needs stays ungenerated (FK checks are skipped
unless their tables are generated).
Not part of the shipped library.
"""
import sys, os, glob
import duckdb

def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "testdata_sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for p in glob.glob(os.path.join(src, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    C_OFF, S_OFF, P_OFF = 1_000_000, 100_000, 1_000_000
    O_OFF, E_OFF, D_OFF, V_OFF = 10_000_000, 10_000_000, 1_000_000, 1_000_000
    rep = f"CROSS JOIN range({factor}) r(i)"

    tables = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""SELECT c_custkey + i*{C_OFF} AS c_custkey, c_name,
                         c_nationkey, c_acctbal, c_mktsegment
                        FROM customer {rep}""",
        "supplier": f"""SELECT s_suppkey + i*{S_OFF} AS s_suppkey, s_name,
                         s_nationkey, s_acctbal
                        FROM supplier {rep}""",
        "part": f"""SELECT p_partkey + i*{P_OFF} AS p_partkey, p_name,
                     p_brand, p_type, p_size, p_retailprice
                    FROM part {rep}""",
        "orders": f"""SELECT o_orderkey + i*{O_OFF} AS o_orderkey,
                       o_custkey + i*{C_OFF} AS o_custkey, o_orderstatus,
                       o_totalprice, o_orderdate, o_orderpriority
                      FROM orders {rep}""",
        "lineitem": f"""SELECT l_orderkey + i*{O_OFF} AS l_orderkey,
                         l_partkey + i*{P_OFF} AS l_partkey,
                         l_suppkey + i*{S_OFF} AS l_suppkey,
                         l_linenumber, l_quantity, l_extendedprice,
                         l_discount, l_tax, l_returnflag, l_linestatus,
                         l_shipdate
                        FROM lineitem {rep}""",
        "events": f"""SELECT event_id + i*{E_OFF} AS event_id, ts,
                       user_id + i*{C_OFF} AS user_id, event_type, value,
                       props
                      FROM events {rep}""",
        "documents": f"""SELECT doc_id + i*{D_OFF} AS doc_id,
                          CASE WHEN i = 0 THEN text
                               ELSE array_to_string(list_transform(
                                 string_split(text, ' '),
                                 w -> w || '_' || i), ' ') END AS text,
                          lang, source,
                          CAST(length(CASE WHEN i = 0 THEN text
                               ELSE array_to_string(list_transform(
                                 string_split(text, ' '),
                                 w -> w || '_' || i), ' ') END) AS BIGINT)
                            AS n_chars
                         FROM documents {rep}""",
        "embeddings": f"""SELECT vec_id + i*{V_OFF} AS vec_id, embedding,
                           label
                          FROM embeddings {rep}""",
    }
    for name, q in tables.items():
        if only is not None and name not in only:
            continue
        dst = os.path.join(out, f"{name}.parquet")
        # Spark parallelizes a parquet scan at ROW-GROUP granularity
        # (DuckDB splits within a group, so it is indifferent). With the
        # default ~122k-row groups the small tables (documents 50k,
        # embeddings 20k) come out as ONE group → every Spark scan of
        # them is ONE task, serializing the CPU-heavy text/vector ops —
        # exactly the sf0.1 pathology this generator exists to remove.
        # Size groups for >= ~48 per table (floor 2048 rows so tiny dims
        # stay one group — DuckDB rounds ROW_GROUP_SIZE up to vector-size
        # (2048) multiples, so any floor below 2048 silently behaves as
        # 2048 anyway), mirroring real multi-block data layout.
        rows = con.sql(f"SELECT count(*) FROM ({q})").fetchone()[0]
        rg = max(2048, rows // 48)
        con.execute(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        rgs = con.sql(
            "SELECT count(DISTINCT row_group_id) FROM parquet_metadata(?)",
            params=[dst]).fetchone()[0]
        print(f"[gen_sf1] {name:11s} {n:>9,} rows  {rgs:>3} row groups",
              file=sys.stderr)

    # FK containment sanity — a violated key silently turns joins into
    # row-dropping filters and the crossover numbers into fiction
    checks = [
        ("lineitem->orders", "SELECT count(*) FROM read_parquet(?) li "
         "WHERE NOT EXISTS (SELECT 1 FROM read_parquet(?) o "
         "WHERE o.o_orderkey = li.l_orderkey)",
         ["lineitem", "orders"]),
        ("orders->customer", "SELECT count(*) FROM read_parquet(?) o "
         "WHERE NOT EXISTS (SELECT 1 FROM read_parquet(?) c "
         "WHERE c.c_custkey = o.o_custkey)",
         ["orders", "customer"]),
        ("events->customer", "SELECT count(*) FROM read_parquet(?) e "
         "WHERE NOT EXISTS (SELECT 1 FROM read_parquet(?) c "
         "WHERE c.c_custkey = e.user_id)",
         ["events", "customer"]),
    ]
    bad = 0
    if only is not None:
        checks = [c for c in checks if all(n in only for n in c[2])]
    for label, sql, names in checks:
        paths = [os.path.join(out, f"{n}.parquet") for n in names]
        orphans = con.execute(sql, paths).fetchone()[0]
        print(f"[gen_sf1] FK {label}: {orphans} orphans", file=sys.stderr)
        bad += orphans
    if bad:
        sys.exit(1)

if __name__ == "__main__":
    main()
