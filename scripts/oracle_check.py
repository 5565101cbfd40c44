#!/usr/bin/env python3
"""Run a DuckDB oracle SQL snippet against the synthetic tables, the same
way the driver's correctness harness does (views named after the parquet
files). Usage: oracle_check.py <sfdir> <sqlfile|->
"""
import sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, sqlsrc = sys.argv[1], sys.argv[2]
    sql = sys.stdin.read() if sqlsrc == "-" else open(sqlsrc).read()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    res = con.execute(sql)
    rows = res.fetchall()
    print("cols:", [d[0] for d in res.description])
    print("rows:", len(rows))
    for r in rows[:10]:
        print(r)

if __name__ == "__main__":
    main()
