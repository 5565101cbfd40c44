#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify output
(<outdir>/<query>/ parquet + oracle_sql.json), run each oracle in DuckDB
over the sf tables, and hash-compare (columns sorted by name, rows sorted).
Usage: local_correctness.py <sfdir> <outdir> [query ...]
"""
import json
import sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.execute(rel_sql).fetch_df()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = canon(con, f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            con.execute(f"CREATE OR REPLACE VIEW _oracle AS {sql}")
            oracle_df = canon(con, "SELECT * FROM _oracle")
            rows = len(spark_df) == len(oracle_df)
            cols = list(spark_df.columns) == list(oracle_df.columns)
            if rows and cols:
                import numpy as np
                # NaN-aware like check.py: NaN == NaN for the gate
                neq = (((spark_df != oracle_df) &
                        ~(spark_df.isna() & oracle_df.isna())).any(axis=1)
                       if len(spark_df) else np.array([], dtype=bool))
                if neq.any():
                    print(f"FAIL {name}: {int(neq.sum())} mismatched rows")
                    for i in np.where(neq)[0][:3]:
                        print("  spark:", spark_df.iloc[i].to_dict(),
                              " oracle:", oracle_df.iloc[i].to_dict())
                    bad += 1
                else:
                    print(f"ok   {name}: rows={len(spark_df)}")
                    ok += 1
            else:
                print(f"FAIL {name}: rows {len(spark_df)} vs {len(oracle_df)}, cols {list(spark_df.columns)} vs {list(oracle_df.columns)}")
                bad += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
            bad += 1
    print(f"== {ok} ok, {bad} bad")


if __name__ == "__main__":
    main()
