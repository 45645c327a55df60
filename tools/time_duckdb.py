#!/usr/bin/env python3
"""Dev-only timing harness for the cross-round DuckDB ratio (§5b):
times each dumped oracle SQL warm (best-of-2) in DuckDB against the
same parquet tables, prints per-query seconds + the total.

Usage: python3 tools/time_duckdb.py <sfDir> <verifyOutDir>
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
    total = round(sum(times.values()), 2)
    print(json.dumps({"total_sec": total, "n": len(times),
                      "queries": times}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
