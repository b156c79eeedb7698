#!/usr/bin/env python3
"""Cross-engine bench baseline: time each headline query's DuckDB oracle
over the same parquet tables the Spark bench reads.

Usage: python3 tools/oracle_bench.py <sfDir> <sqlTsv> <outTsv>

<sqlTsv>: one line per query, "<name>\t<base64-encoded oracle SQL>".
<outTsv>: one line per query that ran, "<name>\t<min seconds over 2 passes>".

Two passes with min-per-query mirror the Spark side's noise rejection.
Queries whose oracle errors are simply omitted from the output (the Scala
side treats absence as "no baseline for this query").
"""
import base64
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, in_tsv, out_tsv):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    rows = []
    for line in open(in_tsv):
        name, b64 = line.rstrip("\n").split("\t", 1)
        sql = base64.b64decode(b64).decode("utf-8")
        try:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rows.append(f"{name}\t{best:.3f}")
        except Exception as e:
            print(f"[oracle_bench] {name} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
    with open(out_tsv, "w") as f:
        f.write("\n".join(rows) + ("\n" if rows else ""))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
