#!/usr/bin/env python3
"""Streaming multiset-fingerprint compare for gates whose outputs are too
large for the pandas per-cell compare (g_fact_claims emits one row per
claim: 56 M rows at sf10, ~170 M at sf30 — a DuckDB EXCEPT ALL diff
spills past temp disk and pandas RSS explodes).

The r12 STRESS method, committed as a tool: BOTH sides are computed by
DuckDB (same engine, same VARCHAR formatting, same hash function) as

    count(*),  SUM(hash(concat_ws('|', <every column AS VARCHAR,
                                        NULL -> chr(1), sorted by name>)))

over (a) the Spark parquet dump and (b) the oracle SQL. The SUM is a
streaming aggregate — zero sort, zero spill at any scale — and the pair
(count, sum-of-row-hashes) is a multiset fingerprint: any differing row
multiset differs in count or collides 64-bit hashes, so a match is
exact up to hash collision (~2^-64 per differing row).

Usage: GRAFT_DUCKDB_MEM=48GB python3 tools/fingerprint_check.py \
           SF_DIR OUT_DIR NAME [NAME...]
Requires OUT_DIR/oracle_sql.json and OUT_DIR/<name>/ parquet written by
graft.Verify against the same SF_DIR. Exit 0 iff every gate matches.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def fingerprint(con, rel_sql):
    cols = [d[0] for d in con.execute(
        f"SELECT * FROM ({rel_sql}) LIMIT 0").description]
    keyed = ", ".join(
        f"coalesce(CAST(\"{c}\" AS VARCHAR), chr(1))" for c in sorted(cols))
    return con.execute(
        f"SELECT count(*), SUM(hash(concat_ws('|', {keyed}))) "
        f"FROM ({rel_sql})").fetchone()


def main():
    sf_dir, out_dir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    con = duckdb.connect()
    if os.environ.get("GRAFT_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                if os.path.isdir(p) else
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = True
    for name in names:
        got = fingerprint(
            con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        want = fingerprint(con, oracles[name])
        if got == want:
            print(f"PASS {name}: count={got[0]} fingerprint={got[1]}")
        else:
            print(f"FAIL {name}: spark={got} oracle={want}")
            ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
