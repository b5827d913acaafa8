#!/usr/bin/env python3
"""Stress-scale oracle check: evaluate the oracle's CTE chain STAGE BY
STAGE as disk-backed DuckDB tables instead of one monolithic query.

Why: a single-query oracle holds every pipeline-breaking intermediate
concurrently. At sf30 the audio-fingerprint oracle (192M-row decoded
sample census + banded pairs + a pairs x 128-sample verify join) exceeds
both the memory limit and what the in-memory connection can spill — it
hard-OOMs on one 8 GiB hash-table allocation even with a temp directory
(observed 2026-08-16). Evaluated one CTE at a time into a FILE-backed
database, each stage's result lands on disk, the buffer manager evicts
freely, and peak memory is a single stage's working set — the formulas
are byte-identical to the shipped oracle (this tool PARSES oracle_sql
.json; nothing is re-authored).

An optional --slice NAME:KEY:N evaluates CTE NAME in N key-slices
(`(KEY % N + N) % N = i` — sign-normalized like stress_cc_check), for
the pair-verify stages whose single evaluation is the memory hog. The
slice key must functionally partition the CTE's output (e.g. a GROUP BY
key), so the union of slices is exactly the full result.

RECURSIVE oracles are out of scope — use stress_cc_check.py (union-find
swap) for the component gates.

Usage:
  python3 tools/stress_staged_check.py SF_DIR OUT_DIR NAME
      [--db FILE] [--mem LIMIT] [--threads N] [--temp DIR]
      [--slice CTE:KEY:N ...]
"""
import argparse
import os
import re
import sys
import json
from pathlib import Path

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES, compare  # noqa: E402  (same compare as the gate)


def balanced_span(sql: str, start: int) -> int:
    """Index just past the ')' closing the '(' at/after `start`.
    Paren-counting skips single-quoted SQL string literals, so a ')'
    inside a regexp pattern cannot unbalance the walk."""
    i = sql.index("(", start)
    depth = 0
    in_str = False
    j = i
    while j < len(sql):
        c = sql[j]
        if in_str:
            if c == "'":
                # '' is an escaped quote inside a literal
                if j + 1 < len(sql) and sql[j + 1] == "'":
                    j += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return j + 1
        j += 1
    raise ValueError("unbalanced parens")


CTE_HEAD = re.compile(r"\s*(\w+)\s+AS\s+(?:MATERIALIZED\s+)?\(", re.IGNORECASE)


class UF:
    """Union-find with min-id roots — labels match the recursive CTE's
    min(comp) fixpoint (same structure as stress_cc_check.py)."""

    def __init__(self):
        self.p = {}

    def find(self, x):
        p = self.p
        r = x
        while p.setdefault(r, r) != r:
            r = p[r]
        while p[x] != r:
            p[x], x = r, p[x]
        return r

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            self.p[rb] = ra


def split_ctes(sql: str):
    """-> (ctes: list[(name, body)], final_select: str). RECURSIVE is
    accepted only for the edges→reach→comps component idiom, which the
    runner swaps for exact union-find (stage 'reach' is skipped, stage
    'comps' is computed in Python from the materialized edges table)."""
    m = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", sql, re.IGNORECASE)
    if not m:
        return [], sql
    pos = m.end()
    ctes = []
    while True:
        h = CTE_HEAD.match(sql, pos)
        if not h:
            raise ValueError(f"expected CTE at ...{sql[pos:pos+80]!r}")
        end = balanced_span(sql, h.end() - 1)
        ctes.append((h.group(1), sql[h.end():end - 1]))
        pos = end
        rest = re.match(r"\s*,", sql[pos:])
        if rest:
            pos += rest.end()
        else:
            return ctes, sql[pos:]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("name")
    ap.add_argument("--db", default="/tmp/staged_check.duckdb")
    ap.add_argument("--mem", default=None)
    ap.add_argument("--threads", type=int, default=None)
    ap.add_argument("--temp", default=None)
    ap.add_argument("--slice", action="append", default=[],
                    help="CTE:KEY:N — evaluate CTE in N slices of KEY")
    args = ap.parse_args()

    if os.path.exists(args.db):
        os.remove(args.db)
    con = duckdb.connect(args.db)
    if args.mem:
        con.execute(f"SET memory_limit='{args.mem}'")
    if args.threads:
        con.execute(f"SET threads TO {args.threads}")
    if args.temp:
        os.makedirs(args.temp, exist_ok=True)
        con.execute(f"SET temp_directory='{args.temp}'")
    con.execute("SET preserve_insertion_order=false")

    for t in TABLES:
        p = Path(args.sf_dir) / f"{t}.parquet"
        if not p.exists():
            continue
        if p.is_dir():
            p = f"{p}/*.parquet"
        if t == "events":
            (ts_type,) = con.execute(
                "SELECT column_type FROM (DESCRIBE SELECT ts FROM "
                f"read_parquet('{p}'))").fetchone()
            if ts_type == "BIGINT":
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * EXCLUDE (ts), "
                    "CAST(make_timestamp(ts // 1000) AS TIMESTAMP_NS) AS ts "
                    f"FROM read_parquet('{p}')")
                continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = json.loads((Path(args.out_dir) / "oracle_sql.json").read_text())
    sql = oracles[args.name]
    ctes, final = split_ctes(sql)
    slices = {}
    for s in args.slice:
        cte, key, n = s.split(":")
        slices[cte] = (key, int(n))

    for name, body in ctes:
        if name == "reach":
            continue  # swapped for union-find at the comps stage
        if name == "comps":
            import pandas as pd
            edges = con.execute("SELECT * FROM edges").fetch_df()
            a, b = edges.columns[0], edges.columns[1]
            uf = UF()
            for s, d in zip(edges[a].to_numpy(), edges[b].to_numpy()):
                uf.union(int(s), int(d))
            ids = list(uf.p.keys())
            # int64 explicitly: an EMPTY edge set would otherwise default
            # the columns to float64, and coalesce(component, doc_id)
            # downstream promotes to DOUBLE — "238129.0" md5-hashes
            # differently from "238129" (bit the sf10 curation check).
            comp = pd.DataFrame(
                {"id": pd.array(ids, dtype="int64"),
                 "component": pd.array([uf.find(i) for i in ids],
                                       dtype="int64")})
            con.register("uf_comps", comp)
            con.execute(
                "CREATE TABLE comps AS SELECT id, component FROM uf_comps")
            print(f"  stage comps: union-find over {len(edges)} edges "
                  f"-> {len(ids)} labeled nodes", flush=True)
            continue
        if name in slices:
            key, n = slices[name]
            con.execute(
                f"CREATE TABLE {name} AS SELECT * FROM ({body}) WHERE 1=0")
            for i in range(n):
                con.execute(
                    f"INSERT INTO {name} SELECT * FROM ({body}) "
                    f"WHERE ({key} % {n} + {n}) % {n} = {i}")
                print(f"  [{name}] slice {i + 1}/{n} done", flush=True)
        else:
            con.execute(f"CREATE TABLE {name} AS {body}")
        (cnt,) = con.execute(f"SELECT count(*) FROM {name}").fetchone()
        print(f"  stage {name}: {cnt} rows", flush=True)

    oracle_df = con.execute(final).fetch_df()
    spark_df = con.execute(
        f"SELECT * FROM read_parquet('{args.out_dir}/{args.name}/*.parquet')"
    ).fetchdf()
    problems = compare(args.name, spark_df, oracle_df)
    if problems:
        print(f"FAIL {args.name} ({len(spark_df)} spark rows, "
              f"{len(oracle_df)} oracle rows)")
        for p in problems[:6]:
            print(f"     {p}")
        sys.exit(1)
    print(f"PASS {args.name} ({len(spark_df)} rows, staged x{len(ctes)})")


if __name__ == "__main__":
    main()
