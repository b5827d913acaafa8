#!/usr/bin/env python3
"""Stress-scale oracle check for the heavy dedup gates.

The shipped oracle SQL for the dedup/component gates computes connected
components with a recursive transitive-closure CTE (`reach AS (... JOIN
reach ...)`), which materializes O(sum comp^2) rows. That is fine at the
driver's sf0.01 gate scale, but at stress scale (500k docs, where the
vocab-limited corpus produces giant near-dup components) DuckDB spills
>70 GB of temp and dies — the ORACLE formulation is the quadratic part,
not the engine (Spark's pointer-jumping label propagation is
O(E log diameter) and completes in seconds on the same corpus).

This checker keeps every cross-engine-sensitive step of the oracle SQL
(tokenize -> shingle -> md5 minhash -> bands -> candidate pairs ->
jaccard/cosine verify) EXACTLY as written, and swaps ONLY the
transitive-closure CTE for an exact union-find over the oracle-computed
edge list:

  1. run `WITH <oracle prefix> SELECT src, dst FROM edges` in DuckDB;
  2. union-find in Python (exact, min-id labels like the CTE's
     min(comp) — both compute THE connected components, a unique object);
  3. register the labels as a `comps` table and run the oracle's
     remaining SQL with `reach`/`comps` replaced by that table.

Gates WITHOUT a component fixpoint but WITH the candidate-pair ->
shingle-intersection join (llm_containment_dedup's `inter` CTE) get the
same chunked treatment: the join's own CTE is evaluated in slices of the
pair set, the slices union into a registered table, and the rest of the
oracle runs verbatim against it.

Usage: python3 tools/stress_cc_check.py SF_DIR OUT_DIR NAME [NAME...]
                [--chunks N]
Requires OUT_DIR/oracle_sql.json and OUT_DIR/<name>/ parquet written by
graft.Verify. Exit 0 iff every named gate matches exactly.
"""
import argparse
import json
import os
import re
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The heavy pair-verify join every chunked path slices: candidate pairs
# `p` joined back to the shingle census. DuckDB's % takes the dividend's
# sign, so the slice predicate must normalize — a negative id_a under a
# plain `id_a % C = i` (i >= 0) would silently vanish from every slice.
PAIR_JOIN = re.compile(r"FROM\s+(\w+)\s+p\s+JOIN\s+sh\s+x")


def slice_pred(chunks, i):
    return f"(id_a % {chunks} + {chunks}) % {chunks} = {i}"


def balanced_span(sql, start):
    """Index just past the ')' closing the '(' at/after `start`."""
    i = sql.index("(", start)
    depth = 0
    for j in range(i, len(sql)):
        if sql[j] == "(":
            depth += 1
        elif sql[j] == ")":
            depth -= 1
            if depth == 0:
                return j + 1
    raise ValueError("unbalanced parens")


def split_oracle(sql):
    """(prefix_cte_list, tail_after_comps) around the reach/comps CTEs,
    or None if the oracle has no component fixpoint."""
    m = re.search(r",\s*reach\s+AS\s*\(", sql)
    if not m:
        return None
    prefix = sql[: m.start()]  # ends with ...edges AS (...)
    c = re.search(r"comps\s+AS\s*\(", sql[m.end():])
    comps_end = balanced_span(sql, m.end() + c.start())
    # keep the text after comps' closing paren verbatim (it begins either
    # with ", <next-cte> AS (" or with the final SELECT)
    return prefix, sql[comps_end:]


class UF:
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
            # min-id root so labels match the CTE's min(comp) fixpoint
            if rb < ra:
                ra, rb = rb, ra
            self.p[rb] = ra


def sliced_pair_join(text, m, chunks, i):
    """`text` with its pair-verify join's pair side restricted to slice i
    (a partition of the pairs, so the union of slices is the full set)."""
    return (text[: m.start()] +
            f"FROM (SELECT * FROM {m.group(1)} WHERE "
            f"{slice_pred(chunks, i)}) p JOIN sh x" + text[m.end():])


def fetch_edges(con, prefix, chunks):
    """Edge list from the oracle's own CTEs.

    With chunks > 1, the candidate-pair -> shingle-intersection join (the
    one sum-of-pairs x shingles intermediate that can outgrow temp disk at
    stress scale) is evaluated in `chunks` slices of the pair set.
    Formulas are untouched; only the evaluation is sliced.
    """
    if chunks <= 1:
        return con.execute(prefix + " SELECT * FROM edges").fetch_df()
    m = PAIR_JOIN.search(prefix)
    if not m:  # no pair-verify join in this oracle — nothing to slice
        return con.execute(prefix + " SELECT * FROM edges").fetch_df()
    parts = []
    for i in range(chunks):
        sliced = sliced_pair_join(prefix, m, chunks, i)
        parts.append(con.execute(sliced + " SELECT * FROM edges").fetch_df())
    return pd.concat(parts, ignore_index=True)


def compare(con, name, full_sql, out_dir, n_extra=""):
    oracle = con.execute(full_sql).fetch_df()
    got = con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetch_df()
    # same compare discipline as tools/check.py: sort columns by name,
    # sort rows, positional equality
    oracle = oracle.reindex(sorted(oracle.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(oracle.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(oracle.columns)}")
        return False
    oracle = oracle.sort_values(list(oracle.columns)).reset_index(drop=True)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    if len(oracle) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs {len(oracle)}")
        return False
    for cname in oracle.columns:
        o, g = oracle[cname], got[cname]
        if o.dtype.kind == "f" or g.dtype.kind == "f":
            ok = ((o.isna() & g.isna()) | (o == g)).all()
        else:
            ok = o.astype(str).equals(g.astype(str))
        if not ok:
            bad = (o.astype(str) != g.astype(str)).idxmax()
            print(f"FAIL {name}: col {cname} differs at row {bad}: "
                  f"{g.iloc[bad]} vs {o.iloc[bad]}")
            return False
    print(f"PASS {name} ({len(got)} rows{n_extra})")
    return True


def check_components(con, name, sql, parts, out_dir, chunks):
    prefix, tail = parts
    edges = fetch_edges(con, prefix, chunks)
    a, b = edges.columns[0], edges.columns[1]
    uf = UF()
    for s, d in zip(edges[a].to_numpy(), edges[b].to_numpy()):
        uf.union(int(s), int(d))
    ids = list(uf.p.keys())
    # int64 explicitly: an EMPTY edge set defaults the columns to float64,
    # and a downstream coalesce(component, doc_id) then promotes to DOUBLE
    # — "238129.0" md5-hashes differently from "238129" (sf10 curation).
    comp = pd.DataFrame({"id": pd.array(ids, dtype="int64"),
                         "component": pd.array([uf.find(i) for i in ids],
                                               dtype="int64")})
    con.register("uf_comps", comp)
    full = (prefix + ", comps AS (SELECT id, component FROM uf_comps)" + tail)
    return compare(con, name, full, out_dir, f", {len(edges)} edges")


def check_pair_tail(con, name, sql, out_dir, chunks):
    """Non-component oracle whose weight is the pair-verify join
    (llm_containment_dedup's `inter`): evaluate THAT CTE in pair-set
    slices, register the union, and run the rest verbatim against it."""
    pj = PAIR_JOIN.search(sql)
    if not pj:
        raise ValueError("no reach CTE and no pair-verify join to slice")
    # Enclosing CTE of the pair join: the innermost `name AS (...)` whose
    # balanced body spans the join.
    cte = None
    for m in re.finditer(r",\s*(\w+)\s+AS\s+(?:MATERIALIZED\s+)?\(", sql):
        end = balanced_span(sql, m.end() - 1)
        if m.end() <= pj.start() and pj.end() <= end and \
                (cte is None or end - m.start() < cte[2] - cte[1]):
            cte = (m.group(1), m.start(), end, sql.index("(", m.end() - 1))
    if cte is None:
        raise ValueError("pair-verify join is not inside a CTE")
    cte_name, cte_start, cte_end, body_open = cte
    prefix = sql[:cte_start]  # WITH-list up to (excluding) the CTE
    body = sql[body_open + 1: cte_end - 1]
    tail = sql[cte_end:]
    bm = PAIR_JOIN.search(body)
    parts = []
    for i in range(max(chunks, 1)):
        sliced = sliced_pair_join(body, bm, max(chunks, 1), i)
        parts.append(con.execute(
            f"{prefix}, {cte_name} AS ({sliced}) SELECT * FROM {cte_name}"
        ).fetch_df())
    union = pd.concat(parts, ignore_index=True)
    con.register("uf_pairtail", union)
    full = f"{prefix}, {cte_name} AS (SELECT * FROM uf_pairtail)" + tail
    return compare(con, name, full, out_dir, f", {len(union)} {cte_name} rows")


def materialize_ctes(sql, names):
    """Rewrite `name AS (` to `name AS MATERIALIZED (` for each named CTE.

    DuckDB inlines CTEs by default, so a CTE referenced twice is
    COMPUTED twice — for llm_winnow_pairs the doubly-referenced `fl`
    (census + flag-back) re-runs the whole per-position md5 fingerprint
    grid, which is what priced the sf10 oracle out of reach (r10/r11).
    MATERIALIZED evaluates it once; the formulas are untouched.
    """
    for n in names:
        sql, k = re.subn(rf"\b{re.escape(n)}\s+AS\s*\(",
                         f"{n} AS MATERIALIZED (", sql, count=1)
        if k == 0:
            raise ValueError(f"--materialize: CTE {n!r} not found in oracle")
    return sql


def check(con, name, sql, out_dir, chunks=1, materialize=()):
    if materialize:
        sql = materialize_ctes(sql, materialize)
        if split_oracle(sql) is None and not PAIR_JOIN.search(sql):
            # No component fixpoint and no pair-verify join to slice:
            # the materialization itself is the treatment — run the
            # oracle verbatim (single evaluation of each heavy CTE).
            return compare(con, name, sql, out_dir)
    parts = split_oracle(sql)
    if parts is not None:
        return check_components(con, name, sql, parts, out_dir, chunks)
    return check_pair_tail(con, name, sql, out_dir, chunks)


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--chunks", type=int, default=1,
                    help="evaluate the pair-verify join in N pair-set slices")
    ap.add_argument("--materialize", default="",
                    help="comma-separated CTE names to rewrite AS MATERIALIZED "
                         "(single evaluation of multiply-referenced heavy CTEs)")
    opts = ap.parse_args()
    sqls = json.load(open(f"{opts.out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    # same stress knobs as tools/check.py: a bounded memory limit avoids
    # the default 80%-of-RAM limit's pathological temp spills on the big
    # pair-verify joins
    if "GRAFT_DUCKDB_MEM" in os.environ:
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
    if "GRAFT_DUCKDB_THREADS" in os.environ:
        con.execute(f"SET threads TO {int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    # In-memory connections have NO temp directory — over-limit operators
    # hard-OOM instead of spilling (same knob as tools/check.py, r14).
    if "GRAFT_DUCKDB_TEMP" in os.environ:
        os.makedirs(os.environ["GRAFT_DUCKDB_TEMP"], exist_ok=True)
        con.execute(
            f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TEMP']}'")
    table_pat = {}
    for t in TABLES:
        # driver testdata is single files; stress corpora are directories
        for pat in (f"{opts.sf_dir}/{t}.parquet",
                    f"{opts.sf_dir}/{t}.parquet/*.parquet"):
            try:
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
                table_pat[t] = pat
                break
            except duckdb.Error:
                continue
    # events.ts arrives as BIGINT nanos in the stress corpora; oracles
    # expect a timestamp — mirror tools/check.py's view rewrite, reusing
    # whichever read_parquet pattern the view loop established.
    if "events" in table_pat:
        try:
            ts_type = dict((r[0], r[1])
                           for r in con.execute("DESCRIBE events").fetchall())
            if ts_type.get("ts", "").startswith("BIGINT"):
                rest = ", ".join(c for c in ts_type if c != "ts")
                con.execute(
                    "CREATE OR REPLACE VIEW events AS SELECT "
                    "make_timestamp(ts // 1000) AS ts, " + rest +
                    f" FROM read_parquet('{table_pat['events']}')")
        except duckdb.Error as e:
            print(f"WARN events ts-normalization skipped ({e}); "
                  "timestamp-based gates may mismatch", file=sys.stderr)
    ok = True
    for n in opts.names:
        try:
            mat = tuple(x for x in opts.materialize.split(",") if x)
            ok &= check(con, n, sqls[n], opts.out_dir, opts.chunks, mat)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"FAIL {n}: {type(e).__name__}: {e}")
            ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
