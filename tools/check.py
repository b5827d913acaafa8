#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (strictest form).

Usage: python3 tools/check.py <sfDir> <outDir>

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each oracle
query in DuckDB against views named after the parquet tables in <sfDir>,
loads the Spark result parquet from <outDir>/<name>/, sorts columns by
name, and compares shape + values exactly. Reports per-query PASS/FAIL.
"""
import json
import math
import os
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cell_eq(x, y) for x, y in zip(la, lb))
    if str(a) == str(b):
        return True
    try:
        return float(a) == float(b)
    except (TypeError, ValueError):
        return False


def schema_problems(spark_schema: pa.Schema, oracle_schema: pa.Schema) -> tuple[list[str], list[str]]:
    """Arrow-level schema gate: (failures, warnings).

    The driver's hash is computed from the raw arrow values, and DECIMAL
    cells canonicalize differently between the pyarrow (Spark parquet)
    and DuckDB fetch paths — every hash-red query in rounds 2-3 carried a
    DECIMAL output column while values compared equal. So any DECIMAL on
    either side is a FAILURE here even when values match. Other type
    mismatches (int32 vs int64, timestamp unit) and nullability drift
    have never flipped the driver's hash → warnings only.
    """
    fails, warns = [], []
    s_fields = {f.name: f for f in spark_schema}
    o_fields = {f.name: f for f in oracle_schema}
    for name in sorted(set(s_fields) | set(o_fields)):
        sf, of = s_fields.get(name), o_fields.get(name)
        if sf is None or of is None:
            continue  # column-set mismatch is caught by compare()
        for side, f in (("spark", sf), ("oracle", of)):
            if pa.types.is_decimal(f.type):
                fails.append(
                    f"col {name}: {side} output is {f.type} — DECIMAL is "
                    f"hash-unsafe in the driver gate; cast to DOUBLE on both sides")
            # The driver sorts rows via pandas over all columns; numpy-array
            # cells raise "unhashable type" there (r5: llm_embed_quantize,
            # llm_quality_filter, llm_tokenize_ids). Nested outputs must be
            # stringified (concat_ws / array_to_string) on both sides.
            if (pa.types.is_list(f.type) or pa.types.is_large_list(f.type)
                    or pa.types.is_fixed_size_list(f.type)
                    or pa.types.is_struct(f.type) or pa.types.is_map(f.type)):
                fails.append(
                    f"col {name}: {side} output is {f.type} — nested types are "
                    f"sort-unsafe in the driver gate; stringify on both sides")
        if sf.type != of.type and not (
                pa.types.is_decimal(sf.type) or pa.types.is_decimal(of.type)):
            warns.append(f"col {name}: type spark={sf.type} oracle={of.type}")
        if sf.nullable != of.nullable:
            warns.append(
                f"col {name}: nullable spark={sf.nullable} oracle={of.nullable}")
    return fails, warns


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    s, o = norm(spark_df), norm(oracle_df)
    if list(s.columns) != list(o.columns):
        problems.append(f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}")
        return problems
    if len(s) != len(o):
        problems.append(f"row counts differ: spark={len(s)} oracle={len(o)}")
        return problems
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if not cell_eq(a, b)]
        if bad:
            i, a, b = bad[0]
            problems.append(
                f"col {c}: {len(bad)}/{len(sv)} cells differ; first at row {i}: "
                f"spark={a!r} ({type(a).__name__}) oracle={b!r} ({type(b).__name__})")
    return problems


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # Stress-scale knobs: DuckDB's default 80%-of-RAM memory limit can
    # paradoxically trigger enormous temp spills on the big pair-verify
    # hash joins (observed at the 500k-doc corpus: >70 GB of temp for a
    # join whose output is <2 M rows, while the same query under a 50 GB
    # limit completes without spilling). Bound it explicitly when asked.
    if "GRAFT_DUCKDB_MEM" in os.environ:
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
    if "GRAFT_DUCKDB_THREADS" in os.environ:
        con.execute(f"SET threads TO {int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    # An in-memory duckdb connection has NO temp directory, so an
    # over-limit operator hard-OOMs instead of spilling (bit the sf30
    # audio oracle: the materialized 192M-row sample census needs spill).
    if "GRAFT_DUCKDB_TEMP" in os.environ:
        os.makedirs(os.environ["GRAFT_DUCKDB_TEMP"], exist_ok=True)
        con.execute(f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TEMP']}'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if not p.exists():
            continue
        if p.is_dir():
            # Spark-written table (stress corpus): a directory of parts.
            p = f"{p}/*.parquet"
        if t == "events":
            # The stress corpus (tools/StressDataGen) writes ts as
            # micros-aligned NANOS BIGINT — the same shape Spark sees via
            # nanosAsLong — so rebuild the timestamp for the oracle side.
            # Driver testdata keeps its TIMESTAMP(NANOS) column untouched.
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
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    only = set(sys.argv[3:])
    for name in sorted(oracles):
        if only and name not in only:
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"SKIP {name}: no spark output (query failed in Verify?)")
            n_skip += 1
            continue
        try:
            oracle_arrow = con.execute(oracles[name]).arrow()
            # date_as_object=False matches fetchdf()'s datetime64 dates, so
            # cell compares behave as before the arrow-schema hardening.
            oracle_df = oracle_arrow.to_pandas(date_as_object=False)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            spark_files = sorted(res_dir.glob("*.parquet"))
            spark_schema = pq.read_schema(spark_files[0])
            spark_df = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, oracle_df)
        schema_fails, schema_warns = schema_problems(spark_schema, oracle_arrow.schema)
        problems.extend(schema_fails)
        for w in schema_warns:
            print(f"WARN {name}: {w}")
        if problems:
            print(f"FAIL {name} ({len(spark_df)} spark rows, {len(oracle_df)} oracle rows)")
            for p in problems[:6]:
                print(f"     {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_skip} skip "
          f"/ {len(oracles)} oracles")
    sys.exit(1 if (n_fail or n_skip) else 0)


if __name__ == "__main__":
    main()
