#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/check_oracle.py <sfDir> <outDir>

For each query dir under outDir: read the Spark parquet result, run the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables,
sort columns by name + rows by value, and diff. Exit nonzero on any
mismatch. Stricter than the driver (exact equality incl. floats), so
passing here should imply passing there.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out, [str(types[i]) for i in order]


# Declared-type strictness: the driver's value hash renders DuckDB types
# (HUGEINT vs BIGINT, DECIMAL vs DOUBLE) differently even when Python
# fetchall() normalizes them to equal ints/floats — round 6's
# layout_compaction_plan passed this pre-flight on values and failed the
# driver on exactly that. Compare the DECLARED oracle column types
# against the Spark parquet result's types and reject any drift the
# equivalence table below doesn't explicitly allow.
TYPE_EQUIV = {
    # Spark parquet timestamps read back as TIMESTAMP WITH TIME ZONE
    # under DuckDB defaults while oracle expressions produce TIMESTAMP;
    # both render values identically for the driver's UTC session.
    ("TIMESTAMP WITH TIME ZONE", "TIMESTAMP"),
    ("TIMESTAMP", "TIMESTAMP WITH TIME ZONE"),
}


def types_ok(spark_t, duck_t):
    return spark_t == duck_t or (spark_t, duck_t) in TYPE_EQUIV


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    failures, passed, skipped = [], 0, []
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # An oracle whose query never dumped means Verify caught a runtime
    # error for it (it prints [verify] <name> failed and moves on) — the
    # driver would record that as a hard failure, so the pre-flight must
    # too, not silently skip the name.
    for name in sorted(set(oracle) - set(qdirs)):
        failures.append((name, "declared oracle but NO dumped result "
                         "(query threw during Verify — see its stderr)"))
    for name in qdirs:
        if name not in oracle:
            skipped.append(name)
            continue
        spark_rel = con.sql(
            f"SELECT * FROM '{os.path.join(out_dir, name)}/*.parquet'")
        scols, srows, stypes = canon(
            spark_rel.fetchall(), spark_rel.columns, spark_rel.types)
        try:
            duck_rel = con.sql(oracle[name])
            dcols, drows, dtypes = canon(
                duck_rel.fetchall(), duck_rel.columns, duck_rel.types)
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        if scols != [c.lower() for c in dcols] and scols != dcols:
            failures.append((name, f"columns differ: spark={scols} duck={dcols}"))
            continue
        drift = [(c, s, d) for c, s, d in zip(scols, stypes, dtypes)
                 if not types_ok(s, d)]
        if drift:
            failures.append((name, "declared-type drift (driver hash WILL "
                             f"diverge): {[f'{c}: spark={s} duck={d}' for c, s, d in drift]}"))
            continue
        if len(srows) != len(drows):
            failures.append((name, f"row count: spark={len(srows)} duck={len(drows)}"))
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b:
                if all(close(x, y) for x, y in zip(a, b)):
                    bad = (i, a, b, "float-close (driver hash may FAIL)")
                else:
                    bad = (i, a, b, "VALUE MISMATCH")
                break
        if bad:
            failures.append((name, f"row {bad[0]} [{bad[3]}]:\n  spark={bad[1]}\n  duck ={bad[2]}"))
        else:
            passed += 1
    print(f"PASS {passed}/{len(qdirs)}  (skipped rows-only: {skipped})")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
