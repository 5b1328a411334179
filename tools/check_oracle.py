#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/check_oracle.py <sfDir> <outDir>

For each query dir under outDir: read the Spark parquet result, run the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables,
sort columns by name + rows by value, and diff. Exit nonzero on any
mismatch. Stricter than the driver (exact equality incl. floats), so
passing here should imply passing there.

RENDER-AND-HASH stage (r12): twice in a row a query passed this
pre-flight on exact values and declared types yet hashed red on the
driver (r10 text_tfidf_cosine_pairs, r11 profile_sample_error). The
driver does not compare Python values — it RENDERS each side to text
through its own read path (the Spark side re-read from parquet, the
oracle side fetched from a live DuckDB query) and hashes the rendered
rows. Value equality does not imply render equality: a type coercion
introduced by one read path and not the other (DECIMAL -> float64 in a
pandas conversion drops trailing zeros: '3168.30' vs '3168.3';
parquet-read timestamps come back tz-aware, live ones naive) changes the
rendered text of EQUAL values. So after the value compare, every query
is additionally hashed through three render protocols, each applied to
BOTH sides, and any per-protocol hash disagreement fails the pre-flight
with the first divergent rendered cell:

  P1 asymmetric-fetch  spark: fetchall from the result parquet;
                       oracle: fetchall from the live query.
                       (The driver's shape per the r11 verdict.)
  P2 both-parquet      oracle COPY TO parquet, both sides re-read
                       through the one reader, fetchall.
                       (The canonical reference render.)
  P3 pandas            both sides through duckdb's .df() conversion
                       (DECIMAL -> float64, tz coercions) rendered via
                       str(); catches drivers that hash DataFrames.
  P4 pyarrow-vs-fetch  spark side through pyarrow's parquet reader (its
                       own decimal/timestamp coercions), oracle side
                       from the live fetch — the maximally-asymmetric
                       reader pairing.

Float formatting (documented per the r12 directive): floats render via
repr() — CPython's shortest-round-trip algorithm, the same family as
DuckDB's ryu VARCHAR cast; Decimals via str() (scale-preserving, so
'3168.30' keeps its cents digit); None as a sentinel; datetimes via
isoformat after normalizing tz-aware values to UTC and dropping the
offset; bytes as hex; lists element-wise recursively.

FAITHFULNESS LIMIT (r12 finding — read before trusting a green run):
P1-P4 replay read/render protocols through the LOCAL duckdb/pyarrow,
and the driver's DECIMAL render is NOT reproducible through them. In
round 12 the only two driver-red queries shipped DECIMAL output
columns and passed all four protocols here; across rounds 10-12 every
DECIMAL-shipping query hashed red on the driver and no other query
ever did, even with judge-verified exact, deterministic values. The
actual defense is the class ban: OutputTypeSpec rejects ALL DecimalType
output fields, and this script FAILS any result parquet (or oracle
relation) whose schema declares a DECIMAL column — the check below
fires before any value compare, so a decimal shipper is caught even
when its values are perfect. DECIMAL remains fine (and load-bearing)
as an INTERMEDIATE accumulator; only the shipped cell is banned.
"""
import datetime
import hashlib
import json
import math
import os
import sys
import tempfile
from decimal import Decimal

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


# ---------------------------------------------------------------- render


def render_cell(v):
    """Canonical text for one cell. Every branch is a documented render
    decision (see module docstring); the POINT is that the same value
    arriving as a different Python type (Decimal vs float, aware vs
    naive datetime) renders DIFFERENTLY — exactly the divergence class
    the driver's hash sees and the value compare above cannot."""
    if v is None:
        return "␀"  # NUL symbol: never collides with data text
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return repr(v)  # shortest round-trip
    if isinstance(v, Decimal):
        return str(v)  # scale-preserving: '3168.30' != '3168.3'
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(render_cell(x) for x in v) + "]"
    return str(v)


def render_hash(rows, cols):
    """Hash of the rendered relation: columns sorted by name, each row
    rendered cell-by-cell, rows sorted by rendered text."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = sorted("\x1f".join(render_cell(r[i]) for i in order)
                      for r in rows)
    h = hashlib.sha256()
    h.update("\x1f".join(cols[i] for i in order).encode())
    for line in rendered:
        h.update(b"\x1e")
        h.update(line.encode())
    return h.hexdigest(), rendered


def first_render_diff(sr, dr):
    """First differing rendered line between two sorted renders."""
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            cells_a, cells_b = a.split("\x1f"), b.split("\x1f")
            for j, (ca, cb) in enumerate(zip(cells_a, cells_b)):
                if ca != cb:
                    return f"row {i} col#{j}: spark-render={ca!r} oracle-render={cb!r}"
            return f"row {i}: arity differs"
    return f"row count {len(sr)} vs {len(dr)}"


def hash_protocols(con, name, spark_glob, oracle_table, tmpdir):
    """Render-and-hash both sides under P1/P2/P3; return list of
    (protocol, diff-description) mismatches."""
    bad = []
    # P1: spark from parquet, oracle from live fetch
    s_rel = con.sql(f"SELECT * FROM '{spark_glob}'")
    s_rows, s_cols = s_rel.fetchall(), s_rel.columns
    o_rel = con.sql(f"SELECT * FROM {oracle_table}")
    o_rows, o_cols = o_rel.fetchall(), o_rel.columns
    h1s, r1s = render_hash(s_rows, s_cols)
    h1o, r1o = render_hash(o_rows, o_cols)
    if h1s != h1o:
        bad.append(("P1 asymmetric-fetch", first_render_diff(r1s, r1o)))
    # P2: oracle round-tripped through parquet, both via the one reader
    opq = os.path.join(tmpdir, f"{name}_oracle.parquet")
    con.execute(f"COPY (SELECT * FROM {oracle_table}) TO '{opq}' (FORMAT PARQUET)")
    o2_rel = con.sql(f"SELECT * FROM '{opq}'")
    h2o, r2o = render_hash(o2_rel.fetchall(), o2_rel.columns)
    if h1s != h2o:
        bad.append(("P2 both-parquet", first_render_diff(r1s, r2o)))
    # P3: both sides through the pandas conversion (DECIMAL -> float64)
    s_df = con.sql(f"SELECT * FROM '{spark_glob}'").df()
    o_df = con.sql(f"SELECT * FROM {oracle_table}").df()
    h3s, r3s = render_hash([tuple(r) for r in s_df.itertuples(index=False)],
                           list(s_df.columns))
    h3o, r3o = render_hash([tuple(r) for r in o_df.itertuples(index=False)],
                           list(o_df.columns))
    if h3s != h3o:
        bad.append(("P3 pandas", first_render_diff(r3s, r3o)))
    # P4: spark side via pyarrow (a different parquet reader entirely —
    # its own decimal/timestamp/nan coercions) vs oracle live fetch
    try:
        import glob as _glob
        import pyarrow.parquet as pq
        tables = [pq.read_table(p) for p in sorted(_glob.glob(spark_glob))]
        rows4, cols4 = [], []
        for t in tables:
            cols4 = t.column_names
            rows4.extend(tuple(d[c] for c in cols4) for d in t.to_pylist())
        h4s, r4s = render_hash(rows4, cols4)
        if h4s != h1o:
            bad.append(("P4 pyarrow-vs-fetch", first_render_diff(r4s, r1o)))
    except ImportError:
        pass
    return bad


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    if only:
        # local-iteration filter matching Verify's third arg: restrict
        # the compare to names starting with any given prefix, so a
        # partial Verify dump checks clean without hand-trimming
        # oracle_sql.json (names the dump lacks otherwise FAIL as
        # "declared but NO dumped result" — correct for full runs)
        prefixes = only.split(",")
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in prefixes)}

    hash_tmp = tempfile.mkdtemp(prefix="graft_oracle_hash_")
    failures, passed, skipped = [], 0, []
    qdirs = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    if only:
        qdirs = [d for d in qdirs if d in oracle]
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
        spark_glob = f"{os.path.join(out_dir, name)}/*.parquet"
        spark_rel = con.sql(f"SELECT * FROM '{spark_glob}'")
        scols, srows, stypes = canon(
            spark_rel.fetchall(), spark_rel.columns, spark_rel.types)
        # Hard ban on DECIMAL in the shipped schema (r12 finding, see
        # module docstring): the driver's decimal render is not locally
        # reproducible, so a decimal shipper must fail HERE even when
        # every value and all four render protocols agree.
        dec_cols = [f"{c}: {t}" for c, t in zip(scols, stypes)
                    if "DECIMAL" in str(t).upper()]
        if dec_cols:
            failures.append((name, "DECIMAL-typed result column(s) "
                             "(driver hash renders DECIMAL inconsistently; "
                             "rounds 10-12: every decimal shipper red — ship "
                             f"BIGINT cents or DOUBLE): {dec_cols}"))
            continue
        try:
            # materialize once: the value compare and the three render
            # protocols all read this table, so the oracle SQL runs once
            con.execute("CREATE OR REPLACE TEMP TABLE __oracle AS "
                        + oracle[name])
            duck_rel = con.sql("SELECT * FROM __oracle")
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
            continue
        # values + declared types agree — now demand the RENDERED text
        # agrees under every protocol the driver might hash through
        hbad = hash_protocols(con, name, spark_glob, "__oracle", hash_tmp)
        if hbad:
            failures.append((name, "render-hash divergence (values equal, "
                             "driver hash WILL diverge): " + "; ".join(
                                 f"[{p}] {d}" for p, d in hbad)))
        else:
            passed += 1
    print(f"PASS {passed}/{len(qdirs)}  (skipped rows-only: {skipped})")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    return 1 if failures else 0


def selftest():
    """Decimal canary: a deliberately DECIMAL-shipping toy query must
    FAIL the pre-flight even though its values and renders are perfect
    on both sides (the r12 class). Run: check_oracle.py --selftest"""
    tmp = tempfile.mkdtemp(prefix="graft_oracle_selftest_")
    sf = os.path.join(tmp, "sf")
    out = os.path.join(tmp, "out", )
    qdir = os.path.join(out, "toy_decimal")
    os.makedirs(sf)
    os.makedirs(qdir)
    con = duckdb.connect()
    con.execute(f"COPY (SELECT 1 AS region_id) TO "
                f"'{os.path.join(sf, 'region.parquet')}' (FORMAT PARQUET)")
    con.execute(f"COPY (SELECT CAST(3168.30 AS DECIMAL(18,2)) AS m) TO "
                f"'{os.path.join(qdir, 'part-0.parquet')}' (FORMAT PARQUET)")
    with open(os.path.join(out, "oracle_sql.json"), "w") as f:
        json.dump({"toy_decimal":
                   "SELECT CAST(3168.30 AS DECIMAL(18,2)) AS m"}, f)
    # capture the output: a nonzero rc for any OTHER reason (path issue,
    # oracle SQL error) must not count as the canary firing
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(sf, out)
    print(buf.getvalue(), end="")
    if rc == 0 or "DECIMAL-typed result column" not in buf.getvalue():
        print("SELFTEST FAIL: the decimal ban did not fire "
              f"(rc={rc}; see output above)")
        return 1
    print("SELFTEST PASS: decimal-shipping toy query correctly rejected")
    return 0


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
