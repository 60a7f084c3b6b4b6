#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles (dev tool, mirrors the
driver's correctness gate): reads each Verify output parquet and the
dumped oracle_sql.json, runs the oracle in DuckDB over the same sf dir,
and compares row count, column-name set, and a value hash computed over
column-name-sorted, row-sorted string representations.

Two hashing modes, BOTH must pass:
  duck   — Spark parquet read back through DuckDB read_parquet (the
           original mode; both sides' values rendered by DuckDB).
  strict — Spark parquet read directly with pyarrow, values formatted
           by this script, compared against the ORACLE result fetched
           through DuckDB's Arrow bridge (not fetchall). This catches
           emitted-type divergences the duck mode normalizes away:
           round 4 shipped DECIMAL-typed aggregates that hashed green
           locally but red on the driver, and round 5 shipped a q10
           oracle whose windowed sum(INTEGER) types as HUGEINT — exact
           over fetchall, but rendered as a double ('1.0' vs '1') by
           any Arrow/pandas-path hasher like the driver's.

Usage: python3 tools/check.py [outDir] [sfDir] [--strict]
(--strict is accepted for compatibility; strict mode ALWAYS runs)
(run `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"` first)
"""
import sys, json, hashlib, glob, os
import decimal
import duckdb
import pyarrow.parquet as pq

args = [a for a in sys.argv[1:] if a != "--strict"]
outdir = args[0] if len(args) > 0 else "/tmp/verify_out"
sfdir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # str() keeps the declared scale ("1.2000" at scale 4): a DECIMAL
        # output only hashes equal to the oracle if the oracle emits the
        # SAME type and scale — a DOUBLE one formats as "1.200000"/repr
        # and mismatches, which is exactly the driver-visible divergence
        # this mode exists to catch.
        return str(v)
    if isinstance(v, list):
        return "[" + ", ".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def read_pyarrow(files):
    """Spark output via pyarrow, no DuckDB in the path."""
    tbl = pq.ParquetDataset(files).read()
    cols = tbl.column_names
    pyrows = tbl.to_pylist()
    rows = [tuple(d[c] for c in cols) for d in pyrows]
    return cols, rows


con = duckdb.connect()
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    spark_glob = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not spark_glob:
        results[name] = {"ok": False, "why": "no spark output"}
        continue
    try:
        sq = con.execute(
            f"SELECT * FROM read_parquet({spark_glob!r})")
        s_cols = [d[0] for d in sq.description]
        s_rows = sq.fetchall()
    except Exception as e:
        results[name] = {"ok": False, "why": f"spark read: {e}"}
        continue
    try:
        p_cols, p_rows = read_pyarrow(spark_glob)
    except Exception as e:
        results[name] = {"ok": False, "why": f"pyarrow read: {e}"}
        continue
    try:
        # materialize once (some oracles — q48's two-sided MinHash — cost
        # seconds), then read the SAME result through both type paths
        con.execute(f"CREATE OR REPLACE TEMP TABLE _oracle_r AS {oracle[name]}")
        oq = con.execute("SELECT * FROM _oracle_r")
        o_cols = [d[0] for d in oq.description]
        o_rows = oq.fetchall()
        # Arrow-path read of the SAME oracle result. HUGEINT (e.g. an
        # uncast windowed sum(INTEGER)) surfaces as decimal128(38,0)
        # here while fetchall yields exact Python ints — the emission
        # type check below is what catches it.
        a_tbl = con.execute("SELECT * FROM _oracle_r").arrow()
        a_cols = a_tbl.column_names
        a_rows = [tuple(d[c] for c in a_cols) for d in a_tbl.to_pylist()]
    except Exception as e:
        results[name] = {"ok": False, "why": f"oracle: {e}"}
        continue
    # Emission-type invariant (CLAUDE.md): hashed outputs are DOUBLE /
    # BIGINT / STRING, never DECIMAL or HUGEINT — the driver renders
    # Spark-vs-DuckDB decimal-family values through different paths
    # (round 4: DECIMAL aggregates; round 5: a HUGEINT session_id), so a
    # decimal-typed column on EITHER side fails even when today's value
    # hash happens to collide.
    bad_types = (
        [f"spark {f.name}:{f.type}" for f in pq.ParquetDataset(spark_glob)
            .schema if "decimal" in str(f.type)] +
        [f"oracle {f.name}:{f.type}" for f in a_tbl.schema
            if "decimal" in str(f.type)])
    ok_rows = len(s_rows) == len(o_rows)
    ok_cols = sorted(s_cols) == sorted(o_cols)
    duck_ok = table_hash(s_cols, s_rows) == table_hash(o_cols, o_rows)
    strict_ok = (table_hash(p_cols, p_rows) == table_hash(a_cols, a_rows)
                 and not bad_types)
    results[name] = {
        "ok": ok_rows and ok_cols and duck_ok and strict_ok,
        "rows": [len(s_rows), len(o_rows)],
        "cols_match": ok_cols, "hash_match": duck_ok,
        "strict_hash_match": strict_ok,
    }
    if bad_types:
        results[name]["decimal_typed"] = bad_types
    if not ok_cols:
        results[name]["cols"] = [sorted(s_cols), sorted(o_cols)]

npass = sum(1 for r in results.values() if r["ok"])
for name, r in results.items():
    flag = "PASS" if r["ok"] else "FAIL"
    print(f"{flag} {name} {json.dumps({k: v for k, v in r.items() if k != 'ok'})}")
print(f"== {npass}/{len(results)} pass (duck + strict modes)")
sys.exit(0 if npass == len(results) else 1)
