#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> \
           [--shard i/n] [--skip name1,name2] [--only name1,name2]

For each entry in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
over the parquet tables in <sfDir>, load the Spark result parquet from
<verifyOutDir>/<name>/, sort columns by name, sort rows, and compare a
value hash. Mirrors the driver's CORRECTNESS check (rows/schema/hash).

PASS/FAIL lines flush per query as they complete (per-query wall time on
stderr), so shards can run in parallel with visible progress:
  --shard i/n  process every n-th query starting at i (round-robin split)
  --skip       drop named queries (e.g. closure oracles that are
               infeasible at large SF; tools/cc_check.py covers those)
  --only       restrict to the named queries
"""
import sys, json, glob, hashlib, math, time
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_val(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)

def table_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    norm_rows = sorted("|".join(norm_val(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(norm_rows).encode()).hexdigest()
    return names, len(norm_rows), h, norm_rows

def env_stamp(sf_dir):
    """Engine version + testdata fingerprints — printed with every run
    and written to <outDir>/compare_env.json, so a cross-environment
    hash mismatch (the round-12 q99 class) is diagnosable from the
    artifacts alone: same fingerprints + same DuckDB = logic bug;
    different = environment drift."""
    import os
    fp = {}
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            st = os.stat(p)
            meta = pq.read_metadata(p)
            fp[t] = {"rows": meta.num_rows, "bytes": st.st_size}
    return {"duckdb": duckdb.__version__,
            "pyarrow": pq.__name__ and __import__("pyarrow").__version__,
            "testdata": fp}


def main(sf_dir, out_dir, shard=None, skip=(), only=()):
    con = duckdb.connect()
    import os
    stamp = env_stamp(sf_dir)
    print(f"[env] duckdb={stamp['duckdb']} pyarrow={stamp['pyarrow']} "
          + " ".join(f"{t}:{v['rows']}r/{v['bytes']}B"
                     for t, v in sorted(stamp["testdata"].items())),
          file=sys.stderr, flush=True)
    try:
        with open(f"{out_dir}/compare_env.json", "w") as f:
            json.dump(stamp, f, indent=1)
    except OSError:
        pass  # read-only outDir: the stderr line still carries the stamp
    con.execute(f"SET threads={os.environ.get('DUCKDB_THREADS', '8')}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(oracle)
    if only:
        names = [n for n in names if n in only]
    if skip:
        names = [n for n in names if n not in skip]
    if shard:
        i, n = map(int, shard.split("/"))
        names = names[i::n]
    results = {}
    for name in names:
        t0 = time.time()
        results[name] = check_one(con, oracle, out_dir, name)
        if results[name] != "OK" and results[name].startswith("HASH"):
            # a parallel DuckDB aggregation sums doubles in a run-varying
            # order, which can flip a grid-boundary value between runs
            # (q92's z at sf0.001 flips between 0.839 and 0.8391 at
            # threads=8). Adjudicate with a DETERMINISTIC single-thread
            # oracle evaluation: if that matches, the mismatch was the
            # oracle's own parallelism, not a logic bug.
            st = duckdb.connect()
            st.execute("SET threads=1")
            for t in TABLES:
                st.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                           f"read_parquet('{sf_dir}/{t}.parquet')")
            retry = check_one(st, oracle, out_dir, name)
            st.close()
            if retry == "OK":
                print(f"  [{name}: parallel-oracle grid flake, "
                      "single-thread oracle matches]",
                      file=sys.stderr, flush=True)
                results[name] = "OK"
        mark = "PASS" if results[name] == "OK" else "FAIL"
        print(f"{mark} {name}"
              + ("" if results[name] == "OK" else f": {results[name]}"),
              flush=True)
        print(f"  [{name}: {time.time() - t0:.1f}s]", file=sys.stderr, flush=True)
    npass = sum(1 for v in results.values() if v == "OK")
    print(f"\n{npass}/{len(results)} oracle-backed queries pass")


def lint_oracle_types(con, sql):
    """Output-type lint (the generalized q99 lesson): DuckDB widens
    sum(BIGINT) to HUGEINT and exact division to DECIMAL; the driver's
    pandas comparator renders both as float64, so an integer-valued
    column hashes as "19525.0" against Spark's "19525" and the query
    ships red even though the engine is bit-correct. DESCRIBE is
    plan-only (cheap), so every compare run lints every oracle; any
    HUGEINT/UHUGEINT/DECIMAL output column is a FAIL before values are
    even fetched."""
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        return f"ORACLE ERROR (describe): {e}"
    risky = [(r[0], r[1]) for r in desc
             if "HUGEINT" in r[1].upper() or "DECIMAL" in r[1].upper()]
    if risky:
        return (f"ORACLE-TYPE {risky}: HUGEINT/DECIMAL render as float "
                "in the driver's pandas comparator — CAST the oracle's "
                "final select to BIGINT/DOUBLE")
    return None


def check_one(con, oracle, out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return "MISSING spark output"
    # lint first: it needs only the SQL (DESCRIBE is plan-only), so a
    # type failure must not pay the Spark parquet scan + per-cell
    # Python materialization below
    lint = lint_oracle_types(con, oracle[name])
    if lint:
        return lint
    spark_t = pq.read_table(files[0])
    # The driver's comparator is pandas-based and dies on list/struct
    # columns (unhashable ndarray). Fail locally the same way so an
    # array-typed declared output never ships looking green.
    import pyarrow.types as pt
    bad = [f.name for f in spark_t.schema
           if pt.is_list(f.type) or pt.is_large_list(f.type)
           or pt.is_struct(f.type) or pt.is_map(f.type)]
    if bad:
        return f"DRIVER-UNHASHABLE columns {bad}: serialize " \
            "with array_join/to_json in the declared query + oracle"
    s_cols = spark_t.column_names
    s_rows = [tuple(spark_t.column(c)[i].as_py() for c in s_cols)
              for i in range(spark_t.num_rows)]
    try:
        cur = con.execute(oracle[name])
        o_cols = [d[0] for d in cur.description]
        o_rows = cur.fetchall()
    except Exception as e:
        return f"ORACLE ERROR: {e}"
    sn, src, sh, s_norm = table_sig(s_cols, s_rows)
    on, orc, oh, o_norm = table_sig(o_cols, o_rows)
    if sn != on:
        return f"SCHEMA spark={sn} oracle={on}"
    if src != orc:
        return f"ROWS spark={src} oracle={orc}"
    if sh != oh:
        diff = [f"  S:{a}\n  O:{b}" for a, b in zip(s_norm, o_norm) if a != b][:3]
        return "HASH mismatch, first diffs:\n" + "\n".join(diff)
    return "OK"


if __name__ == "__main__":
    args = sys.argv[1:]
    kw = {}
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--shard":
            kw["shard"] = args[i + 1]; i += 2
        elif args[i] == "--skip":
            kw["skip"] = set(args[i + 1].split(",")); i += 2
        elif args[i] == "--only":
            kw["only"] = set(args[i + 1].split(",")); i += 2
        else:
            pos.append(args[i]); i += 1
    main(pos[0], pos[1], **kw)
