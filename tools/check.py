#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB executing SparkEntry.oracleSql on the same parquet tables,
compare row count, schema (column names), and value hashes.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(float(v))
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "tolist") and getattr(v, "ndim", 0) >= 1:  # numpy array
        return "[" + ",".join(canon(x) for x in v.tolist()) + "]"
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def df_rows(df):
    """Pandas frame -> (cols, rows) with numpy scalars (float64 keeps its
    '.0' repr, matching the driver's arrow/pandas canonicalization)."""
    cols = [str(c) for c in df.columns]
    rows = list(df.itertuples(index=False, name=None))
    return cols, rows

def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    srows = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.md5()
    for r in srows:
        h.update(("|".join(r) + "\n").encode())
    return sorted_cols, len(rows), h.hexdigest()

def run_oracle(con, sql, timeout_s):
    """Execute with an optional wall-clock budget: a timer thread calls
    interrupt() so a super-linear replay oracle (the DuckDB side can be
    far worse than the Spark side at big SF) can't wedge the sweep.
    Runs on a throwaway cursor (a sibling connection to the same
    in-memory db, sharing the views): if the query finishes right at the
    deadline, the late interrupt lands on the discarded cursor instead
    of poisoning the shared connection's NEXT query."""
    if not timeout_s:
        return con.execute(sql).df()
    import threading
    cur = con.cursor()
    done = threading.Event()
    def killer():
        if not done.wait(timeout_s):
            cur.interrupt()
    t = threading.Thread(target=killer, daemon=True)
    t.start()
    try:
        return cur.execute(sql).df()
    finally:
        done.set()
        t.join()
        cur.close()

def main():
    argv = list(sys.argv[1:])
    timeout_s = 0
    if "--oracle-timeout" in argv:
        i = argv.index("--oracle-timeout")
        timeout_s = float(argv[i + 1])
        del argv[i:i + 2]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single parquet FILES; GenTestData fixtures
        # are Spark parquet DIRECTORIES — glob the parts in that case
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # queries with no oracle SQL get the driver's weaker rows-only check
    for d in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, d)
        if not os.path.isdir(pdir) or d in oracle or (only and d not in only):
            continue
        try:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{pdir}/*.parquet')").fetchone()[0]
            if n > 0:
                print(f"PASS {d} (rows-only: {n} rows)")
                n_pass += 1
            else:
                print(f"FAIL {d}: rows-only check returned 0 rows")
                n_fail += 1
        except Exception as e:
            print(f"FAIL {d}: rows-only check: {e}")
            n_fail += 1
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        pdir = os.path.join(out_dir, name)
        if not glob.glob(pdir + "/*.parquet"):
            print(f"FAIL {name}: no spark output at {pdir}")
            n_fail += 1
            continue
        # Fetch via pandas (.df()) on BOTH sides, like the driver's gate:
        # DuckDB HUGEINT (e.g. SUM(INTEGER), // on HUGEINT) has no pandas
        # integer dtype and becomes float64 — "5947.0" vs Spark's "5947".
        # fetchall() hides that (Python ints), which is how the q08 miss
        # survived two rounds locally-green.
        try:
            g_df = con.execute(
                f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df()
            g_cols, g_rows = df_rows(g_df)
        except Exception as e:
            print(f"FAIL {name}: reading spark output: {e}")
            n_fail += 1
            continue
        try:
            w_df = run_oracle(con, sql, timeout_s)
            w_cols, w_rows = df_rows(w_df)
        except duckdb.InterruptException:
            print(f"SKIP {name}: oracle exceeded {timeout_s:.0f}s "
                  "(DuckDB-side replay cost, not an engine result)", flush=True)
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        gc, gn, gh = frame_sig(g_cols, g_rows)
        wc, wn, wh = frame_sig(w_cols, w_rows)
        if gc != wc:
            print(f"FAIL {name}: columns differ\n  spark:  {gc}\n  oracle: {wc}")
            n_fail += 1
        elif gn != wn:
            print(f"FAIL {name}: rows {gn} vs oracle {wn}")
            n_fail += 1
        elif gh != wh:
            print(f"FAIL {name}: hash mismatch ({gn} rows)")
            # show first differing row for debugging
            order = sorted(range(len(g_cols)), key=lambda i: g_cols[i])
            gs = sorted(tuple(canon(r[i]) for i in order) for r in g_rows)
            ws = sorted(tuple(canon(r[i]) for i in order) for r in w_rows)
            for a, b in zip(gs, ws):
                if a != b:
                    print(f"  spark:  {a}\n  oracle: {b}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({gn} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
