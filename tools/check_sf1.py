#!/usr/bin/env python3
"""Scale-rung correctness matrix (NOT shipped library code) — the
sf1 widening of the driver's gate (VERDICT r10 #1).

Usage:
  python3 tools/check_sf1.py <sfDir> <verifyOutDir> \
      [--timeout SEC] [--procs N] [--json OUT.json] [query ...]

Same compare as tools/check_correctness.py (rows + dtype-family +
exact normalized values vs a DuckDB oracle over the same parquet),
but built for the 100x rung where SOME oracles are intractable:

  - every oracle runs in its own subprocess with a hard TIMEOUT —
    a query whose DuckDB side cannot complete in budget is recorded
    as {"err": "oracle_timeout"} instead of hanging the matrix;
  - queries run in a process pool (the box has 32 cores; one oracle
    at a time would take hours at sf1);
  - results are written as a CORRECTNESS-shaped JSON artifact
    (rows_match / schema_match / hash_match / spark_rows /
    oracle_rows / err per query) so the sf1 matrix is directly
    comparable with the driver's CORRECTNESS_r{N}.json.

Timed-out queries are EXPECTED for the iterative graph oracles
(betweenness/pagerank are measured-intractable in DuckDB at sf1);
each such query must carry an independent gate instead (GraphPin's
exact replicas, ScalingSpec, or a named spec) — the point of this
tool is to make that remainder an explicit, named list.
"""
import argparse
import json
import multiprocessing as mp
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            col = pd.to_datetime(col).dt.tz_localize(None)
            out[c] = col.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(col):
            out[c] = col.round(6).map(lambda v: f"{v:.6f}")
        else:
            out[c] = col.astype(str)
    return out


def check_one(args):
    """Worker: run one oracle + compare. Returns (name, result dict)."""
    name, sql, sf_dir, out_dir, threads = args
    import duckdb
    import pandas as pd
    res = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        sdf = pd.read_parquet(f"{out_dir}/{name}")
        res["spark_rows"] = len(sdf)
    except Exception as e:
        res["err"] = f"spark_result_missing: {e}"
        return name, res
    try:
        con = duckdb.connect()
        con.execute(f"PRAGMA threads={threads}")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        odf = con.execute(sql).fetchdf()
        res["oracle_rows"] = len(odf)
    except Exception as e:
        res["err"] = f"oracle_error: {str(e)[:200]}"
        return name, res
    if len(sdf) != len(odf):
        res["err"] = "row_count"
        return name, res
    res["rows_match"] = True
    sn, on_ = norm(sdf), norm(odf)
    if list(sn.columns) != list(on_.columns):
        res["err"] = "columns"
        return name, res
    # dtype-family check: equal kinds pass; i-vs-f passes (the known
    # pandas nullable-int widening the sf0.01 gate also tolerates).
    res["schema_match"] = all(
        sdf[c].dtype.kind == odf[c].dtype.kind
        or {sdf[c].dtype.kind, odf[c].dtype.kind} == {"i", "f"}
        for c in sdf.columns)
    if not (sn.values == on_.values).all():
        res["err"] = "values"
        return name, res
    res["hash_match"] = True
    return name, res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--procs", type=int, default=6)
    ap.add_argument("--threads", type=int, default=4,
                    help="duckdb threads per oracle process")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("queries", nargs="*")
    a = ap.parse_args()
    with open(f"{a.out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sorted(a.queries) if a.queries else sorted(oracles)
    results = {}
    # One process per in-flight oracle; timeouts enforced by running
    # each check as a separate joinable process so a stuck DuckDB
    # optimizer can be killed outright (terminate()), which a
    # thread/Pool future cannot do. Fork context: the worker closure
    # below captures the child's queue, which spawn cannot pickle.
    ctx = mp.get_context("fork")
    pending = [(n, oracles[n]) for n in names if n in oracles]
    for n in names:
        if n not in oracles:
            results[n] = {"rows_match": False, "schema_match": False,
                          "hash_match": False, "spark_rows": None,
                          "oracle_rows": None, "err": "no_oracle"}
    running = {}  # name -> (proc, deadline, queue)
    import time
    i = 0
    while pending or running:
        while pending and len(running) < a.procs:
            name, sql = pending.pop(0)
            q = ctx.Queue()

            def target(args, q):
                q.put(check_one(args))

            p = ctx.Process(target=target, args=(
                (name, sql, a.sf_dir, a.out_dir, a.threads), q))
            p.start()
            running[name] = (p, time.monotonic() + a.timeout, q)
        time.sleep(0.2)
        for name in list(running):
            p, deadline, q = running[name]
            if not q.empty():
                _, res = q.get()
                p.join()
                results[name] = res
                tag = "PASS" if res["hash_match"] else f"FAIL({res['err']})"
                print(f"{tag} {name} (spark={res['spark_rows']} "
                      f"oracle={res['oracle_rows']})", flush=True)
                del running[name]
            elif not p.is_alive():
                p.join()
                results[name] = {
                    "rows_match": False, "schema_match": False,
                    "hash_match": False, "spark_rows": None,
                    "oracle_rows": None,
                    "err": f"worker_died_rc_{p.exitcode}"}
                print(f"FAIL(worker_died) {name}", flush=True)
                del running[name]
            elif time.monotonic() > deadline:
                p.terminate()
                p.join()
                results[name] = {
                    "rows_match": False, "schema_match": False,
                    "hash_match": False, "spark_rows": None,
                    "oracle_rows": None, "err": "oracle_timeout"}
                print(f"TIMEOUT {name} (> {a.timeout:.0f}s)", flush=True)
                del running[name]
        i += 1
    n_pass = sum(1 for r in results.values() if r["hash_match"])
    n_to = sum(1 for r in results.values() if r["err"] == "oracle_timeout")
    n_fail = len(results) - n_pass - n_to
    print(f"== {n_pass} pass / {n_to} oracle_timeout / {n_fail} other "
          f"of {len(results)}")
    if a.json_out:
        with open(a.json_out, "w") as f:
            json.dump(dict(sorted(results.items())), f, indent=1)
    sys.exit(0 if n_fail == 0 else 1)


if __name__ == "__main__":
    main()
