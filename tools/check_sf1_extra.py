#!/usr/bin/env python3
"""Independent sf1 gates for the 3 queries whose DuckDB oracles are
QUADRATIC-shape and time out at sf1 (VERDICT r10 #1: every
oracle-intractable query gets a named substitute gate). Runs against
the graft.Verify sf1 dump + the sf1 corpus; updates CORRECTNESS_SF1
.json in place, replacing each oracle_timeout row with the substitute
verdict.

Usage: python3 tools/check_sf1_extra.py <sfDir> <verifyOutDir> \
           <CORRECTNESS_SF1.json> [--replicas 10]

Gates (all on the DUMPED result, no quadratic corpus pass):

  q43_skyline — COMPLETE exact verification in O(n*k): a point is in
    the Pareto skyline iff NO skyline point dominates it (dominance is
    transitive, so being undominated by the claimed skyline == being
    undominated by the corpus, PROVIDED the claimed set itself is
    corpus-undominated — which pass 1 checks). Pass 1: no corpus point
    dominates any dumped row. Pass 2: the distinct undominated-by-dump
    corpus points are exactly the dumped set.

  dedup_ppjoin — (a) CONTAINMENT: the df-capped ngram-jaccard pair set
    (its own oracle PASSED at sf1) must be a subset — the ScalingSpec
    cross-algorithm law replayed on the sf1 artifacts; (b) REPLICA
    SYMMETRY completeness: the ScaleUp corpus is `replicas` identical
    text copies with offset ids, so each base pair class {x,y} must
    appear exactly C(r,2)=45 times (x==y: the copies of one doc) or
    r*r=100 times (x<y) — a missing pair anywhere breaks an exact
    count; (c) SOUNDNESS sample: recompute the 3-gram shingle Jaccard
    in DuckDB for a deterministic md5-sample of pairs and require
    exact equality with the dumped metric.

  dedup_edit_near — (b) and (c) as above (levenshtein on the 400-char
    prefixes + the length gate for the sample; the simhash-block
    equality is implied for replica copies and was oracle-checked at
    sf0.1 where the full oracle completes).
"""
import json
import sys

import duckdb
import pandas as pd

SAMPLE = 2000


def md5_sample(df, n):
    import hashlib
    key = df.apply(lambda r: hashlib.md5(
        f"{r.id1}-{r.id2}".encode()).hexdigest(), axis=1)
    return df.assign(__k=key).sort_values("__k").head(n).drop(columns="__k")


def class_counts(df, base, replicas):
    x = df.id1 % base
    y = df.id2 % base
    lo, hi = pd.concat([x, y], axis=1).min(axis=1), \
        pd.concat([x, y], axis=1).max(axis=1)
    cls = pd.DataFrame({"lo": lo, "hi": hi}).groupby(["lo", "hi"]).size()
    same = int(replicas * (replicas - 1) / 2)
    cross = replicas * replicas
    bad = cls[((cls.index.get_level_values(0) ==
                cls.index.get_level_values(1)) & (cls != same)) |
              ((cls.index.get_level_values(0) !=
                cls.index.get_level_values(1)) & (cls != cross))]
    return len(cls), bad


def main():
    sf_dir, out_dir, art_path = sys.argv[1], sys.argv[2], sys.argv[3]
    replicas = 10
    if "--replicas" in sys.argv:
        replicas = int(sys.argv[sys.argv.index("--replicas") + 1])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    results = {}

    # ---- q43_skyline: complete O(n*k) dominance verification ----
    sky = pd.read_parquet(f"{out_dir}/q43_skyline")
    con.register("sky", sky)
    dominated_sky = con.execute("""
      WITH p AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                        epoch_us(o_orderdate) // 86400000000 AS d FROM orders),
      s AS (SELECT CAST(round(price * 100) AS BIGINT) AS c, day AS d FROM sky)
      SELECT count(*) FROM s WHERE EXISTS (
        SELECT 1 FROM p b WHERE b.c >= s.c AND b.d <= s.d
          AND (b.c > s.c OR b.d < s.d))""").fetchone()[0]
    undom = con.execute("""
      WITH p AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                        epoch_us(o_orderdate) // 86400000000 AS d FROM orders),
      s AS (SELECT CAST(round(price * 100) AS BIGINT) AS c, day AS d FROM sky),
      u AS (SELECT DISTINCT c, d FROM p a WHERE NOT EXISTS (
              SELECT 1 FROM s b WHERE b.c >= a.c AND b.d <= a.d
                AND (b.c > a.c OR b.d < a.d)))
      SELECT (SELECT count(*) FROM u),
             (SELECT count(*) FROM u JOIN s USING (c, d))""").fetchone()
    sky_ok = dominated_sky == 0 and undom[0] == len(sky) \
        and undom[1] == len(sky)
    results["q43_skyline"] = {
        "gate": "exact O(n*k) dominance completeness",
        "dumped": len(sky), "corpus_dominated_dump_rows": dominated_sky,
        "undominated_distinct": undom[0], "matched": undom[1],
        "pass": bool(sky_ok)}
    print(f"{'PASS' if sky_ok else 'FAIL'} q43_skyline (substitute: "
          f"complete dominance check, {len(sky)} rows)")

    # ---- dedup_ppjoin ----
    pp = pd.read_parquet(f"{out_dir}/dedup_ppjoin")
    base = int(con.execute(
        "SELECT max(doc_id) + 1 FROM documents").fetchone()[0]) // replicas
    nj = pd.read_parquet(f"{out_dir}/dedup_ngram_jaccard")
    ppset = set(zip(pp.id1, pp.id2))
    missing = [p for p in zip(nj.id1, nj.id2) if p not in ppset]
    ncls, bad = class_counts(pp, base, replicas)
    samp = md5_sample(pp, SAMPLE)
    con.register("samp", samp)
    mism = con.execute("""
      WITH toks AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
           FROM documents
           WHERE doc_id IN (SELECT id1 FROM samp UNION SELECT id2 FROM samp)),
      sh AS (SELECT doc_id, list_distinct(list_transform(
               range(1, len(tk) - 1),
               i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS s
             FROM toks WHERE len(tk) >= 3)
      SELECT count(*) FROM samp q
        JOIN sh a ON a.doc_id = q.id1 JOIN sh b ON b.doc_id = q.id2
      WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4)
            <> round(q.jaccard, 4)""").fetchone()[0]
    pp_ok = not missing and len(bad) == 0 and mism == 0
    results["dedup_ppjoin"] = {
        "gate": "ngram-jaccard containment + replica-class counts + "
                "sampled metric replay",
        "pairs": len(pp), "classes": ncls, "bad_classes": len(bad),
        "ngram_pairs_missing": len(missing),
        "sample_metric_mismatches": int(mism), "pass": bool(pp_ok)}
    print(f"{'PASS' if pp_ok else 'FAIL'} dedup_ppjoin (substitute: "
          f"{ncls} classes, {len(pp)} pairs, containment "
          f"{len(nj)} ngram pairs)")

    # ---- dedup_edit_near ----
    en = pd.read_parquet(f"{out_dir}/dedup_edit_near")
    ncls_e, bad_e = class_counts(en, base, replicas)
    samp_e = md5_sample(en, SAMPLE)
    con.register("samp_e", samp_e)
    mism_e = con.execute("""
      WITH dd AS (SELECT doc_id, substr(text, 1, 400) AS p,
                         length(substr(text, 1, 400)) AS n FROM documents
                  WHERE doc_id IN (SELECT id1 FROM samp_e
                                   UNION SELECT id2 FROM samp_e))
      SELECT count(*) FROM samp_e q
        JOIN dd a ON a.doc_id = q.id1 JOIN dd b ON b.doc_id = q.id2
      WHERE levenshtein(a.p, b.p) <> q.edit_dist
         OR abs(a.n - b.n) > greatest(a.n, b.n) // 5
         OR levenshtein(a.p, b.p) > greatest(a.n, b.n) // 5
      """).fetchone()[0]
    en_ok = len(bad_e) == 0 and mism_e == 0
    results["dedup_edit_near"] = {
        "gate": "replica-class counts + sampled predicate/metric replay",
        "pairs": len(en), "classes": ncls_e, "bad_classes": len(bad_e),
        "sample_mismatches": int(mism_e), "pass": bool(en_ok)}
    print(f"{'PASS' if en_ok else 'FAIL'} dedup_edit_near (substitute: "
          f"{ncls_e} classes, {len(en)} pairs)")

    # ---- fold into the matrix artifact ----
    with open(art_path) as f:
        art = json.load(f)
    for q, r in results.items():
        row = art.get(q, {})
        # Stamp oracle_timeout only when the matrix run did NOT produce
        # a genuine oracle verdict for this query (row absent, or itself
        # a timeout) — a prior check_sf1.py run with a larger --timeout
        # may have completed the real oracle, and that verdict (pass OR
        # fail) outranks the substitute gate (ADVICE r11).
        if not row or row.get("err") == "oracle_timeout":
            row["err"] = "oracle_timeout"
        row["substitute_gate"] = r
        art[q] = row
    with open(art_path, "w") as f:
        json.dump(dict(sorted(art.items())), f, indent=1)
    ok = all(r["pass"] for r in results.values())
    print("SUBSTITUTE GATES " + ("ALL GREEN" if ok else "FAILED"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
