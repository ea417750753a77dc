#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check.py [sfdir] [outdir] [--skip-verify]

Runs graft.Verify on sfdir (default sf0.01), then executes each
oracle_sql.json entry in DuckDB over the same parquet tables and compares
with the Spark result parquet: row count, column names, and exact values
(sorted by all columns). Prints per-query PASS/FAIL.
"""
import json, subprocess, sys, os, time

sfdir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/tmp/verify_out"

if "--skip-verify" not in sys.argv:
    import shutil
    shutil.rmtree(outdir, ignore_errors=True)  # stale results must not mask failures
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(1)

import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# "plantext" is Verify's SPARK_GRAFT_PLAN_DUMP diagnostic dir, not a query
declared = [d for d in sorted(os.listdir(outdir))
            if os.path.isdir(f"{outdir}/{d}") and d != "plantext"]
fails = 0
for name in declared:
    spark_rel = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
    if name not in oracle:
        n = spark_rel.count("*").fetchone()[0]
        if n == 0:  # no-oracle queries still must return rows (driver contract)
            print(f"{name:28s} FAIL NO-ORACLE rows=0")
            fails += 1
        else:
            print(f"{name:28s} NO-ORACLE rows={n}")
        continue
    try:
        # The DRIVER's compare sorts via pandas, which cannot hash list/struct
        # cells — an array-typed output column passes here (duckdb ORDER BY ALL
        # handles lists) but fails the real gate. Flag it as a failure locally.
        nested = [c for c, t in zip(spark_rel.columns, spark_rel.types)
                  if "[]" in str(t) or "STRUCT" in str(t) or "MAP" in str(t)]
        if nested:
            print(f"{name:28s} FAIL nested-typed output cols (driver pandas sort chokes): {nested}")
            fails += 1
            continue
        # The driver's hash path diverges on DECIMAL cells even when values
        # match (the round-5 q_merge_upsert red row). The repo convention is
        # DOUBLE at the output boundary; flag decimal locally so this gate
        # fails before the driver's does. (SchemaHygieneSpec pins the same.)
        dec = [c for c, t in zip(spark_rel.columns, spark_rel.types)
               if "DECIMAL" in str(t).upper()]
        if dec:
            print(f"{name:28s} FAIL decimal-typed output cols (driver hash diverges): {dec}")
            fails += 1
            continue
        ora = con.sql(oracle[name])
        scols, ocols = spark_rel.columns, ora.columns
        if sorted(scols) != sorted(ocols):
            print(f"{name:28s} FAIL schema: spark={sorted(scols)} oracle={sorted(ocols)}")
            fails += 1
            continue
        stypes = dict(zip(scols, [str(t) for t in spark_rel.types]))
        otypes = dict(zip(ocols, [str(t) for t in ora.types]))
        tdiff = {c: (stypes[c], otypes[c]) for c in scols if stypes[c] != otypes[c]}
        if tdiff:
            print(f"{name:28s} FAIL types: {tdiff}")
            fails += 1
            continue
        cols = ", ".join(f'"{c}"' for c in sorted(scols))
        sdf = con.sql(f"SELECT {cols} FROM spark_rel ORDER BY ALL").fetchall()
        # oracle-cost budget: a single slow DuckDB oracle can blow the
        # driver's whole correctness run (round 10: q_pack_shards_trained
        # at ~30 min emptied CORRECTNESS_r10.json). Timed over the odf
        # fetch ONLY — the spark_rel fetch above is the Spark result's
        # size, not the oracle's cost, and folding it in made ORACLE-SLOW
        # point at the wrong side for large-result queries.
        t0 = time.time()
        odf = con.sql(f"SELECT {cols} FROM ora ORDER BY ALL").fetchall()
        osec = time.time() - t0
        slow = "  ORACLE-SLOW" if osec > 30 else ""
        if len(sdf) != len(odf):
            print(f"{name:28s} FAIL rows: spark={len(sdf)} oracle={len(odf)}")
            fails += 1
        elif sdf != odf:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(sdf, odf)) if a != b][:3]
            print(f"{name:28s} FAIL values, first diffs: {bad}")
            fails += 1
        else:
            print(f"{name:28s} PASS rows={len(sdf)} oracle={osec:.1f}s{slow}")
    except Exception as e:
        print(f"{name:28s} FAIL oracle error: {e}")
        fails += 1
missing = set(oracle) - set(declared)
if missing:
    print("oracle entries with no result dir (query crashed?):", sorted(missing))
    fails += 1

# Plan-fingerprint drift vs the committed artifact (PLANS.json, generated
# from the sf0.01 gate run): an accidental plan change — lost broadcast,
# new shuffle — surfaces here as one line instead of a 190-plan read.
# Informational, not a gate failure: plans legitimately change with code;
# the point is that they never change SILENTLY.
if "sf0.01" in sfdir and os.path.exists(f"{outdir}/plans.json"):
    new_plans = json.load(open(f"{outdir}/plans.json"))
    committed = json.load(open("/root/repo/PLANS.json")) if os.path.exists("/root/repo/PLANS.json") else {}
    if committed and len(new_plans) < 0.9 * len(committed):
        # targeted Verify run: most queries absent by design — a
        # "removed" wall would be noise, so diff only the present ones
        changed = sorted(k for k in new_plans if k in committed and committed[k] != new_plans[k])
        print(f"PLAN-DIFF (targeted run, {len(new_plans)} queries) changed={changed}")
    elif os.path.exists("/root/repo/PLANS.json"):
        old_plans = json.load(open("/root/repo/PLANS.json"))
        changed = sorted(k for k in new_plans if k in old_plans and old_plans[k] != new_plans[k])
        added = sorted(k for k in new_plans if k not in old_plans)
        gone = sorted(k for k in old_plans if k not in new_plans)
        if changed or added or gone:
            print(f"PLAN-DIFF changed={changed} added={added} removed={gone}"
                  f" -- review, then: cp {outdir}/plans.json /root/repo/PLANS.json")
        else:
            print("PLAN-DIFF clean (all plan shapes match PLANS.json)")
    else:
        print(f"PLAN-DIFF no committed PLANS.json yet -- seed it: cp {outdir}/plans.json /root/repo/PLANS.json")

sys.exit(1 if fails else 0)
