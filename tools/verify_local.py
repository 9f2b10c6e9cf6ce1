#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already run
(or runs it when --run is passed). Compares each <outDir>/<name> parquet
against the DuckDB result of oracle_sql.json[name]: schema (column
names sorted), row count, and a hash over sorted rows/sorted columns.
"""
import json, os, subprocess, sys, hashlib

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

if "--run" in sys.argv:
    r = subprocess.run(["sbt", f'runMain graft.Verify {sf} {out}'],
                       cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    for ln in r.stdout.splitlines():
        if "[verify]" in ln: print(ln)

import duckdb
import pandas as pd

con = duckdb.connect()
# protect the host on big-sf runs: a quadratic oracle once reached
# 112 GB RSS on a 128 GB box before the per-oracle timeout could fire
mem = os.environ.get("DUCKDB_MEM")
if mem:
    con.execute(f"SET memory_limit='{mem}'")
    # no spill-to-disk: a quadratic oracle should FAIL FAST (reported as
    # oracle-infeasible below), not fill the volume with temp storage
    con.execute("SET temp_directory=''")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.isdir(p):          # Spark-written table = directory of parts
        p = f"{p}/*.parquet"
    elif not os.path.exists(p):   # partial dataset (subset runs): skip
        continue
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def canon(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)))
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(rows), list(df.columns), h

# Fast path for multi-million-row entries (sf10 campaign: q14_gapfill is
# 108M rows — the pandas repr-sort canon above would need tens of GB and
# ~an hour per side). Both sides of the compare are already read through
# DuckDB, so the canonical fingerprint can be computed IN DuckDB: columns
# sorted by name, every value cast to VARCHAR with a NULL sentinel,
# rows reduced order-free via count + sum(hash(row)). Enabled per run:
# FASTHASH_MIN=200000 (row threshold; 0/unset = always the pandas path).
fasthash_min = int(os.environ.get("FASTHASH_MIN", "0"))

def duck_cols(rel_sql: str) -> list:
    return sorted(r[0] for r in con.execute(f"DESCRIBE {rel_sql}").fetchall())

def duck_canon(rel_sql: str, budget) -> tuple:
    cols = duck_cols(rel_sql)
    row = ", ".join(
        f"COALESCE(CAST(\"{c}\" AS VARCHAR), chr(30))" for c in cols)
    # bit_xor, not sum: sum(hash) aggregates to HUGEINT, which pandas
    # narrows to float64 and silently drops the low ~40 bits; xor stays
    # an exact UBIGINT and is equally order-free
    q = (f"SELECT count(*), bit_xor(hash(concat_ws(chr(31), {row}))) "
         f"FROM ({rel_sql}) _t")
    n, h = oracle_fp_exec(q, budget)
    return n, cols, h

def oracle_fp_exec(q, budget):
    r = oracle_df(q, budget)
    n = int(r.iloc[0, 0])
    h = r.iloc[0, 1]
    return n, ("0" if n == 0 else format(int(h) & ((1 << 64) - 1), "016x"))

sql = json.load(open(f"{out}/oracle_sql.json"))
# Bounded campaign twins (oracle_sql_bounded.json: name -> {oracle,
# engine_where}) for entries whose FULL twin is quadratic and infeasible
# at big sf: the twin restricts the verdict side to a deterministic md5
# doc sample (partner side stays full), and engine_where applies the
# IDENTICAL predicate to the engine's dumped parquet, so the compare is
# still exact — just over the sampled verdict rows. BOUNDED_ORACLES:
#   auto (default) — engage a bounded twin only when the full twin
#                    fails (timeout/OOM); the artifact records
#                    oracle_mode=bounded_sample + the full twin's error;
#   force          — additionally run every bounded twin even when the
#                    full twin succeeded (gate-decade validation that
#                    bounded == engine-filtered; mismatch fails the run);
#   off            — never engage them (pre-round-16 behavior).
bounded_mode = os.environ.get("BOUNDED_ORACLES", "auto")
bounded = {}
bpath = f"{out}/oracle_sql_bounded.json"
if bounded_mode != "off" and os.path.exists(bpath):
    bounded = json.load(open(bpath))
# optional per-oracle wall-clock cap (seconds) for big-sf runs where a
# deliberately-unscalable oracle (brute-force pairwise) would never end:
# ORACLE_TIMEOUT=600 python3 tools/verify_local.py ...
timeout_s = int(os.environ.get("ORACLE_TIMEOUT", "0"))
# per-entry overrides for campaign runs where a handful of known-
# quadratic twins deserve a SHORTER budget than the fleet default (they
# will time out either way — the override just stops them burning the
# whole campaign's wall-clock; the artifact records the bound honestly):
# ORACLE_TIMEOUT_OVERRIDES='{"llm_pipeline": 300}' ...
overrides = json.loads(os.environ.get("ORACLE_TIMEOUT_OVERRIDES", "{}"))
import threading
def oracle_df(q, budget):
    if not budget:
        return con.execute(q).df()
    timer = threading.Timer(budget, con.interrupt)
    timer.start()
    try:
        return con.execute(q).df()
    finally:
        timer.cancel()
# --json <path>: emit the driver-shaped per-entry artifact (plus an
# explicit status field: ok | mismatch | oracle_infeasible | rows_only)
# so campaign runs above the driver's scales (e.g. sf1) are committed
# machine-readably instead of as prose (round-13 verdict, Missing #2)
json_out = None
if "--json" in sys.argv:
    json_out = sys.argv[sys.argv.index("--json") + 1]
report = {}
ok = bad = skipped = 0

def resource_err(e) -> bool:
    """True for errors that mean 'this oracle is infeasible at this scale'
    (timeout interrupt, OOM, overflow) as opposed to a genuine SQL/binder
    bug. Only resource-class errors may engage the bounded fallback —
    otherwise a broken full twin could silently reroute to a green
    bounded compare (round-16 advice)."""
    if isinstance(e, duckdb.InterruptException):
        return True
    m = str(e).lower()
    return any(k in m for k in ("memory", "allocat", "out of range",
                                "overflow", "interrupt", "no space"))

def bounded_compare(name, eng_rel, budget):
    """Run a bounded twin; returns (status, entry_fields) or raises.

    Two twin shapes share this path: md5-sample twins (engine_where
    restricts both sides to the sampled verdict rows) and engine-pair-fed
    twins ('{OUT}' in the oracle SQL — the twin consumes the engine's own
    dumped llm_dedup_ngram pair table, so the compare is exact over the
    FULL output, conditional on the pair table that the same campaign
    verifies via llm_dedup_ngram's sampled twin)."""
    b = bounded[name]
    oracle_sql = b["oracle"].replace("{OUT}", out)
    mode = "engine_pairs" if "{OUT}" in b["oracle"] else "bounded_sample"
    beng = f"SELECT * FROM ({eng_rel}) _e WHERE {b['engine_where']}"
    n_eng = con.execute(f"SELECT count(*) FROM ({beng})").fetchone()[0]
    if fasthash_min and n_eng >= fasthash_min:
        # engine-pair-fed twins compare the FULL output (llm_dedup_apply
        # is corpus-sized) — same in-DuckDB canonical fingerprint as the
        # main compare's fast path
        ng, cg, hg = duck_canon(beng, 0)
        nw, cw, hw = duck_canon(oracle_sql, budget)
    else:
        got = con.execute(beng).df()
        want = oracle_df(oracle_sql, budget)
        ng, cg, hg = canon(got)
        nw, cw, hw = canon(want)
    st = "ok" if (ng, cg, hg) == (nw, cw, hw) else "mismatch"
    return st, {"rows_match": ng == nw, "schema_match": cg == cw,
                "hash_match": hg == hw, "bounded_rows": ng,
                "oracle_rows": nw, "bounded_hash": hg,
                "oracle_mode": mode}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    eng_rel = f"SELECT * FROM '{d}/*.parquet'"
    eng_rows = con.execute(f"SELECT count(*) FROM ({eng_rel})").fetchone()[0]
    if name not in sql:
        print(f"  {name:24s} rows-only: {eng_rows} rows")
        report[name] = {"status": "rows_only", "spark_rows": eng_rows}
        continue
    budget = overrides.get(name, timeout_s)
    fast = bool(fasthash_min) and eng_rows >= fasthash_min
    try:
        if fast:
            ng, cg, hg = duck_canon(eng_rel, 0)
            nw, cw, hw = duck_canon(sql[name], budget)
        else:
            got = con.execute(eng_rel).df()
            want = oracle_df(sql[name], budget)
            ng, cg, hg = canon(got)
            nw, cw, hw = canon(want)
    except (duckdb.InterruptException, duckdb.Error) as e:
        msg = (f"oracle exceeded {budget}s"
               if isinstance(e, duckdb.InterruptException)
               else str(e).splitlines()[0][:120])
        if not resource_err(e):
            # a genuine SQL/binder bug in the full twin must fail loudly,
            # never reroute to a green bounded compare (round-16 advice)
            bad += 1
            print(f"✗ {name:24s} ORACLE ERROR (non-resource, fix the SQL): {msg}")
            report[name] = {"status": "oracle_error", "spark_rows": eng_rows,
                            "err": msg}
            continue
        if name in bounded:
            try:
                st, fields = bounded_compare(name, eng_rel, budget)
                report[name] = {"status": st, "spark_rows": eng_rows,
                                "full_oracle_err": msg, "err": None, **fields}
                if st == "ok":
                    ok += 1
                    print(f"✓ {name:24s} BOUNDED rows={fields['bounded_rows']} "
                          f"hash={fields['bounded_hash']} "
                          f"(full engine rows={eng_rows}; full oracle: {msg})")
                else:
                    bad += 1
                    print(f"✗ {name:24s} BOUNDED mismatch: {fields}")
                continue
            except (duckdb.InterruptException, duckdb.Error) as e2:
                msg += f"; bounded twin also failed: {str(e2).splitlines()[0][:120]}"
        skipped += 1
        print(f"⏱ {name:24s} oracle infeasible at this sf — skipped "
              f"(engine rows={eng_rows}): {msg}")
        report[name] = {"status": "oracle_infeasible", "spark_rows": eng_rows,
                        "err": msg}
        continue
    full_ok = (ng, cg, hg) == (nw, cw, hw)
    report[name] = {"status": "ok" if full_ok else "mismatch",
                    "rows_match": ng == nw, "schema_match": cg == cw,
                    "hash_match": hg == hw, "spark_rows": ng,
                    "oracle_rows": nw, "err": None}
    if fast:
        report[name]["hash_mode"] = "duckdb"
    if bounded_mode == "force" and name in bounded:
        # gate-decade validation: the bounded twin must agree with the
        # engine output filtered by the identical sample predicate. The
        # verdict folds into THIS entry's single ok/bad tally (a bounded
        # divergence makes the entry bad even when the full compare
        # passed) — no double counting (round-16 advice).
        st2, fields2 = bounded_compare(name, eng_rel, budget)
        report[name]["bounded_check"] = st2
        report[name]["bounded_rows"] = fields2["bounded_rows"]
        if st2 != "ok":
            report[name]["status"] = "mismatch"
            full_ok = False
            print(f"✗ {name:24s} bounded twin DIVERGES from engine-filtered: "
                  f"{fields2}")
    if full_ok:
        print(f"✓ {name:24s} rows={ng} hash={hg}" + (" (duckdb)" if fast else ""))
        ok += 1
    else:
        bad += 1
        if (ng, cg, hg) != (nw, cw, hw):
            print(f"✗ {name:24s} got(rows={ng},cols={cg},h={hg}) want(rows={nw},cols={cw},h={hw})")
            if not fast:
                merged = got[sorted(got.columns)].merge(want[sorted(want.columns)],
                         how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(6).to_string())
if json_out:
    with open(json_out, "w") as f:
        json.dump({"sf_dir": sf, "entries": report,
                   "summary": {"ok": ok, "bad": bad,
                               "oracle_infeasible": skipped,
                               "oracles": len(sql)}}, f, indent=1, sort_keys=True)
    print(f"[verify_local] wrote {json_out}")
extra = f", {skipped} oracle-timeout" if skipped else ""
print(f"\n{ok} ok, {bad} bad{extra}, {len(sql)} oracles")
sys.exit(1 if bad else 0)
