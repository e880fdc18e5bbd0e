#!/usr/bin/env python3
"""Driver-mimicking correctness compare: for each parquet in OUTDIR produced by
graft.Verify, run the matching oracle SQL from oracle_sql.json in DuckDB over
the sfDir tables, sort columns by name, and compare values (floats exact —
both sides must round; we report first diff)."""
import json, sys, math
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
import os
results = {}
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        results[name] = f"ROWS_ONLY rows={len(got)}"
        continue
    exp = con.sql(oracle[name]).df()
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        results[name] = f"SCHEMA_MISMATCH got={list(got.columns)} exp={list(exp.columns)}"
        continue
    if len(got) != len(exp):
        results[name] = f"ROWCOUNT got={len(got)} exp={len(exp)}"
        continue
    ok = True
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (g, e) in enumerate(zip(gv, ev)):
            eq = (g == e)
            try:
                if not eq and isinstance(g, float) and isinstance(e, float):
                    eq = (math.isnan(g) and math.isnan(e)) or g == e
            except Exception:
                pass
            if not eq and str(g) != str(e):
                results[name] = f"VALUE_DIFF col={c} row={i} got={g!r} exp={e!r}"
                ok = False
                break
        if not ok:
            break
    if ok:
        results[name] = f"OK rows={len(got)}"

fails = {k: v for k, v in results.items() if not (v.startswith("OK") or v.startswith("ROWS_ONLY"))}
for k, v in sorted(results.items()):
    print(f"{k:24s} {v}")
print(f"\n{len(results)-len(fails)}/{len(results)} pass, {len(fails)} fail")
sys.exit(1 if fails else 0)
