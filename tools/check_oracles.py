#!/usr/bin/env python3
"""Local parity check: run each oracle_sql.json query in DuckDB over the
same parquet tables and compare with the Verify parquet dumps.
(Developer tool only — mirrors the driver's t2 gate.)"""
import sys, json, glob, os
import duckdb, pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# optional subset: check only the named queries. Source of truth is the
# verify_only.json manifest Verify writes alongside a SPARK_GRAFT_VERIFY_ONLY
# dump (deleted again by a full run) — picked up automatically, so a subset
# gate never misreads non-dumped queries as regressions. An explicit third
# argument overrides the manifest.
only = None
if len(sys.argv) > 3:
    # an explicit third argument always wins over the manifest; "" or
    # "all" forces the FULL check even when a verify_only.json is present
    arg = sys.argv[3]
    if arg and arg.lower() != "all":
        only = set(arg.split(","))
elif os.path.exists(f"{outdir}/verify_only.json"):
    only = set(json.load(open(f"{outdir}/verify_only.json")))
    print(f"[subset gate: {len(only)} queries from verify_only.json]")
fails, passes = [], []
if only is not None:
    # a subset name with no oracle is a FAILURE, not a silent shrink —
    # otherwise a typo'd list reads as "0 pass, 0 fail" and looks green
    for name in sorted(only - set(oracle)):
        fails.append((name, "NOT IN oracle_sql.json"))
    oracle = {k: v for k, v in oracle.items() if k in only}
if not oracle:
    fails.append(("<suite>", "EMPTY ORACLE SET after subset filter"))
for name, sql in sorted(oracle.items()):
    pdir = f"{outdir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        fails.append((name, "NO SPARK OUTPUT"))
        continue
    try:
        want = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        fails.append((name, f"DUCKDB ERROR: {e}"))
        continue
    got = pq.read_table(files[0])
    wcols, gcols = sorted(want.column_names), sorted(got.column_names)
    if wcols != gcols:
        fails.append((name, f"SCHEMA NAMES: duck={wcols} spark={gcols}"))
        continue
    if want.num_rows != got.num_rows:
        fails.append((name, f"ROWS: duck={want.num_rows} spark={got.num_rows}"))
        continue
    # compare as sorted-by-columns lists of tuples (order-insensitive)
    def norm(tbl):
        rows = list(zip(*[tbl.column(c).to_pylist() for c in sorted(tbl.column_names)]))
        return sorted(map(str, rows))
    w, g = norm(want), norm(got)
    if w != g:
        diffs = [(a, b) for a, b in zip(w, g) if a != b][:3]
        fails.append((name, f"VALUES differ, e.g. duck~spark: {diffs}"))
        continue
    # type check (loose): report but don't fail on int32/int64 mismatches
    wt = {c: str(want.schema.field(c).type) for c in wcols}
    gt = {c: str(got.schema.field(c).type) for c in gcols}
    tdiff = {c: (wt[c], gt[c]) for c in wcols if wt[c] != gt[c]}
    passes.append((name, want.num_rows, tdiff))

for name, n, tdiff in passes:
    print(f"PASS {name} ({n} rows)" + (f"  [type diff: {tdiff}]" if tdiff else ""))
print()
for name, msg in fails:
    print(f"FAIL {name}: {msg[:300]}")
print(f"\n{len(passes)} pass, {len(fails)} fail")
sys.exit(1 if fails else 0)
