"""Time each SparkEntry.oracleSql replica in DuckDB, sorted slowest-first.

The driver's correctness gate runs every oracle serially; a multi-minute
tail (q_mmr's 8-step greedy replay was ~6 min at sf0.1) makes the gate
timeout-fragile as `queries` grows. This profiler is the feedback loop
for cutting that tail: run it at sf0.01 and sf0.1, commit the report,
and rewrite any oracle over the budget.

Usage: SFDIR=/root/testdata/sf0.1 VOUT=/tmp/verify_out \
       python3 tools/profile_oracle.py [report.tsv]
"""
import duckdb, json, os, sys, time

sfdir = os.environ.get("SFDIR", "/root/testdata/sf0.01")
out = os.environ.get("VOUT", "/tmp/verify_out")
report = sys.argv[1] if len(sys.argv) > 1 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
rows = []
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        n = len(con.execute(sql).fetchdf())
        err = ""
    except Exception as e:
        n, err = -1, str(e).split("\n")[0][:120]
    dt = time.time() - t0
    rows.append((dt, name, n, err))
    print(f"{dt:9.2f}s  {name}  rows={n}  {err}", flush=True)

rows.sort(reverse=True)
total = sum(r[0] for r in rows)
lines = [f"# oracle profile  sfdir={sfdir}  total={total:.1f}s  n={len(rows)}",
         "sec\tname\trows\terror"]
lines += [f"{dt:.2f}\t{name}\t{n}\t{err}" for dt, name, n, err in rows]
text = "\n".join(lines) + "\n"
print("\n==== slowest 15 ====")
for dt, name, n, err in rows[:15]:
    print(f"{dt:9.2f}s  {name}")
print(f"TOTAL {total:.1f}s over {len(rows)} oracles")
if report:
    open(report, "w").write(text)
    print(f"wrote {report}")
