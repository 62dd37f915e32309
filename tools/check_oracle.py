import duckdb, json, glob, os, sys
import pyarrow.parquet as pq
import pandas as pd

import os
sfdir = os.environ.get("SFDIR", "/root/testdata/sf0.01")
out = os.environ.get("VOUT", "/tmp/verify_out")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fail += 1; continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fail += 1; continue
    sdf = pq.read_table(files).to_pandas()
    # driver-style: sort columns by name
    odf = odf[sorted(odf.columns)].reset_index(drop=True)
    sdf = sdf[sorted(sdf.columns)].reset_index(drop=True)
    if list(odf.columns) != list(sdf.columns):
        print(f"{name}: COLUMN MISMATCH oracle={list(odf.columns)} spark={list(sdf.columns)}"); fail += 1; continue
    if len(odf) != len(sdf):
        print(f"{name}: ROWCOUNT oracle={len(odf)} spark={len(sdf)}"); fail += 1; continue
    ok = True
    for c in odf.columns:
        a, b = odf[c], sdf[c]
        try:
            if a.dtype == object or b.dtype == object:
                av = a.apply(lambda x: list(x) if hasattr(x, '__len__') and not isinstance(x, str) else x)
                bv = b.apply(lambda x: list(x) if hasattr(x, '__len__') and not isinstance(x, str) else x)
                eq = (av.astype(str) == bv.astype(str)).all()
            else:
                eq = a.equals(b) or ((a.isna() == b.isna()).all() and (a.dropna().astype(float).values == b.dropna().astype(float).values).all())
        except Exception as e:
            print(f"{name}.{c}: compare error {e}"); eq = False
        if not eq:
            ok = False
            m = (a.astype(str) != b.astype(str))
            idx = m[m].index[:3]
            print(f"{name}: VALUE MISMATCH col={c} dtype o={a.dtype} s={b.dtype}")
            for i in idx:
                print(f"   row{i}: oracle={a[i]!r} spark={b[i]!r}")
    if ok:
        print(f"{name}: OK ({len(odf)} rows)")
    else:
        fail += 1
sys.exit(1 if fail else 0)
