#!/usr/bin/env python3
"""check_oracle.py restricted to a comma-separated query list (ONLY env
var) — the fast iteration loop for optimization rounds: run graft.Verify
with the same filter, then compare just those queries instead of paying
the full 259-oracle DuckDB sweep.  Usage:

  ONLY=q_dsir,q_nb_classify SFDIR=... VOUT=... python3 tools/check_oracle_only.py
"""
import json
import os
import sys

only = set(filter(None, os.environ.get("ONLY", "").split(",")))
out = os.environ.get("VOUT", "/tmp/verify_out")
path = f"{out}/oracle_sql.json"
oracle = json.load(open(path))
filtered = {k: v for k, v in oracle.items() if not only or k in only}
json.dump(filtered, open(path, "w"))
sys.argv = [sys.argv[0]]
exec(open(os.path.join(os.path.dirname(__file__), "check_oracle.py")).read())
