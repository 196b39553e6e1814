#!/usr/bin/env python
"""Dump the top individual device ops with their provenance args from the
last captured trace (run tools/profile_trace.py first, or pass a dir)."""
import glob
import gzip
import json
import sys
from collections import defaultdict

tdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fountain_trace"
files = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))
assert files, f"no trace under {tdir}"
with gzip.open(files[-1], "rt") as f:
    tr = json.load(f)
events = tr.get("traceEvents", [])

agg = defaultdict(float)
cnt = defaultdict(int)
sample_args = {}
for e in events:
    if e.get("ph") != "X":
        continue
    args = e.get("args", {})
    if "run_id" not in args and "hlo_category" not in args:
        continue
    name = e.get("name", "")
    cat = args.get("hlo_category", "")
    if "custom" not in cat and "custom" not in name:
        continue
    key = name
    agg[key] += e.get("dur", 0) / 1e3
    cnt[key] += 1
    if key not in sample_args:
        sample_args[key] = args

rows = sorted(agg.items(), key=lambda kv: -kv[1])
for k, v in rows[:25]:
    a = sample_args[k]
    prov = a.get("long_name") or a.get("tf_op") or a.get("source") or ""
    print(f"{v:9.2f} ms x{cnt[k]:<4d} {k}")
    for field in ("long_name", "tf_op", "source", "hlo_module",
                  "expression"):
        if field in a:
            print(f"           {field}: {str(a[field])[:300]}")
