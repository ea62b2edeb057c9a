"""Attribute device time in an existing /tmp/jax_trace dump by source line.

Reads the newest vm.trace.json.gz produced by tools/profile_trace.py and
aggregates TensorCore op durations by the `source` arg (file:line) that XLA
records per fused op, falling back to the op name. Divides by the step count
given as argv[1] (default 10).
"""
import collections
import glob
import gzip
import json
import sys

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
files = sorted(glob.glob("/tmp/jax_trace/**/*.trace.json.gz", recursive=True))
assert files, "no trace found — run tools/profile_trace.py first"
with gzip.open(files[-1], "rt") as fh:
    data = json.load(fh)

dev_pids = set()
for ev in data.get("traceEvents", []):
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        nm = ev.get("args", {}).get("name", "")
        if "TPU" in nm and "host" not in nm.lower():
            dev_pids.add(ev["pid"])

agg = collections.Counter()
names = collections.defaultdict(collections.Counter)
total = 0.0
for ev in data.get("traceEvents", []):
    if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
        continue
    name = ev.get("name", "")
    if name.startswith(("while", "jit_run", "jit(")):
        continue  # enclosing regions double-count their children
    args = ev.get("args", {}) or {}
    src = args.get("source") or args.get("tf_op") or ""
    if isinstance(src, str) and "/" in src:
        src = "/".join(src.split("/")[-2:])
    key = src if src else "<no-source>"
    dur = ev.get("dur", 0) / 1e3
    agg[key] += dur
    names[key][name.split(".")[0]] += dur
    total += dur

print(f"total attributed: {total/steps:.2f} ms/step over {steps} steps\n")
for key, ms in agg.most_common(45):
    top = ", ".join(f"{n}:{d/steps:.2f}" for n, d in
                    names[key].most_common(3))
    print(f"{ms/steps:8.3f} ms/step  {key}   [{top}]")
