"""Aggregate a jax.profiler trace (from exp_profile_sliding) into epilogue
categories: Pallas kernels vs XLA network vs sliding-window epilogue pieces.

Run: python experiments/exp_trace_agg.py /tmp/prof_slide_quad
"""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def main():
    tdir = sys.argv[1]
    files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    pids = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    by_name = defaultdict(float)
    meta = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pids.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = ev.get("name", "?")
        by_name[name] += ev.get("dur", 0) / 1e3
        if name not in meta:
            args = ev.get("args", {}) or {}
            longn = (args.get("long_name") or args.get("tf_op")
                     or args.get("hlo_op") or "")
            if longn:
                meta[name] = str(longn)

    cat = defaultdict(float)
    catn = defaultdict(int)
    samples = defaultdict(list)
    for name, ms in by_name.items():
        if name.startswith(("jit_", "while")) or name in ("?",):
            continue
        ln = meta.get(name, "")
        if re.match(r"^(block|qstride|qfused|pallas)", name):
            c = "pallas:" + name.split(".")[0]
        elif "dynamic-update-slice" in ln or name.startswith(
                "dynamic_update_slice"):
            c = "epilogue:acc-DUS"
        elif "dynamic-slice" in ln or name.startswith("dynamic_slice"):
            c = "epilogue:acc-DS"
        elif re.search(r"f32\[1,64,2,2,2,16,64,64\]", ln):
            c = "epilogue:dequadrantize"
        elif re.search(r"f32\[1,64,(8,16,4224|128,4224)\]", ln):
            c = "epilogue:softmax-add"
        elif re.search(r"f16\[128,128,128,16\]|f16\[192,192,192", ln):
            c = "epilogue:contrib/acc"
        elif name.startswith("copy"):
            c = "copy:" + (re.search(r"(bf16|f32|f16)\[[^\]]*\]", ln)
                           or ["?"])[0][:40]
        elif name.startswith(("fusion", "add", "reshape", "bitcast",
                              "convolution", "transpose", "select",
                              "reverse", "concatenate", "slice", "pad",
                              "broadcast", "multiply", "reduce",
                              "exponential", "divide", "subtract",
                              "maximum", "convert", "scatter", "gather",
                              "iota", "compare", "rem", "all-")):
            m = re.search(r"(bf16|f32|f16|s32|u32|pred)\[[0-9,]*\]", ln)
            c = "xla:" + name.split(".")[0] + ":" + (m[0][:44] if m else "?")
        else:
            c = "other:" + name.split(".")[0]
        cat[c] += ms
        catn[c] += 1
        if len(samples[c]) < 2:
            samples[c].append(f"{name} {ms:.2f}ms {ln[:130]}")

    total = sum(cat.values())
    print(f"categorized device time: {total:.1f} ms")
    for c, ms in sorted(cat.items(), key=lambda kv: -kv[1]):
        if ms < 2:
            continue
        print(f"  {ms:9.2f} ms  x{catn[c]:4d}  {c}")
    print("--- samples of big categories")
    for c, ms in sorted(cat.items(), key=lambda kv: -kv[1])[:18]:
        print(f"[{c}] {ms:.1f} ms")
        for s in samples[c]:
            print("   ", s)


if __name__ == "__main__":
    main()
