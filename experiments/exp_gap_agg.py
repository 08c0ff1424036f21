"""Device-timeline gap analysis of a jax.profiler trace: busy vs idle,
largest inter-event gaps and their flanking ops. For diagnosing the
async-dispatch stall of the lazy-up model program (wall ~700 ms/rep vs
~29 ms device busy).

Run: python experiments/exp_gap_agg.py /tmp/prof_lazy2
"""
import glob
import gzip
import json
import sys


def main():
    tdir = sys.argv[1]
    files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    pids = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    evs = []
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pids.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        evs.append((ev["ts"], ev["ts"] + ev.get("dur", 0),
                    ev.get("name", "?")))
    if not evs:
        print("no device events")
        return
    evs.sort()
    span = evs[-1][1] - evs[0][0]
    # merge busy intervals
    busy = 0.0
    cur_s, cur_e = evs[0][0], evs[0][1]
    gaps = []
    prev_name = evs[0][2]
    for s, e, name in evs[1:]:
        if s > cur_e:
            gaps.append((s - cur_e, cur_e, prev_name, name))
            busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
        prev_name = name
    busy += cur_e - cur_s
    print(f"device events: {len(evs)}  span {span/1e3:.1f} ms  "
          f"busy {busy/1e3:.1f} ms  idle {(span-busy)/1e3:.1f} ms")
    gaps.sort(reverse=True)
    print("top gaps (ms, after-op -> before-op):")
    for g, _t, a, b in gaps[:15]:
        print(f"  {g/1e3:9.2f}  {a[:60]} -> {b[:60]}")
    # also: how many times does each op name start a post-gap region?
    from collections import Counter
    c = Counter(b for g, _t, a, b in gaps if g > 5e3)
    print("ops following >5ms gaps:", dict(c.most_common(8)))


if __name__ == "__main__":
    main()
