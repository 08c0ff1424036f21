"""Profile the fused-level-0 model forward on TPU and print the top ops by
self time (parsed from the jax.profiler trace).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_profile_fwd.py [--no_fused]
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    fused = "--no_fused" not in sys.argv
    quadrant = "--quadrant" in sys.argv
    max_level = 0 if "--max_level0" in sys.argv else 1
    patch = (128, 128, 128)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, *patch, 1),
                          jnp.float32).astype(jnp.bfloat16)
    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=16,
        pool_op_kernel_sizes=((2, 2, 2),) * 5,
        base_num_features=48, compute_dtype=jnp.bfloat16,
        fused=fused, fused_max_level=max_level, quadrant=quadrant)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x)

    def step(c, _):
        y = model.apply(params, c, do_ds=False)
        return c + jnp.mean(y).astype(c.dtype), None

    g = jax.jit(lambda x0: jax.lax.scan(step, x0, None, length=5)[0])
    jax.block_until_ready(g(x))
    tdir = ("/tmp/prof_fwd_" + ("fused" if fused else "xla")
            + ("_quad" if quadrant else ""))
    jax.profiler.start_trace(tdir)
    t0 = time.time()
    jax.block_until_ready(g(x))
    dt = (time.time() - t0) / 5 * 1000
    jax.profiler.stop_trace()
    log(f"fwd: {dt:.1f} ms; trace -> {tdir}")

    # parse the trace: accumulate device-op durations by name
    files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        log("no trace found:", glob.glob(tdir + "/**/*", recursive=True)[:20])
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    by_name = defaultdict(float)
    total = 0.0
    pids = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pids.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # ms
        by_name[name] += dur
        total += dur
    log(f"total device op time: {total:.1f} ms over 5 iters")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:35]:
        log(f"  {ms/5:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
