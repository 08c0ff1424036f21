"""Profile the fused train step (Heart geometry) and print top device ops.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_profile_train.py [--no_fused]
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus, ds_loss_weights
from e2enet_tpu.training.train_state import (create_train_state,
                                             make_train_step)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    fused = "--no_fused" not in sys.argv
    patch = (80, 192, 160)
    pools = ((2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2))
    n_classes, B = 3, 2
    max_level = 1 if "--max_level1" in sys.argv else 0
    quadrant = "--quadrant" in sys.argv
    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=n_classes,
        pool_op_kernel_sizes=pools, base_num_features=48,
        compute_dtype=jnp.bfloat16, fused=fused, fused_max_level=max_level,
        quadrant=quadrant, remat="--no_remat" not in sys.argv)
    x = jnp.zeros((B, *patch, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    state = create_train_state(params)
    weights = ds_loss_weights(len(pools), model.num_ds_outputs())
    step = make_train_step(model, weights, batch_dice=True)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(B, *patch, 1).astype(np.float32))
    tgts = []
    shape = np.array(patch)
    for i in range(model.num_ds_outputs()):
        tgts.append(jnp.asarray(
            rng.randint(0, n_classes, (B, *shape.astype(int))), jnp.int32))
        shape = shape // np.array(pools[i])
    tgts = tuple(tgts)

    state, m = step(state, data, tgts, 1e-2)
    jax.block_until_ready(m["loss"])
    tdir = f"/tmp/prof_train_{'fused' if fused else 'xla'}"
    jax.profiler.start_trace(tdir)
    t0 = time.time()
    for _ in range(3):
        state, m = step(state, data, tgts, 1e-2)
    jax.block_until_ready(m["loss"])
    dt = (time.time() - t0) / 3 * 1000
    jax.profiler.stop_trace()
    log(f"train step: {dt:.0f} ms")

    files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    pids = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    by = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if "TPU" not in pids.get(ev.get("pid"), ""):
            continue
        dur = ev.get("dur", 0) / 1e3
        by[ev.get("name", "?")] += dur
        total += dur
    log(f"total device op-time {total:.0f} ms / 3 iters")
    # group by op family
    fam = defaultdict(float)
    for name, ms in by.items():
        base = name.split(".")[0]
        fam[base] += ms
    for name, ms in sorted(fam.items(), key=lambda kv: -kv[1])[:20]:
        log(f"  {ms/3:9.2f} ms  {name}")
    log("--- top individual ops")
    for name, ms in sorted(by.items(), key=lambda kv: -kv[1])[:25]:
        log(f"  {ms/3:9.2f} ms  {name[:90]}")

    # attribute copies/fusions: collect the 'long_name'/'tf_op' metadata
    # XLA attaches to trace events so data-movement ops can be tied to
    # their HLO source
    meta = defaultdict(lambda: [0.0, ""])
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "TPU" not in pids.get(ev.get("pid"), ""):
            continue
        name = ev.get("name", "?")
        base = name.split(".")[0]
        if base not in ("copy", "fusion", "reshape", "broadcast",
                        "pad_convert_fusion", "slice_bitcast_fusion",
                        "bitcast_convert_fusion", "transpose"):
            continue
        args = ev.get("args", {}) or {}
        longn = (args.get("long_name") or args.get("tf_op")
                 or args.get("hlo_op") or "")
        m = meta[name]
        m[0] += ev.get("dur", 0) / 1e3
        if longn and not m[1]:
            m[1] = str(longn)[:200]
    log("--- data-movement attribution (top 30)")
    for name, (ms, longn) in sorted(meta.items(), key=lambda kv: -kv[1][0])[:30]:
        log(f"  {ms/3:9.2f} ms  {name[:40]}  {longn}")


if __name__ == "__main__":
    main()
