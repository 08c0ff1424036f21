"""Profile the bench sliding-window program (tiled + TTA8 + Gaussian
accumulate) and print top device ops — finds predictor-boundary costs the
plain fwd profile can't see (tile gather, flips, de-quadrantize, scatter).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/exp_profile_sliding.py [--quadrant] [--no_fused] \
    [--flip_free] [--accum_f16]
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

from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
from e2enet_tpu.ops.sliding import (compute_steps_for_sliding_window,
                                    make_tiled_predictor,
                                    predict_volume_tiled)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    fused = "--no_fused" not in sys.argv
    quadrant = "--quadrant" in sys.argv
    patch = (128, 128, 128)
    vol_shape = (192, 192, 192)
    num_classes = 16
    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=num_classes,
        pool_op_kernel_sizes=((2, 2, 2),) * 5,
        base_num_features=48, compute_dtype=jnp.bfloat16,
        fused=fused, quadrant=quadrant, quadrant_logits=quadrant,
        quadrant_input=patch if quadrant else None,
        # match the bench fast mode (fused seg-head softmax kernel)
        head_probs_dtype=(jnp.bfloat16
                          if "--head_probs" in sys.argv else None))
    x0 = jnp.zeros((1, *patch, 1), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    if "--sparse_density" in sys.argv:
        d = float(sys.argv[sys.argv.index("--sparse_density") + 1])
        from e2enet_tpu.models.sparse_plan import build_sparse_plan
        from e2enet_tpu.training import dsff
        masks = dsff.init_masks_row(params["params"], d,
                                    jax.random.PRNGKey(7),
                                    density_48_override=d)
        params = {"params": dsff.apply_masks(params["params"], masks)}
        plan = build_sparse_plan(masks)
        assert plan
        model = model.clone(sparse_plan=plan)
        log(f"row-sparse plan: {len(plan)} convs at density {d:g}")
    apply_fn = lambda p, x: model.apply(p, x, do_ds=False)
    qmeta = (((2, 2, 2), patch[1] // 2, patch[2] // 2)
             if quadrant else None)
    accum = jnp.float16 if "--accum_f16" in sys.argv else jnp.float32
    mirror_fns = None
    if "--flip_free" in sys.argv:
        from e2enet_tpu.inference.predictor import mirror_apply_fns_for
        mirror_fns = mirror_apply_fns_for(model, wrap_params=False)
    predictor = make_tiled_predictor(apply_fn, patch, num_classes,
                                     mirror_axes=(0, 1, 2),
                                     do_mirroring=True,
                                     quadrant_meta=qmeta,
                                     accum_dtype=accum,
                                     prob_dtype=(jnp.bfloat16
                                                 if accum == jnp.float16
                                                 else None),
                                     mirror_apply_fns=mirror_fns)
    vol = np.random.RandomState(0).randn(1, *vol_shape).astype(np.float32)

    def run():
        return predict_volume_tiled(
            apply_fn, params, vol, patch, num_classes, step_size=0.5,
            do_mirroring=True, predictor=predictor)

    r = run()  # compile
    np.asarray(r)
    tag = ("quad" if quadrant else ("fused" if fused else "xla"))
    tdir = f"/tmp/prof_slide_{tag}"
    jax.profiler.start_trace(tdir)
    t0 = time.time()
    np.asarray(run())
    dt = (time.time() - t0) * 1000
    jax.profiler.stop_trace()
    log(f"sliding-window volume: {dt:.1f} ms "
        f"({dt/64:.1f} ms per TTA pass); trace -> {tdir}")

    files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        log("no trace found")
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    pids = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    by_name = defaultdict(float)
    total = 0.0
    tmin, tmax = None, None
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pids.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3
        ts = ev.get("ts", 0)
        tmin = ts if tmin is None else min(tmin, ts)
        tmax = max(tmax or 0, ts + ev.get("dur", 0))
        by_name[name] += dur
        total += dur
    log(f"total device op time: {total:.1f} ms; device busy span: "
        f"{(tmax - tmin)/1e3 if tmin is not None else 0:.1f} ms")
    shown = 0.0
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:90]:
        shown += ms
        log(f"  {ms:8.3f} ms  {name[:110]}")
    log(f"(top-90 leaves sum {shown:.1f} ms)")

    # attribution: first 'long_name' seen per op so anonymous fusions can
    # be tied to their HLO shapes/operands
    meta = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "?")
        if name in meta:
            continue
        args = ev.get("args", {}) or {}
        longn = (args.get("long_name") or args.get("tf_op")
                 or args.get("hlo_op") or "")
        if longn:
            meta[name] = str(longn)[:220]
    log("--- attribution (top 40 by time)")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        log(f"  {ms:8.3f} ms  {name[:44]}  {meta.get(name, '')}")


if __name__ == "__main__":
    main()
