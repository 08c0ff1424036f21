"""Hardware gradient-parity check for the Pallas backward kernels.

Run on the real TPU chip (axon backend):

    env PYTHONPATH=/root/repo:/root/.axon_site python -u \
        experiments/tpu_grad_parity.py > /tmp/grad_parity.log 2>&1

Two levels of evidence, both on real hardware (no interpret mode):

1. SINGLE BLOCK: grads of one fused_shift_conv_block (x, w, b and the
   on-load affine mult/off — the small-accumulator outputs with separate
   failure modes, PERF_NOTES.md) vs the XLA-path VJP at identical bf16
   compute. One block has no depth of error amplification, so a genuine
   Mosaic miscompile (OOB windows, uninitialized slots — errors O(1) or
   1e38) is unmistakable against bf16 rounding (~1e-2).

2. FULL MODEL with a noise floor: whole-net grads are NOT comparable at a
   fixed tolerance in bf16 (a 2^-8 rounding flip at level 0 reshuffles
   every upstream gradient), so each path is scored against the f32 XLA
   oracle: noise = err(xla_bf16 vs f32). The Pallas paths pass if their
   error stays within a small factor of that intrinsic bf16 noise.

Reference adjoint semantics: XLA VJP of the torch graph at
/root/reference/e2enet/network_architecture/unetpp_d.py:38-111
(shift -> conv(1,3,3) -> InstanceNorm -> LeakyReLU).
"""
import sys

import numpy as np

FACTOR = 3.0          # allowed multiple of the bf16 noise floor
ABS_FLOOR = 2e-2      # and never flag below this relative error


def rel_err(ref, b):
    ref = np.asarray(ref, np.float32)
    b = np.asarray(b, np.float32)
    scale = np.max(np.abs(ref)) + 1e-12
    return float(np.max(np.abs(ref - b)) / scale)


def check_single_block():
    import jax
    import jax.numpy as jnp
    from e2enet_tpu.ops import blocks
    from e2enet_tpu.ops.fused_block import (LRELU_SLOPE, choose_wp,
                                            from_padded_cf,
                                            fused_shift_conv_block,
                                            norm_affine_from_stats,
                                            to_padded_cf)
    from e2enet_tpu.ops.shift import depth_shift

    N, D, H, W, C, CO = 1, 8, 32, 32, 48, 48
    Wp = choose_wp(H, W)
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    x = jax.random.normal(ks[0], (N, D, H, W, C), jnp.bfloat16)
    wk = (jax.random.normal(ks[1], (3, 3, C, CO), jnp.bfloat16) * 0.3)
    b = jax.random.normal(ks[2], (CO,), jnp.bfloat16) * 0.1
    mult = jax.random.normal(ks[3], (C,), jnp.float32) * 0.5 + 1.0
    off = jax.random.normal(ks[4], (C,), jnp.float32) * 0.1
    gamma = jnp.ones((CO,), jnp.float32)
    beta = jnp.zeros((CO,), jnp.float32)

    def objective(y_raw_f32, stats):
        m2, o2 = norm_affine_from_stats(stats, D * H * W, gamma, beta)
        return (jnp.sum(jnp.square(y_raw_f32)) / 1e3
                + jnp.sum(m2) + jnp.sum(o2))

    def loss_pallas(wk_, b_, x_, mult_, off_):
        x_cf = to_padded_cf(x_, W, Wp)
        r, st = fused_shift_conv_block([x_cf], wk_, b_, [(mult_, off_)],
                                       H, W, use_pallas=True)
        y = from_padded_cf(r, H, W)
        return objective(y.astype(jnp.float32), st)

    def loss_oracle(wk_, b_, x_, mult_, off_):
        # channels-last oracle: on-load affine+lrelu, depth shift, conv —
        # the adjoint of reference unetpp_d.py:102-111 semantics
        xa = (x_.astype(jnp.float32) * mult_ + off_)
        xa = jnp.maximum(xa, xa * LRELU_SLOPE).astype(x_.dtype)
        y = blocks.conv3d_as_2d(depth_shift(xa, 5), wk_, b_, (1, 1, 1),
                                compute_dtype=x_.dtype)
        yf = y.astype(jnp.float32)
        st = jnp.stack([jnp.sum(yf, axis=(1, 2, 3)),
                        jnp.sum(yf * yf, axis=(1, 2, 3))], axis=-1)
        return objective(yf, st)

    grad = lambda f: jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4)))
    g_ref = jax.device_get(grad(loss_oracle)(wk, b, x, mult, off))
    g_pal = jax.device_get(grad(loss_pallas)(wk, b, x, mult, off))
    names = ["w", "b", "x", "aff_mult", "aff_off"]
    bad = []
    for n, a, p in zip(names, g_ref, g_pal):
        e = rel_err(a, p)
        print(f"  single-block grad d{n}: rel_err={e:.3e}", flush=True)
        if e > 3e-2:
            bad.append((n, e))
    return bad


def check_full_model():
    import jax
    import jax.numpy as jnp
    from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus

    kw = dict(input_channels=1, num_classes=3,
              pool_op_kernel_sizes=((2, 2, 2),) * 3,
              base_num_features=48, remat=True)
    x32 = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 64, 64, 1),
                            jnp.float32)

    m_f32 = ShiftUNetPlusPlus(**kw, compute_dtype=jnp.float32)
    params = jax.jit(m_f32.init)(jax.random.PRNGKey(1), x32)

    def make_grad(m, x):
        def loss(p):
            outs = m.apply(p, x)
            return sum(jnp.sum(jnp.square(o.astype(jnp.float32)))
                       for o in outs) / 1e4
        return jax.jit(jax.grad(loss))

    x16 = x32.astype(jnp.bfloat16)
    g_oracle = jax.device_get(make_grad(m_f32, x32)(params))
    paths = {
        "xla_bf16": ShiftUNetPlusPlus(**kw, compute_dtype=jnp.bfloat16),
        "fused": ShiftUNetPlusPlus(**kw, compute_dtype=jnp.bfloat16,
                                   fused=True),
        "quadrant": ShiftUNetPlusPlus(**kw, compute_dtype=jnp.bfloat16,
                                      fused=True, quadrant=True),
    }
    errs, mags = {}, {}
    oracle_leaves = jax.tree_util.tree_leaves_with_path(g_oracle)
    global_scale = max(float(np.max(np.abs(np.asarray(a, np.float32))))
                       for _, a in oracle_leaves)
    for name, m in paths.items():
        g = jax.device_get(make_grad(m, x16)(params))
        lb = jax.tree_util.tree_leaves_with_path(g)
        errs[name] = {jax.tree_util.keystr(pa): rel_err(a, b)
                      for (pa, a), (pb, b) in zip(oracle_leaves, lb)}
        mags[name] = {jax.tree_util.keystr(pb):
                      float(np.max(np.abs(np.asarray(b, np.float32))))
                      for pb, b in lb}

    noise = errs["xla_bf16"]
    # leaves where even the XLA bf16 path is >100% off the oracle have a
    # mathematically-zero true gradient (conv bias feeding instance norm
    # is a gauge direction: the norm subtracts it) — both paths emit pure
    # rounding noise there. For those, bound the MAGNITUDE of the noise
    # instead of its ratio (catches 1e38 uninitialized-memory garbage).
    gauge = {k for k, v in noise.items() if v > 1.0}
    print(f"  bf16 noise floor (xla_bf16 vs f32 oracle): worst "
          f"{max(v for k, v in noise.items() if k not in gauge):.3e}; "
          f"{len(gauge)} zero-gradient (gauge) leaves: "
          f"{sorted(gauge)[:3]}...", flush=True)
    bad = []
    for name in ("fused", "quadrant"):
        worst = (0.0, "", 0.0)
        for key, e in errs[name].items():
            if key in gauge:
                if mags[name][key] > 10.0 * global_scale:
                    bad.append((name, key, "gauge-magnitude",
                                mags[name][key]))
                    print(f"  FAIL [{name}] {key}: zero-grad leaf has "
                          f"|g|={mags[name][key]:.3e} vs global scale "
                          f"{global_scale:.3e}", flush=True)
                continue
            tol = max(FACTOR * noise[key], ABS_FLOOR)
            ratio = e / (noise[key] + 1e-12)
            if e > worst[0]:
                worst = (e, key, ratio)
            if e > tol:
                bad.append((name, key, e, noise[key]))
                print(f"  FAIL [{name}] {key}: rel_err={e:.3e} "
                      f"(bf16 noise {noise[key]:.3e})", flush=True)
        print(f"  [{name}] worst vs f32 oracle: {worst[0]:.3e} at "
              f"{worst[1]} ({worst[2]:.1f}x the xla_bf16 noise there)",
              flush=True)
    return bad


def main():
    import jax
    print("device:", jax.devices()[0], flush=True)
    print("single fused block vs XLA path (both bf16, hardware):",
          flush=True)
    bad1 = check_single_block()
    print("full model vs f32 oracle (hardware):", flush=True)
    bad2 = check_full_model()
    if bad1 or bad2:
        print(f"GRAD PARITY FAILED: single-block={bad1} "
              f"model-leaves-over-noise={len(bad2)}")
        sys.exit(1)
    print("GRAD PARITY OK (fused + quadrant backward kernels on real TPU: "
          "single-block exact to bf16 rounding; full-model within "
          f"{FACTOR}x the intrinsic bf16 noise)")


if __name__ == "__main__":
    main()
