"""Micro: int8 vs bf16 MXU throughput on this chip (XLA dot + Pallas dot).

The roofline decision gate (PERF_NOTES round-8): dense bf16 caps the bench
at ~98 patches/s (2.0 TFLOP/pass / 197 TF/s), below the 5x=125/s target —
int8 (nominal 394 TOPS) is the only dense path there. This measures what
int8 actually delivers through XLA and through a Pallas kernel on this
Mosaic before committing to an int8 fused-block family.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_int8_mxu.py
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

def log(*a):
    print(*a, file=sys.stderr, flush=True)

def chain_time(f, x, w, reps=64):
    """Chained timing (tunnel-safe): each rep feeds the next. reps=64
    amortizes the tunnel dispatch+fetch latency (several ms) below the
    per-rep noise floor — the first capture used reps=8 and read ~38 TF/s
    for bf16, which was mostly overhead."""
    @jax.jit
    def run(x):
        def body(c, _):
            y = f(c, w)
            # fold y back into an input-shaped, input-dtype carry
            c2 = (y[:x.shape[0], :x.shape[1]]).astype(x.dtype)
            return c2, ()
        c, _ = jax.lax.scan(body, x, None, length=reps)
        return c
    r = run(x); np.asarray(r[0, :1])  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = run(x); np.asarray(r[0, :1])
        best = min(best, (time.time() - t0) / reps)
    return best

def main():
    M = N = K = 4096
    flops = 2 * M * N * K
    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
    wb = jnp.asarray(rng.randn(K, N), jnp.bfloat16)
    xi = jnp.asarray(rng.randint(-127, 127, (M, K)), jnp.int8)
    wi = jnp.asarray(rng.randint(-127, 127, (K, N)), jnp.int8)

    f_bf = lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32)
    t = chain_time(f_bf, xb, wb)
    log(f"XLA bf16 {M}x{K}x{N}: {t*1e3:.3f} ms = {flops/t/1e12:.1f} TF/s")

    f_i8 = lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32)
    try:
        t = chain_time(f_i8, xi, wi)
        log(f"XLA int8 {M}x{K}x{N}: {t*1e3:.3f} ms = {flops/t/1e12:.1f} TOP/s")
    except Exception as e:
        log("XLA int8 FAILED:", repr(e)[:300])

    # Pallas: K-tiled accumulate, 512x512 blocks
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    TM, TN = 512, 512
    def mk(dt_in, dt_acc):
        def kernel(a_ref, b_ref, o_ref):
            o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                               preferred_element_type=dt_acc)
        @jax.jit
        def f(a, b):
            return pl.pallas_call(
                kernel,
                grid=(M // TM, N // TN),
                in_specs=[pl.BlockSpec((TM, K), lambda i, j: (i, 0)),
                          pl.BlockSpec((K, TN), lambda i, j: (0, j))],
                out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j)),
                out_shape=jax.ShapeDtypeStruct((M, N), dt_acc),
            )(a, b)
        return f
    try:
        t = chain_time(mk(jnp.bfloat16, jnp.float32), xb, wb)
        log(f"Pallas bf16: {t*1e3:.3f} ms = {flops/t/1e12:.1f} TF/s")
    except Exception as e:
        log("Pallas bf16 FAILED:", repr(e)[:300])
    try:
        t = chain_time(mk(jnp.int8, jnp.int32), xi, wi)
        log(f"Pallas int8: {t*1e3:.3f} ms = {flops/t/1e12:.1f} TOP/s")
    except Exception as e:
        log("Pallas int8 FAILED:", repr(e)[:300])

if __name__ == "__main__":
    main()
