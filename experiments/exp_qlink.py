"""Hardware parity + isolated timing of the ops/qlink.py site kernels at
bench geometry (level-0 quadrant: Dq=64, Q=8, C=48, L=64*66=4224).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_qlink.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from e2enet_tpu.ops import qfused

Q = (2, 2, 2)
HQ = WQ = 64
WQP = 66
L = HQ * WQP          # 4224
DQ = 64
C = 48
K = 16                # num_classes


def timed(fn, *args, reps=30):
    out = jax.block_until_ready(fn(*args))
    # chained timing: scan with data dependency (tunnel-safe)
    def body(c, _):
        y = fn(c, *args[1:])
        # feed a scalar back into the carry to chain
        return c + 0 * y.astype(c.dtype).reshape(-1)[0], ()
    chained = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=reps)[0])
    jax.block_until_ready(chained(args[0]))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(args[0]))
    dt = (time.perf_counter() - t0) / reps * 1e3
    return out, dt


def main():
    rng = np.random.RandomState(0)
    raw1 = jnp.asarray(rng.randn(1, DQ, 2 * C, L), jnp.float32
                       ).astype(jnp.bfloat16)       # level-1 pending (96ch)
    raw0 = jnp.asarray(rng.randn(1, DQ, 8 * C, L), jnp.float32
                       ).astype(jnp.bfloat16)       # level-0 quadrant raw
    mult1 = jnp.asarray(rng.rand(1, 2 * C) + 0.5, jnp.float32)
    off1 = jnp.asarray(rng.randn(1, 2 * C), jnp.float32)
    mult0 = jnp.asarray(rng.randn(1, C), jnp.float32)
    off0 = jnp.asarray(rng.randn(1, C), jnp.float32)
    kern = jnp.asarray(rng.randn(2, 2, 2, 2 * C, C) * 0.05, jnp.float32)
    wseg = jnp.asarray(rng.randn(C, K) * 0.1, jnp.float32)

    # ---- up-link
    up_p = jax.jit(functools.partial(
        qfused.transp_conv_quadrant_from_cf, q=Q, Hq=HQ, Wq=WQ))
    up_x = jax.jit(functools.partial(
        qfused._transp_conv_quadrant_from_cf_xla, q=Q, Hq=HQ, Wq=WQ))
    yp, tp = timed(lambda r, m, o, k: up_p(r, m, o, k),
                   raw1, mult1, off1, kern)
    yx, tx = timed(lambda r, m, o, k: up_x(r, m, o, k),
                   raw1, mult1, off1, kern)
    e = np.abs(np.asarray(yp, np.float32) - np.asarray(yx, np.float32))
    s = np.abs(np.asarray(yx, np.float32)).max()
    print(f"uplink:  pallas {tp:.3f} ms  xla {tx:.3f} ms  "
          f"({tx / tp:.2f}x)  maxabs {e.max():.2e} (scale {s:.1f})")

    # ---- down-link
    dn_p = jax.jit(functools.partial(
        qfused.quadrant_block_max_cf, q=Q, Hq=HQ, Wq=WQ, C=C, Wp_out=WQP))
    dn_x = jax.jit(functools.partial(
        qfused._quadrant_block_max_cf_xla, q=Q, Hq=HQ, Wq=WQ, C=C,
        Wp_out=WQP))
    yp, tp = timed(lambda r, m, o: dn_p(r, m, o), raw0, mult0, off0)
    yx, tx = timed(lambda r, m, o: dn_x(r, m, o), raw0, mult0, off0)
    e = np.abs(np.asarray(yp, np.float32) - np.asarray(yx, np.float32))
    s = np.abs(np.asarray(yx, np.float32)).max()
    print(f"downlink: pallas {tp:.3f} ms  xla {tx:.3f} ms  "
          f"({tx / tp:.2f}x)  maxabs {e.max():.2e} (scale {s:.1f})")

    # ---- seg head
    from e2enet_tpu.ops.qlink import seghead_quadrant

    def twin(raw, mult, off, w):
        xq = qfused.quadrant_apply_norm_lrelu(raw, mult, off)
        xb = xq.reshape(1, DQ, 8, C, L).astype(jnp.bfloat16)
        y = jnp.einsum("ndqcl,ck->ndqkl", xb, w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return y.reshape(1, DQ, 8 * K, L)

    sh_p = jax.jit(lambda r, m, o, w: seghead_quadrant(r, m, o, w, 8, twin))
    sh_x = jax.jit(twin)
    yp, tp = timed(lambda r, m, o, w: sh_p(r, m, o, w),
                   raw0, mult0, off0, wseg)
    yx, tx = timed(lambda r, m, o, w: sh_x(r, m, o, w),
                   raw0, mult0, off0, wseg)
    e = np.abs(np.asarray(yp, np.float32) - np.asarray(yx, np.float32))
    s = np.abs(np.asarray(yx, np.float32)).max()
    print(f"seghead: pallas {tp:.3f} ms  xla {tx:.3f} ms  "
          f"({tx / tp:.2f}x)  maxabs {e.max():.2e} (scale {s:.1f})")


if __name__ == "__main__":
    main()
