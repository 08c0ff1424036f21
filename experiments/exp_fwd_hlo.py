"""Dump the compiled forward HLO (same program as exp_profile_fwd) and
report shapes of the named ops (copy.N / fusion.N / reduce.N) that show up
hot in the profile.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/exp_fwd_hlo.py [--quadrant] [pattern...]
"""
import re
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus


def main():
    quadrant = "--quadrant" in sys.argv
    pats = [a for a in sys.argv[1:] if not a.startswith("--")] or \
        ["copy.", "reduce.1", "transpose"]
    patch = (128, 128, 128)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, *patch, 1),
                          jnp.float32).astype(jnp.bfloat16)
    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=16,
        pool_op_kernel_sizes=((2, 2, 2),) * 5,
        base_num_features=48, compute_dtype=jnp.bfloat16,
        fused=True, fused_max_level=1, quadrant=quadrant)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x)

    def step(c, _):
        y = model.apply(params, c, do_ds=False)
        return c + jnp.mean(y).astype(c.dtype), None

    g = jax.jit(lambda x0: jax.lax.scan(step, x0, None, length=5)[0])
    txt = g.lower(x).compile().as_text()
    out = "/tmp/fwd_hlo%s.txt" % ("_quad" if quadrant else "")
    with open(out, "w") as f:
        f.write(txt)
    print("HLO ->", out, f"({len(txt)} bytes)")
    for line in txt.splitlines():
        ls = line.strip()
        for p in pats:
            if re.search(r"%?" + re.escape(p) + r"\d*\s*=", ls):
                print(ls[:240])
                break


if __name__ == "__main__":
    main()
