"""Dump the compiled sliding-window HLO (same program as
exp_profile_sliding) and print ops matching the given name patterns.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/exp_sliding_hlo.py [--quadrant] pattern...
"""
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus
from e2enet_tpu.ops.sliding import make_tiled_predictor


def main():
    quadrant = "--quadrant" in sys.argv
    pats = [a for a in sys.argv[1:] if not a.startswith("--")] or \
        ["select_select_fusion", "reshape.41"]
    patch = (128, 128, 128)
    num_classes = 16
    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=num_classes,
        pool_op_kernel_sizes=((2, 2, 2),) * 5,
        base_num_features=48, compute_dtype=jnp.bfloat16,
        fused=True, quadrant=quadrant, quadrant_logits=quadrant)
    x0 = jnp.zeros((1, *patch, 1), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    apply_fn = lambda p, x: model.apply(p, x, do_ds=False)
    qmeta = (((2, 2, 2), 64, 64) if quadrant else None)
    predictor = make_tiled_predictor(apply_fn, patch, num_classes,
                                     mirror_axes=(0, 1, 2),
                                     do_mirroring=True,
                                     quadrant_meta=qmeta)
    vol = jnp.zeros((192, 192, 192, 1), jnp.float32)
    starts = jnp.zeros((8, 3), jnp.int32)
    txt = predictor.lower(params, vol, starts,
                          jnp.int32(8)).compile().as_text()
    out = "/tmp/slide_hlo%s.txt" % ("_quad" if quadrant else "")
    with open(out, "w") as f:
        f.write(txt)
    print("HLO ->", out, f"({len(txt)} bytes)")
    for line in txt.splitlines():
        ls = line.strip()
        for p in pats:
            if re.search(r"%?" + re.escape(p), ls.split("=")[0]):
                print(ls[:260])
                break


if __name__ == "__main__":
    main()
