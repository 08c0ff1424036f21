"""Dump the compiled HLO of the EXACT sparse bench/profile program
(quadrant + flip-free + f16 accum + row-sparse d=0.2) and print the
definitions of the named ops (profile hot entries).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u \
    experiments/exp_sparse_hlo.py fusion.6235 fusion.5626 reshape.18129 ...
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
    pats = [a for a in sys.argv[1:] if not a.startswith("--")]
    patch = (128, 128, 128)
    num_classes = 16
    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=num_classes,
        pool_op_kernel_sizes=((2, 2, 2),) * 5,
        base_num_features=48, compute_dtype=jnp.bfloat16,
        fused=True, quadrant=True, quadrant_logits=True,
        quadrant_input=patch)
    x0 = jnp.zeros((1, *patch, 1), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    from e2enet_tpu.models.sparse_plan import build_sparse_plan
    from e2enet_tpu.training import dsff
    masks = dsff.init_masks_row(params["params"], 0.2,
                                jax.random.PRNGKey(7),
                                density_48_override=0.2)
    params = {"params": dsff.apply_masks(params["params"], masks)}
    plan = build_sparse_plan(masks)
    model = model.clone(sparse_plan=plan)
    apply_fn = lambda p, x: model.apply(p, x, do_ds=False)
    from e2enet_tpu.inference.predictor import mirror_apply_fns_for
    mirror_fns = mirror_apply_fns_for(model, wrap_params=False)
    predictor = make_tiled_predictor(
        apply_fn, patch, num_classes, mirror_axes=(0, 1, 2),
        do_mirroring=True, quadrant_meta=((2, 2, 2), 64, 64),
        accum_dtype=jnp.float16, prob_dtype=jnp.bfloat16,
        mirror_apply_fns=mirror_fns)
    vol = jnp.zeros((192, 192, 192, 1), jnp.float32)
    starts = jnp.zeros((8, 3), jnp.int32)
    txt = predictor.lower(params, vol, starts,
                          jnp.int32(8)).compile().as_text()
    out = "/tmp/slide_hlo_sparse.txt"
    with open(out, "w") as f:
        f.write(txt)
    print("HLO ->", out, f"({len(txt)} bytes)")
    for line in txt.splitlines():
        ls = line.strip()
        name = ls.split("=")[0].strip().lstrip("%")
        for p in pats:
            if name == p or name == "%" + p:
                print(ls[:1200])
                break


if __name__ == "__main__":
    main()
