"""Dump the compiled train-step HLO and report the named ops matching the
profile's hot entries (fusion.N / copy.N / reshape.N) with their shapes.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u experiments/exp_dump_hlo.py <name-substr>...
"""
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus, ds_loss_weights
from e2enet_tpu.training.train_state import (create_train_state,
                                             make_train_step)


def main():
    patch = (80, 192, 160)
    pools = ((2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 2, 2))
    n_classes, B = 3, 2
    model = ShiftUNetPlusPlus(
        input_channels=1, num_classes=n_classes,
        pool_op_kernel_sizes=pools, base_num_features=48,
        compute_dtype=jnp.bfloat16, fused=True, fused_max_level=0,
        remat=True)
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

    lowered = jax.jit(step).lower(state, data, tgts, 1e-2)
    txt = lowered.compile().as_text()
    with open("/tmp/train_step_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped: {len(txt)} chars", file=sys.stderr)
    pats = sys.argv[1:] or ["copy.", "fusion.", "reshape."]
    sizes = []
    for line in txt.splitlines():
        m = re.match(r"\s*%?([\w.-]+)\s*=\s*(\S+)\s+(\w+)", line)
        if not m:
            continue
        name, shp, op = m.groups()
        if any(name.startswith(p.rstrip(".")) and
               re.fullmatch(re.escape(p.rstrip(".")) + r"(\.\d+)?", name)
               or name == p for p in []):
            pass
        nums = re.findall(r"\d+", shp)
        try:
            elems = 1
            for d in re.findall(r"\[([\d,]*)\]", shp)[:1]:
                for v in d.split(","):
                    if v:
                        elems *= int(v)
            bytes_ = elems * (2 if "bf16" in shp else 4)
        except Exception:
            bytes_ = 0
        if op in ("copy", "transpose", "reshape") or "fusion" in line[:200]:
            sizes.append((bytes_, name, shp, op, line.strip()[:160]))
    sizes.sort(reverse=True)
    print("--- biggest copies/transposes/reshapes/fusions:", file=sys.stderr)
    for b, name, shp, op, line in sizes[:40]:
        print(f"  {b/1e6:8.1f}MB {name:22s} {line}", file=sys.stderr)


if __name__ == "__main__":
    main()
