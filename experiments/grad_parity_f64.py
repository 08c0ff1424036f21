"""FLOAT64 step-level gradient parity vs the reference torch trainer.

Evidence artifact for tests/test_training_parity.py's tolerance: with every
hardcoded f32 stat/loss path forced to f64 (jnp proxy) and torch in double,
the DS loss agrees to ~2e-15 and every gradient leaf to ~1e-15 L2 — the two
training-step implementations are MATHEMATICALLY IDENTICAL; the f32
differences (<=1.5e-2 L2-relative on deep leaves) are reduction-order
rounding noise (torch's own f32-vs-f64 noise is 3.5e-3 on the same leaves).

Run: python experiments/grad_parity_f64.py   (CPU, ~3 min)
"""
import sys, types
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import numpy as np
import conftest
from conftest import stub_reference_deps, import_reference_unetpp
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

class JnpF64Proxy:
    """jnp with float32 aliased to float64 — forces the hardcoded f32
    stat/loss paths to run in f64 for this diagnostic."""
    def __getattr__(self, name):
        if name == "float32":
            return jnp.float64
        return getattr(jnp, name)

import e2enet_tpu.ops.blocks as blocks
import e2enet_tpu.ops.losses as losses
import e2enet_tpu.models.unetpp as unetpp
proxy = JnpF64Proxy()
blocks.jnp = proxy
losses.jnp = proxy
unetpp.jnp = proxy

import torch, torch.nn as nn
stub_reference_deps()
from e2enet.training.loss_functions.deep_supervision import MultipleOutputLoss2
from e2enet.training.loss_functions.dice_loss import DC_and_CE_loss
from e2enet_tpu.models.torch_import import convert_unetpp_state_dict
from e2enet_tpu.models.unetpp import ShiftUNetPlusPlus, ds_loss_weights
from e2enet_tpu.ops.losses import deep_supervision_loss

POOLS = [[1,2,2],[2,2,2],[2,2,2],[2,2,2],[1,2,2]]
PATCH = (8,64,64)
Ref = import_reference_unetpp()
torch.manual_seed(11)
net = Ref(PATCH, 1, 8, 3, 5, 2, 2, nn.Conv3d, nn.InstanceNorm3d,
          {'eps': 1e-5, 'affine': True}, nn.Dropout3d,
          {'p': 0, 'inplace': True}, nn.LeakyReLU,
          {'negative_slope': 1e-2, 'inplace': True}, True, False,
          lambda x: x, None, POOLS, [[1,3,3]]*6, False, True, True,
          max_num_features=64).double()
net.train(); net.do_ds = True
sd0 = {k: v.detach().numpy().copy() for k, v in net.state_dict().items()}
w5 = np.array([1/(2**i) for i in range(5)]); w5[-1]=0; w5=w5/w5.sum()
loss_ref = MultipleOutputLoss2(DC_and_CE_loss({'batch_dice': True, 'smooth': 1e-5, 'do_bg': False}, {}), w5)
rng = np.random.RandomState(3)
_ = rng.randn(1,1,*PATCH)
data = rng.randn(2,1,*PATCH)
shapes = [(8,64,64),(8,32,32),(4,16,16),(2,8,8)]
tgts = [rng.randint(0,3,(2,*s)).astype(np.int32) for s in shapes]
net.zero_grad()
out = net(torch.from_numpy(data))
l = loss_ref(out, [torch.from_numpy(t[:,None]).double() for t in tgts])
l.backward()
print("ref f64 loss", float(l))
ref_grads = {k: p.grad.detach().numpy().copy() for k,p in net.named_parameters()}

model = ShiftUNetPlusPlus(input_channels=1, num_classes=3,
                          pool_op_kernel_sizes=POOLS, base_num_features=8,
                          max_num_features=64, compute_dtype=jnp.float64)
params0 = convert_unetpp_state_dict(sd0, num_pool=5)
params0 = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), params0)
w4 = ds_loss_weights(5,4)
def loss_only(p, data, targets):
    outs = model.apply({"params": p}, data, do_ds=True)
    return deep_supervision_loss(outs, targets, [float(w) for w in w4], batch_dice=True)
lv, ours_g = jax.jit(jax.value_and_grad(loss_only))(
    params0, jnp.asarray(np.moveaxis(data,1,-1)), tuple(jnp.asarray(t) for t in tgts))
print("our f64 loss", float(lv), "diff", float(lv)-float(l))
ref_g = convert_unetpp_state_dict(ref_grads, num_pool=5)
fo = jax.tree_util.tree_flatten_with_path(ours_g)[0]
fr = jax.tree_util.tree_flatten_with_path(ref_g)[0]
rows = []
for (po, go), (pr, gr) in zip(fo, fr):
    rn = float(np.linalg.norm(gr)); en = float(np.linalg.norm(np.asarray(go)-gr))
    rows.append((en/(rn+1e-12), en, rn, jax.tree_util.keystr(po)))
rows.sort(reverse=True)
print("--- worst (all) f64-vs-f64")
for r in rows[:8]:
    print(f"rel {r[0]:.2e}  err {r[1]:.2e}  norm {r[2]:.2e}  {r[3]}")
