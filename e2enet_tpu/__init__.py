"""e2enet_tpu — a TPU-native volumetric medical-image segmentation framework.

A from-scratch JAX/XLA/Pallas/pjit re-design with the capabilities of
E2ENet-Medical (an nnU-Net-V1-derived stack; reference layout documented in
/root/repo/SURVEY.md): self-configuring experiment planning & preprocessing,
patch-based 5-fold training of a UNet++ with restricted depth-shift (1,3,3)
convolutions ("shiftConvPP") and Dynamic Sparse Feature Fusion (DSFF),
Gaussian-weighted sliding-window inference with mirror TTA and fold-ensemble
averaging compiled into single XLA programs, connected-component
postprocessing, a full segmentation-metric evaluator, and
train/predict/evaluate CLIs.

Everything device-side is functional JAX (params as pytrees, jitted steps,
`jax.sharding.Mesh` + pjit for scale-out). Host-side I/O (NIfTI), resampling
and augmentation live under io/, preprocessing/ and data/.
"""

__version__ = "0.1.0"
