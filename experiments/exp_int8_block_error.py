"""int8 quantization error on the nest-block GEMM (VERDICT r03 #6).
Simulates the only int8 scheme the MXU can cash (BOTH operands int8):
per-output-channel weight scales, per-tensor dynamic activation scale.
Inputs modeled as instance-norm+lrelu outputs (the real block input
distribution)."""
import numpy as np
rng = np.random.RandomState(0)

def lrelu(x): return np.where(x >= 0, x, 0.01 * x)

K, CO, NVOX = 96, 48, 1 << 16     # nest conv contraction (per tap)
x = lrelu(rng.randn(NVOX, K)).astype(np.float32)       # norm+lrelu stats
w = (rng.randn(9, K, CO) * np.sqrt(2 / (9 * K))).astype(np.float32)
w = w.reshape(9 * K, CO)
xx = np.tile(x, (1, 9)).astype(np.float32)             # 9 taps share dist

def q8(a, axis=None):
    s = np.max(np.abs(a), axis=axis, keepdims=True) / 127.0
    return np.clip(np.round(a / s), -127, 127).astype(np.int8), s

y_f32 = xx @ w
y_bf16 = (xx.astype(np.float32) @ w).astype(np.float32)  # proxy
xq, sx = q8(xx)                                   # per-tensor activation
wq, sw = q8(w, axis=0)                            # per-out-channel weight
y_int8 = (xq.astype(np.int32) @ wq.astype(np.int32)).astype(np.float32) \
         * sx * sw
rel = np.sqrt(np.mean((y_int8 - y_f32) ** 2)) / np.sqrt(np.mean(y_f32 ** 2))
# bf16 reference error for context
xb = xx.astype(np.dtype("float32"))
import ml_dtypes
y_b = (xx.astype(ml_dtypes.bfloat16).astype(np.float32)
       @ w.astype(ml_dtypes.bfloat16).astype(np.float32))
relb = np.sqrt(np.mean((y_b - y_f32) ** 2)) / np.sqrt(np.mean(y_f32 ** 2))
print(f"per-block GEMM relative RMS error: int8 {rel:.4f}  bf16 {relb:.4f}"
      f"  (ratio {rel/relb:.1f}x)")
