"""One-shot TPU compile+correctness probe for the fused eval radiance
kernel (cp_sigma_rgb) at flagship dims — Mosaic lowering check only
(perf is measured inside the real eval drive, never standalone;
CLAUDE.md benchmarking rules)."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ngp_tpu.ops.pallas.cp_kernels import cp_sigma_rgb
from ngp_tpu.ops.sh import sh_encode
from ngp_tpu.ops.cpgrid import CPGridConfig
from ngp_tpu.ops.freq import freq_encode

RES = (128, 256, 512, 1024, 2048)
RANK = 128
FD = 6
SH = 4
GEO = 15

rng = np.random.default_rng(0)
M = 512
pos = jnp.asarray(rng.uniform(0, 1, size=(M, 3)).astype(np.float32))
d = rng.normal(size=(M, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d)
factors = tuple(
    jnp.asarray(rng.normal(0, 0.1, size=(3, r, RANK)).astype(np.float32),
                jnp.bfloat16)
    for r in RES
)
D = len(RES) * RANK + 3 * (1 + 2 * FD)
w1 = jnp.asarray(rng.normal(0, 0.05, size=(D, 64)).astype(np.float32),
                 jnp.bfloat16)
w2 = jnp.asarray(rng.normal(0, 0.05, size=(64, 1 + GEO)).astype(np.float32),
                 jnp.bfloat16)
dims = [SH * SH + GEO, 64, 64, 3]
color_ws = tuple(
    jnp.asarray(rng.normal(0, 0.2, size=(dims[i], dims[i + 1]))
                .astype(np.float32), jnp.bfloat16)
    for i in range(3)
)

out = jax.jit(
    lambda p, dd: cp_sigma_rgb(p, dd, factors, w1, w2, color_ws, RES, FD, SH)
)(pos, d)
out = np.asarray(out)
print("kernel out", out.shape, out.dtype, "finite:", np.isfinite(out).all())

# reference composition in f32 on host-side jnp (same backend)
def ref():
    from ngp_tpu.ops.pallas.cp_kernels import cp_encode_reference

    cp = cp_encode_reference(pos, tuple(f.astype(jnp.float32) for f in factors), RES)
    fr = freq_encode(2.0 * pos - 1.0, FD)
    feats = jnp.concatenate([cp, fr], axis=-1).astype(jnp.bfloat16)
    h1 = jnp.maximum(jnp.dot(feats, w1, preferred_element_type=jnp.float32), 0.0).astype(jnp.bfloat16)
    h = jnp.dot(h1, w2, preferred_element_type=jnp.float32)
    sig = jnp.exp(h[:, 0])
    c = jnp.concatenate([sh_encode(d, SH).astype(jnp.bfloat16), h[:, 1:].astype(jnp.bfloat16)], axis=-1)
    for i, w in enumerate(color_ws):
        c = jnp.dot(c, w, preferred_element_type=jnp.float32)
        if i != 2:
            c = jnp.maximum(c, 0.0).astype(jnp.bfloat16)
    rgb = jax.nn.sigmoid(c)
    return sig, rgb

sig_r, rgb_r = map(np.asarray, jax.jit(ref)())
ds = np.abs(out[:, 0] - sig_r) / np.maximum(1e-3, np.abs(sig_r))
dr = np.abs(out[:, 1:] - rgb_r)
print("sigma rel err max", float(ds.max()), "rgb abs err max", float(dr.max()))
assert ds.max() < 0.05 and dr.max() < 0.02, "parity failure"
print("OK")
