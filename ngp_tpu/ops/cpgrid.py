"""Multiresolution CP factor-bank encoding — the TPU-native flagship
position encoder.

Replaces the reference's multiresolution hash grid
(gridencoder/grid.py:96-185) for the hot training path. Rationale
(measured, scripts/microbench_*.py): on TPU every random table-row
access moves a full 4 KB tile (~15-35 ns/row), so instant-ngp's
8-corner-per-(point, level) random access is the throughput wall; a CP
factorization evaluates by dense MXU matmuls instead (see
ngp_tpu.ops.pallas.cp_kernels). Spatial coupling that rank-R CP cannot
express is recovered by (a) a frequency encoding of the raw position
(low frequencies) and (b) the downstream MLP mixing the per-bank
features — the same division of labor as TensoRF-CP
(tensoRF/network_cp.py:67-111), which reaches instant-ngp-class PSNR
with total rank a few hundred.

Geometry parity notes: inputs live in [0, 1]^3 like GridEncoder
(grid.py:149); out-of-range inputs produce zero features
(gridencoder.cu:110-135 semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ngp_tpu.ops.freq import freq_encode, freq_encode_dim
from ngp_tpu.ops.pallas.cp_kernels import cp_encode, cp_encode_reference


@dataclasses.dataclass(frozen=True)
class CPGridConfig:
    resolutions: Tuple[int, ...] = (256, 512, 1024, 2048)
    rank: int = 64
    freq_degree: int = 5  # freq-encoded xyz appended (coarse scales)
    init_scale: float = 0.2
    block: int = 1024

    @property
    def output_dim(self) -> int:
        d = len(self.resolutions) * self.rank
        if self.freq_degree > 0:
            d += freq_encode_dim(3, self.freq_degree)
        return d

    def init(self, key: jax.Array, dtype=jnp.float32) -> Tuple[jnp.ndarray, ...]:
        keys = jax.random.split(key, len(self.resolutions))
        return tuple(
            (jax.random.normal(k, (3, r, self.rank), jnp.float32)
             * self.init_scale).astype(dtype)
            for k, r in zip(keys, self.resolutions)
        )


def cpgrid_encode(
    x: jnp.ndarray,
    factors: Tuple[jnp.ndarray, ...],
    cfg: CPGridConfig,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """x in [0, 1]^3, any leading shape -> [..., output_dim] float32."""
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, 3).astype(jnp.float32)
    if compute_dtype is not None:
        factors = tuple(f.astype(compute_dtype) for f in factors)
    out_dtype = compute_dtype or jnp.float32
    if jax.default_backend() == "cpu":
        # differentiable gather-based fallback (tests / CPU mesh runs);
        # the Pallas kernel itself is parity-tested in interpret mode
        feats = cp_encode_reference(xf, factors, cfg.resolutions)
        feats = feats.astype(out_dtype)
        oob = jnp.any((xf < 0.0) | (xf > 1.0), axis=-1)
        feats = jnp.where(oob[:, None], jnp.zeros((), out_dtype), feats)
    else:
        # OOB-zero + output dtype handled IN-KERNEL: a post-kernel
        # where/convert re-streams the [M, nb*R] features through HBM
        # (profiled ~1.8 ms/step of copies at production shapes)
        feats = cp_encode(
            xf, factors, cfg.resolutions, cfg.block, out_dtype
        )
    if cfg.freq_degree > 0:
        fr = freq_encode(2.0 * xf - 1.0, cfg.freq_degree).astype(out_dtype)
        feats = jnp.concatenate([feats, fr], axis=-1)
    return feats.reshape(*batch_shape, cfg.output_dim)


def cpgrid_density(
    x: jnp.ndarray,
    factors: Tuple[jnp.ndarray, ...],
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    cfg: CPGridConfig,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Fused density head: cpgrid_encode(x) -> 2-layer no-bias MLP
    (relu between), numerically the composition of
    ``cpgrid_encode`` + ``MLP(num_layers=2)`` (models/mlp.py) but one
    Pallas pass on TPU (ops/pallas/cp_kernels.cp_density): the [M, D]
    feature rows stay in VMEM instead of making ~4 HBM round trips.
    Replaces the reference's hashgrid -> sigma-net hot pair
    (nerf/network.py:94-113). w1/w2 are the raw Dense kernels
    ([D, H1], [H1, OUT], param dtype); x any leading shape in [0, 1].
    Returns [..., OUT] float32.
    """
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, 3).astype(jnp.float32)
    if compute_dtype is not None:
        factors = tuple(f.astype(compute_dtype) for f in factors)
        w1 = w1.astype(compute_dtype)
        w2 = w2.astype(compute_dtype)
    if jax.default_backend() == "cpu":
        feats = cpgrid_encode(x, factors, cfg, compute_dtype=None)
        feats = feats.reshape(-1, cfg.output_dim)
        dt = compute_dtype or feats.dtype
        h1 = jnp.dot(feats.astype(dt), w1, preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1, 0.0).astype(dt)
        out = jnp.dot(h1, w2, preferred_element_type=jnp.float32)
    else:
        from ngp_tpu.ops.pallas.cp_kernels import cp_density

        out = cp_density(
            xf, factors, w1, w2, cfg.resolutions, cfg.freq_degree, cfg.block
        )
    return out.reshape(*batch_shape, w2.shape[1]).astype(jnp.float32)


def cpgrid_sigma_rgb(
    x: jnp.ndarray,
    dirs: jnp.ndarray,
    factors: Tuple[jnp.ndarray, ...],
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    color_ws: Tuple[jnp.ndarray, ...],
    cfg: CPGridConfig,
    sh_degree: int,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Fused EVAL radiance: the full sigma+color evaluation of the
    flagship network (cpgrid_density -> trunc_exp/geo split -> SH(dir)
    concat -> color MLP -> sigmoid, models/nerf.py:87-106) in ONE
    Pallas pass (ops/pallas/cp_kernels.cp_sigma_rgb). Inference-only:
    no residual writebacks at all — cp_density alone ships [M, ~680]
    feats + [M, 64] h1 to HBM for its backward, and the unfused color
    stage re-streams SH/concat/hiddens; at eval every one of those HBM
    round trips is pure waste. Replaces the reference's inference-time
    sigma+color pair (nerf/renderer.py:336-367's network calls).

    x in [0, 1]^3; dirs unit [..., 3]. Returns [..., 4] f32 compositor
    rows: (trunc_exp(sigma_raw), sigmoid(rgb)).
    """
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, 3).astype(jnp.float32)
    df = dirs.reshape(-1, 3).astype(jnp.float32)
    if compute_dtype is not None:
        factors = tuple(f.astype(compute_dtype) for f in factors)
        w1 = w1.astype(compute_dtype)
        w2 = w2.astype(compute_dtype)
        color_ws = tuple(w.astype(compute_dtype) for w in color_ws)
    if jax.default_backend() == "cpu":
        from ngp_tpu.ops.sh import sh_encode

        h = cpgrid_density(x, factors, w1, w2, cfg, compute_dtype=None)
        h = h.reshape(-1, w2.shape[1])
        sigma = jnp.exp(h[:, :1])
        dt = compute_dtype or h.dtype
        c = jnp.concatenate(
            [sh_encode(df, sh_degree).astype(dt), h[:, 1:].astype(dt)],
            axis=-1,
        )
        for i, w in enumerate(color_ws):
            c = jnp.dot(c, w, preferred_element_type=jnp.float32)
            if i != len(color_ws) - 1:
                c = jnp.maximum(c, 0.0).astype(dt)
        out = jnp.concatenate([sigma, jax.nn.sigmoid(c)], axis=-1)
    else:
        from ngp_tpu.ops.pallas.cp_kernels import cp_sigma_rgb

        out = cp_sigma_rgb(
            xf, df, factors, w1, w2, color_ws, cfg.resolutions,
            cfg.freq_degree, sh_degree, cfg.block,
        )
    return out.reshape(*batch_shape, 4).astype(jnp.float32)
