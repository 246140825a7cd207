"""Pallas TPU kernels for CP factor-bank encoding.

The TPU-native replacement for the reference's hash-grid random access
(gridencoder/src/gridencoder.cu:87-444). Measured ground truth on TPU
v5e (scripts/microbench_*.py): XLA gathers/scatters cost ~15-35 ns per
row regardless of row width — every random table row moves a full 4 KB
tile — so instant-ngp style per-(sample, level) random access is
~25x weaker per access than on GPU. One-hot matmuls, in contrast, ride
the MXU at TFLOP rates. These kernels therefore evaluate a
multiresolution CP (CANDECOMP/PARAFAC) factorization — per bank b with
resolution res_b and rank R, features(x) = a_b(x) * b_b(y) * c_b(z)
with 1-D linearly-interpolated factor lines — by building the
interpolation weights as TENT rows relu(1 - |p - j|) of a [TM, res]
matrix in VMEM (the tent IS the linear-interp weight profile) and
contracting them with the factor lines on the MXU:

  forward : feat[m, bR:(b+1)R] = prod_ax TENT_ax[m] @ F[b, ax]   (MXU)
  backward: dF[b, ax] = TENT_ax^T @ (g_b * prod_{ax'!=ax} v_ax') (MXU)

Zero HBM random access in either direction — the backward is a dense
matmul instead of the reference's atomic scatter-add
(gridencoder.cu:323-338). Factor tables are tiny (res*R per axis), so
the whole encoder state sits in VMEM during the kernel and in a few MB
of HBM overall.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tests force interpret mode on CPU (runtests.sh env); on TPU the
# kernels compile natively.
def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _tent(pos_ax: jnp.ndarray, res: int, dtype) -> jnp.ndarray:
    """[TM] positions in [0, 1] -> [TM, res] linear-interp weight rows.

    Row m is the tent relu(1 - |p - j|) with p = pos * (res - 1): the
    two nonzeros are exactly (1 - frac) at floor(p) and frac at
    floor(p) + 1, so TENT @ line == lerp(line, p).
    """
    p = jnp.clip(pos_ax, 0.0, 1.0) * (res - 1)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (pos_ax.shape[0], res), 1
    ).astype(jnp.float32)
    return jnp.maximum(1.0 - jnp.abs(cols - p[:, None]), 0.0).astype(dtype)


def _fwd_kernel(resolutions, rank, pos_ref, *refs):
    factor_refs = refs[:-1]
    out_ref = refs[-1]
    pos = pos_ref[:]  # [TM, 3] f32
    # OOB-zero semantics in-kernel (gridencoder.cu:110-135): a
    # post-kernel jnp.where would re-stream the whole [M, nb*R] output
    # through HBM (profiled ~0.7 ms/step at production shapes)
    oob = jnp.any((pos < 0.0) | (pos > 1.0), axis=-1)  # [TM]
    outs = []
    for b, res in enumerate(resolutions):
        fb = factor_refs[b]  # [3, res, R]
        acc = None
        for ax in range(3):
            oh = _tent(pos[:, ax], res, fb.dtype)  # [TM, res]
            v = jnp.dot(oh, fb[ax], preferred_element_type=jnp.float32)  # [TM, R]
            acc = v if acc is None else acc * v
        outs.append(acc)
    out = jnp.concatenate(outs, axis=-1)
    out = jnp.where(oob[:, None], 0.0, out)
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(res, rank, pos_ref, g_ref, f_ref, df_ref):
    """Single-bank backward; df accumulates across the M-block grid."""
    pos = pos_ref[:]
    gb = g_ref[:].astype(jnp.float32)  # [TM, R]
    # mirror the forward's in-kernel OOB-zero: OOB samples contribute
    # no factor gradient (the pre-kernel-mask design got this from the
    # outer jnp.where's autodiff)
    oob = jnp.any((pos < 0.0) | (pos > 1.0), axis=-1)
    gb = jnp.where(oob[:, None], 0.0, gb)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        df_ref[:] = jnp.zeros_like(df_ref)

    # first pass: interpolated line values per axis ([TM, R] each —
    # small); tents are NOT kept live (a [TM, res] tent per axis would
    # blow VMEM at res 2048), they are rebuilt in the second pass
    vs = []
    for ax in range(3):
        oh = _tent(pos[:, ax], res, f_ref.dtype)
        vs.append(jnp.dot(oh, f_ref[ax], preferred_element_type=jnp.float32))
    for ax in range(3):
        others = gb
        for ax2 in range(3):
            if ax2 != ax:
                others = others * vs[ax2]
        oh = _tent(pos[:, ax], res, f_ref.dtype)
        upd = jax.lax.dot_general(
            oh, others.astype(oh.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [res, R]
        df_ref[ax] = df_ref[ax] + upd


def _pad_to(x: jnp.ndarray, m: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % m
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def cp_encode(pos, factors, resolutions: Tuple[int, ...], block: int = 1024,
              out_dtype=jnp.float32):
    """Multiresolution CP encode.

    pos      : [M, 3] float32; out-of-[0,1] samples get ZERO features
               (gridencoder.cu:110-135 semantics, applied in-kernel)
    factors  : tuple of [3, res_b, R] arrays (bf16 or f32)
    returns  : [M, len(factors) * R] ``out_dtype`` (bf16 out halves the
               HBM round trip to the consumer matmul — profiled ~1 ms
               of convert+copy per train step at f32)
    """
    return _cp_encode_fwd_impl(pos, factors, resolutions, block, out_dtype)


def _vmem_block(block, resolutions, rank, itemsize):
    """Clamp the M-block so the kernel's scoped VMEM fits (~16 MB):
    per block row it holds a [blk, res] tent (factor dtype — bf16 OR
    f32), the [blk, nb*R] f32 output, and the resident factor banks."""
    nb = len(resolutions)
    factors_b = sum(3 * r * rank * itemsize for r in resolutions)
    blk = block
    while blk > 128:
        est = blk * max(resolutions) * itemsize + blk * nb * rank * 4 + factors_b
        if est <= 12 * 1024 * 1024:
            break
        blk //= 2
    return blk


def _cp_encode_fwd_impl(pos, factors, resolutions, block, out_dtype=jnp.float32):
    M = pos.shape[0]
    rank = factors[0].shape[-1]
    nb = len(resolutions)
    block = _vmem_block(block, resolutions, rank, factors[0].dtype.itemsize)
    pos_p = _pad_to(pos.astype(jnp.float32), block)
    Mp = pos_p.shape[0]
    grid = (Mp // block,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, resolutions, rank),
        out_shape=jax.ShapeDtypeStruct((Mp, nb * rank), out_dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim, memory_space=pltpu.VMEM)
           for f in factors],
        out_specs=pl.BlockSpec((block, nb * rank), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(pos_p, *factors)
    return out[:M]


def _cp_encode_fwd(pos, factors, resolutions, block, out_dtype=jnp.float32):
    return (
        _cp_encode_fwd_impl(pos, factors, resolutions, block, out_dtype),
        (pos, factors),
    )


def _cp_bwd_banks(pos, factors, g_cp, resolutions, block):
    """Per-bank factor gradients from d(cp features) — the shared
    backward of cp_encode and cp_density (one Pallas kernel per bank,
    tents rebuilt in VMEM; see _bwd_kernel)."""
    rank = factors[0].shape[-1]
    dfactors = []
    for b, res in enumerate(resolutions):
        # VMEM budget: ~2 live [blk, res] tents (factor dtype: bf16 or
        # f32) + the f32 accumulator [3, res, R] + g/vs rows. The 8 MB
        # target reproduces the empirically-working blocks at rank 64
        # bf16 (512 @ res 2048, 1024 below) and shrinks further for
        # larger ranks / f32 factors instead of failing scoped-vmem
        # allocation.
        itemsize = factors[b].dtype.itemsize
        blk = min(block, 1024)
        acc_b = 3 * res * rank * 4
        while blk > 128:
            est = 2 * blk * res * itemsize + acc_b + 4 * blk * rank * 4
            if est <= 8 * 1024 * 1024:
                break
            blk //= 2
        pos_p = _pad_to(pos.astype(jnp.float32), blk)
        Mp = pos_p.shape[0]
        g_p = _pad_to(g_cp.astype(jnp.float32), blk)
        grid = (Mp // blk,)
        gb = g_p[:, b * rank : (b + 1) * rank]
        df = pl.pallas_call(
            functools.partial(_bwd_kernel, res, rank),
            out_shape=jax.ShapeDtypeStruct(factors[b].shape, jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((blk, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, rank), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(factors[b].shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(factors[b].shape, lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(pos_p, gb, factors[b])
        dfactors.append(df.astype(factors[b].dtype))
    return tuple(dfactors)


def _cp_encode_bwd(resolutions, block, out_dtype, res_data, g):
    pos, factors = res_data
    dfactors = _cp_bwd_banks(pos, factors, g, resolutions, block)
    return jnp.zeros_like(pos), dfactors


cp_encode.defvjp(_cp_encode_fwd, _cp_encode_bwd)


def cp_encode_reference(pos, factors, resolutions: Sequence[int]) -> jnp.ndarray:
    """Pure-jnp reference (gather-based lerp) for parity tests and as a
    differentiable CPU fallback."""
    pos = jnp.clip(pos.astype(jnp.float32), 0.0, 1.0)
    outs = []
    for fb, res in zip(factors, resolutions):
        acc = None
        for ax in range(3):
            p = pos[:, ax] * (res - 1)
            i0 = jnp.minimum(jnp.floor(p), res - 2).astype(jnp.int32)
            w = (p - i0)[:, None]
            line = fb[ax].astype(jnp.float32)  # [res, R]
            v = jnp.take(line, i0, axis=0) * (1 - w) + jnp.take(line, i0 + 1, axis=0) * w
            acc = v if acc is None else acc * v
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# fused density head: CP encode + freq + 2-layer MLP in one kernel
# ---------------------------------------------------------------------------


def _freq_ladder(x, degree: int, dtype):
    """[TM, 3] -> [TM, 3*(1+2*degree)] double-angle frequency encoding
    (MUST match ops/freq.py:freq_encode exactly)."""
    outs = [x]
    if degree > 0:
        s = jnp.sin(x)
        c = jnp.cos(x)
        outs.append(s)
        outs.append(c)
        for _ in range(1, degree):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            outs.append(s)
            outs.append(c)
    return jnp.concatenate(outs, axis=-1).astype(dtype)


def _density_kernel(resolutions, rank, freq_degree, pos_ref, *refs):
    """cp features + freq ladder + relu(feats @ w1) @ w2, one pass.

    The fused head keeps the [TM, D] feature row in VMEM: the unfused
    path writes it to HBM (cp_encode output), re-reads it for the freq
    concat, writes the concat, and re-reads it for the MLP — ~4 HBM
    passes over [M, ~680] bf16 per forward that this kernel never pays.
    Replaces the reference's hashgrid -> sigma-MLP hot pair
    (nerf/network.py:94-113) and is the TPU analog of its fully-fused
    FFMLP ambition (ffmlp/src/ffmlp.cu:331-408) on the path where it
    actually pays."""
    nfac = len(resolutions)
    factor_refs = refs[:nfac]
    w1_ref, w2_ref = refs[nfac], refs[nfac + 1]
    out_ref, feats_ref, h1_ref = refs[nfac + 2], refs[nfac + 3], refs[nfac + 4]
    pos = pos_ref[:]  # [TM, 3] f32
    oob = jnp.any((pos < 0.0) | (pos > 1.0), axis=-1)
    outs = []
    for b, res in enumerate(resolutions):
        fb = factor_refs[b]
        acc = None
        for ax in range(3):
            oh = _tent(pos[:, ax], res, fb.dtype)
            v = jnp.dot(oh, fb[ax], preferred_element_type=jnp.float32)
            acc = v if acc is None else acc * v
        outs.append(acc)
    cp = jnp.concatenate(outs, axis=-1)
    cp = jnp.where(oob[:, None], 0.0, cp)  # gridencoder.cu:110-135
    fr = _freq_ladder(2.0 * pos - 1.0, freq_degree, jnp.float32)
    feats = jnp.concatenate([cp, fr], axis=-1).astype(w1_ref.dtype)
    h1 = jnp.dot(feats, w1_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1, 0.0).astype(w1_ref.dtype)  # bf16, like nn.Dense
    out = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)
    feats_ref[:] = feats
    h1_ref[:] = h1


def _density_vmem_block(block, resolutions, rank, itemsize, D, H1):
    nb = len(resolutions)
    fixed = (
        sum(3 * r * rank * itemsize for r in resolutions)
        + D * H1 * itemsize
    )
    blk = block
    while blk > 128:
        est = (
            blk * max(resolutions) * itemsize  # live tent
            + blk * nb * rank * 4              # cp accs f32
            + 2 * blk * D * itemsize           # feats (+concat temp)
            + 2 * blk * H1 * 4                 # h1/out
            + fixed
        )
        if est <= 12 * 1024 * 1024:
            break
        blk //= 2
    return blk


def _cp_density_fwd_impl(pos, factors, w1, w2, resolutions, freq_degree,
                         block):
    M = pos.shape[0]
    rank = factors[0].shape[-1]
    nb = len(resolutions)
    D, H1 = w1.shape
    OUT = w2.shape[1]
    assert D == nb * rank + 3 * (1 + 2 * freq_degree), (D, nb, rank, freq_degree)
    block = _density_vmem_block(
        block, resolutions, rank, factors[0].dtype.itemsize, D, H1
    )
    pos_p = _pad_to(pos.astype(jnp.float32), block)
    Mp = pos_p.shape[0]
    grid = (Mp // block,)
    out, feats, h1 = pl.pallas_call(
        functools.partial(_density_kernel, resolutions, rank, freq_degree),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, OUT), jnp.float32),
            jax.ShapeDtypeStruct((Mp, D), w1.dtype),
            jax.ShapeDtypeStruct((Mp, H1), w1.dtype),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim, memory_space=pltpu.VMEM)
           for f in factors]
        + [
            pl.BlockSpec(w1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, OUT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, H1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(pos_p, *factors, w1, w2)
    return out[:M], feats[:M], h1[:M]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def cp_density(pos, factors, w1, w2, resolutions: Tuple[int, ...],
               freq_degree: int, block: int = 1024):
    """Fused density head: [cp_encode(pos) | freq(2*pos-1)] -> 2-layer
    no-bias MLP (relu between), one Pallas pass.

    pos     : [M, 3] f32 in [0, 1] (OOB rows: cp features zero, freq
              still evaluated — identical to the unfused composition)
    factors : tuple of [3, res_b, R] (bf16/f32)
    w1      : [nb*R + freq_dim, H1], w2: [H1, OUT] (same dtype as the
              MLP compute dtype; grads flow to whatever the caller
              cast from)
    returns : [M, OUT] f32 (head column 0 = raw sigma for trunc_exp,
              1: = geo features)

    Backward: dW1/dW2/dh via plain XLA matmuls on the saved bf16
    feats/h1 residuals; factor grads via the shared per-bank Pallas
    backward (_cp_bwd_banks). d(pos) is zero, matching cp_encode (march
    sample positions are not differentiated)."""
    out, _, _ = _cp_density_fwd_impl(
        pos, factors, w1, w2, resolutions, freq_degree, block
    )
    return out


def _cp_density_fwd(pos, factors, w1, w2, resolutions, freq_degree, block):
    out, feats, h1 = _cp_density_fwd_impl(
        pos, factors, w1, w2, resolutions, freq_degree, block
    )
    return out, (pos, factors, w1, w2, feats, h1)


def _cp_density_bwd(resolutions, freq_degree, block, resid, g):
    pos, factors, w1, w2, feats, h1 = resid
    rank = factors[0].shape[-1]
    nbR = len(resolutions) * rank
    g = g.astype(jnp.float32)
    # dW2 = h1^T g ; dh1 = (g W2^T) * relu'(h1) ; dW1 = feats^T dh1
    dW2 = jax.lax.dot_general(
        h1, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dh1 = jnp.dot(g, w2.astype(jnp.float32).T)
    dh1 = jnp.where(h1 > 0, dh1, 0.0)
    dW1 = jax.lax.dot_general(
        feats, dh1.astype(feats.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dfeat = jnp.dot(dh1.astype(w1.dtype), w1.T,
                    preferred_element_type=jnp.float32)
    dfactors = _cp_bwd_banks(pos, factors, dfeat[:, :nbR], resolutions, block)
    # freq columns: d(pos) is zero by contract (march positions are not
    # differentiated; cp_encode returns zeros the same way)
    return (
        jnp.zeros_like(pos),
        dfactors,
        dW1.astype(w1.dtype),
        dW2.astype(w2.dtype),
    )


cp_density.defvjp(_cp_density_fwd, _cp_density_bwd)


# ---------------------------------------------------------------------------
# fused EVAL radiance head: density + SH(dir) + color MLP in one kernel
# ---------------------------------------------------------------------------


def _sigma_rgb_kernel(resolutions, rank, freq_degree, sh_degree,
                      pos_ref, dir_ref, *refs):
    """cp + freq + sigma MLP + SH(dir) + color MLP + activations, one
    pass; the whole radiance evaluation for a compact sample batch.

    Inference-only (no vjp): unlike cp_density it writes NO residuals —
    the [TM, ~680] feats and [TM, 64] h1 never touch HBM, and neither
    do the SH basis, the concat, or the color hiddens. Output is the
    compositor's [TM, 4] value rows directly: col 0 = exp(sigma_raw)
    (trunc_exp forward, activation.py), cols 1:4 = sigmoid(rgb). The
    TPU answer to the reference's inference-mode fused FFMLP
    (ffmlp/src/ffmlp.cu:331-408 inference=true skips activation
    writeback the same way)."""
    from ngp_tpu.ops.sh import sh_encode

    nfac = len(resolutions)
    factor_refs = refs[:nfac]
    w1_ref, w2_ref = refs[nfac], refs[nfac + 1]
    color_refs = refs[nfac + 2 : -1]
    out_ref = refs[-1]
    pos = pos_ref[:]  # [TM, 3] f32
    oob = jnp.any((pos < 0.0) | (pos > 1.0), axis=-1)
    outs = []
    for b, res in enumerate(resolutions):
        fb = factor_refs[b]
        acc = None
        for ax in range(3):
            oh = _tent(pos[:, ax], res, fb.dtype)
            v = jnp.dot(oh, fb[ax], preferred_element_type=jnp.float32)
            acc = v if acc is None else acc * v
        outs.append(acc)
    cp = jnp.concatenate(outs, axis=-1)
    cp = jnp.where(oob[:, None], 0.0, cp)  # gridencoder.cu:110-135
    fr = _freq_ladder(2.0 * pos - 1.0, freq_degree, jnp.float32)
    feats = jnp.concatenate([cp, fr], axis=-1).astype(w1_ref.dtype)
    h1 = jnp.dot(feats, w1_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1, 0.0).astype(w1_ref.dtype)
    h = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32)
    sigma = jnp.exp(h[:, :1])  # trunc_exp forward (f32, eval: no grad)
    geo = h[:, 1:].astype(w1_ref.dtype)
    sh = sh_encode(dir_ref[:], sh_degree).astype(w1_ref.dtype)
    c = jnp.concatenate([sh, geo], axis=-1)  # SH first (network.color)
    for i in range(len(color_refs)):
        c = jnp.dot(c, color_refs[i][:], preferred_element_type=jnp.float32)
        if i != len(color_refs) - 1:
            c = jnp.maximum(c, 0.0).astype(w1_ref.dtype)
    rgb = jax.nn.sigmoid(c)  # [TM, 3] f32
    out_ref[:] = jnp.concatenate([sigma, rgb], axis=-1)


def cp_sigma_rgb(pos, dirs, factors, w1, w2, color_ws,
                 resolutions: Tuple[int, ...], freq_degree: int,
                 sh_degree: int, block: int = 1024):
    """Fused eval radiance: [M, 3] pos + [M, 3] unit dirs -> [M, 4] f32
    compositor rows (sigma, r, g, b). EVAL-ONLY — no custom vjp; the
    training path keeps cp_density (which saves residuals for its
    backward). color_ws: tuple of color-MLP Dense kernels
    ([sh_dim + geo, H] ... [H, 3], no bias — models/mlp.py)."""
    M = pos.shape[0]
    rank = factors[0].shape[-1]
    D, H1 = w1.shape
    block = _density_vmem_block(
        block, resolutions, rank, factors[0].dtype.itemsize, D, H1
    )
    pos_p = _pad_to(pos.astype(jnp.float32), block)
    dir_p = _pad_to(dirs.astype(jnp.float32), block)
    Mp = pos_p.shape[0]
    grid = (Mp // block,)
    out = pl.pallas_call(
        functools.partial(
            _sigma_rgb_kernel, resolutions, rank, freq_degree, sh_degree
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, 4), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(f.shape, lambda i: (0,) * f.ndim, memory_space=pltpu.VMEM)
           for f in factors]
        + [
            pl.BlockSpec(w1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for w in color_ws],
        out_specs=pl.BlockSpec((block, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(pos_p, dir_p, *factors, w1, w2, *color_ws)
    return out[:M]
