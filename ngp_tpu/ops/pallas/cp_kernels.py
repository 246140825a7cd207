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


def _cp_encode_bwd(resolutions, block, out_dtype, res_data, g):
    pos, factors = res_data
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
        g_p = _pad_to(g.astype(jnp.float32), blk)
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
    return jnp.zeros_like(pos), tuple(dfactors)


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
