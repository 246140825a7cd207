"""TensoRF: vector-matrix (VM) and CP tensor decompositions.

TPU-native equivalent of the reference's ``tensoRF/network.py``
(VM) and ``tensoRF/network_cp.py`` (CP):

- VM: density = sum over 3 axis-pairs of <plane(x_pair), line(x_axis)>
  over ranks; color features = basis_mat(concat over pairs of
  plane*line) → freq-encode(feat) ⊕ freq-encode(dir) → 3-layer MLP
  (tensoRF/network.py:99-197).
- CP: rank-R product of three per-axis lines for density; same for
  color features (tensoRF/network_cp.py:67-150).
- progressive upsample (bilinear, align_corners=True; resolutions
  log-spaced — main_tensoRF.py:132) and occupancy-driven shrink
  (network.py:282-318) are pure param-pytree transforms here
  (:func:`upsample_vm_params`, :func:`shrink_vm_params`), after which
  the trainer re-jits and resets the optimizer, mirroring the
  reference's optimizer re-init (tensoRF/utils.py:111-129).

TPU notes: grid_sample becomes gather+lerp (ngp_tpu.ops.interp); the
scene AABB (mutated by shrink) is a runtime argument, not a buffer, so
shrinking changes no jit signatures except the param shapes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.models.mlp import MLP
from ngp_tpu.ops.activation import trunc_exp
from ngp_tpu.ops.freq import freq_encode
from ngp_tpu.ops.interp import resize_bilinear, sample_1d, sample_2d

# axis layout (tensoRF/network.py:36-37): component i uses plane over
# axes MAT_IDS[i] (stored [R, res[m1], res[m0]]) and line over VEC_IDS[i]
MAT_IDS = ((0, 1), (0, 2), (1, 2))
VEC_IDS = (2, 1, 0)


def _normalize(x, aabb):
    """[-bound, bound] world coords → [-1, 1] inside the (shrinkable)
    training AABB (tensoRF/network.py:166)."""
    return 2.0 * (x - aabb[:3]) / (aabb[3:] - aabb[:3]) - 1.0


class TensoRFNetwork(nn.Module):
    """VM decomposition. Resolution is only an init-time size — method
    code reads shapes from the params, so upsample/shrink need no
    module rebuild."""

    resolution: Tuple[int, int, int] = (128, 128, 128)
    sigma_rank: Tuple[int, int, int] = (16, 16, 16)
    color_rank: Tuple[int, int, int] = (48, 48, 48)
    color_feat_dim: int = 27
    num_layers: int = 3
    hidden_dim: int = 128
    bg_resolution: Tuple[int, int] = (512, 512)
    bg_rank: int = 8
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    bg_radius: float = -1.0

    def setup(self):
        def svd_init(prefix, ranks):
            mats, vecs = [], []
            for i in range(3):
                m0, m1 = MAT_IDS[i]
                v = VEC_IDS[i]
                mats.append(
                    self.param(
                        f"{prefix}_mat_{i}",
                        lambda k, s: 0.1 * jax.random.normal(k, s),
                        (ranks[i], self.resolution[m1], self.resolution[m0]),
                    )
                )
                vecs.append(
                    self.param(
                        f"{prefix}_vec_{i}",
                        lambda k, s: 0.1 * jax.random.normal(k, s),
                        (ranks[i], self.resolution[v]),
                    )
                )
            return mats, vecs

        self.sigma_mat, self.sigma_vec = svd_init("sigma", self.sigma_rank)
        self.color_mat, self.color_vec = svd_init("color", self.color_rank)
        self.basis_mat = nn.Dense(self.color_feat_dim, use_bias=False, name="basis_mat")
        self.color_net = MLP(
            dim_out=3, dim_hidden=self.hidden_dim, num_layers=self.num_layers,
            name="color_net",
        )
        if self.bg_radius > 0:
            self.bg_mat = self.param(
                "bg_mat",
                lambda k, s: 0.1 * jax.random.normal(k, s),
                (self.bg_rank, self.bg_resolution[0], self.bg_resolution[1]),
            )
            self.bg_net = MLP(
                dim_out=3, dim_hidden=self.hidden_dim_bg,
                num_layers=self.num_layers_bg, name="bg_net",
            )

    # ---- field queries (x normalized to [-1, 1]) -------------------------

    def _vm_features(self, xn, mats, vecs):
        """xn: [N, 3] in [-1, 1] → [sum(R), N] plane*line products."""
        feats = []
        for i in range(3):
            m0, m1 = MAT_IDS[i]
            v = VEC_IDS[i]
            uv = jnp.stack([xn[:, m0], xn[:, m1]], axis=-1)  # u→W axis=m0
            pf = sample_2d(mats[i], uv, align_corners=True)  # [R, N]
            lf = sample_1d(vecs[i], xn[:, v], align_corners=True)  # [R, N]
            feats.append(pf * lf)
        return jnp.concatenate(feats, axis=0)

    def sigma_feat(self, xn):
        return jnp.sum(self._vm_features(xn, self.sigma_mat, self.sigma_vec), axis=0)

    def color_feat(self, xn):
        f = self._vm_features(xn, self.color_mat, self.color_vec)  # [3R, N]
        return self.basis_mat(f.T)  # [N, C]

    # ---- renderer interface ---------------------------------------------

    def density(self, x, aabb):
        """x: [..., 3] world → (sigma [...], geo=x passthrough)."""
        shape = x.shape[:-1]
        xn = _normalize(x.reshape(-1, 3), aabb)
        sigma = trunc_exp(self.sigma_feat(xn)).reshape(shape)
        return sigma, x

    def color(self, d, x, aabb):
        """d: [..., 3] dirs; x: [..., 3] world (geo from density)."""
        shape = d.shape[:-1]
        xn = _normalize(x.reshape(-1, 3), aabb)
        feat = self.color_feat(xn)  # [N, C]
        h = jnp.concatenate(
            [freq_encode(feat, 2), freq_encode(d.reshape(-1, 3), 2)], axis=-1
        )
        rgb = nn.sigmoid(self.color_net(h).astype(jnp.float32))
        return rgb.reshape(*shape, 3)

    def __call__(self, x, d, aabb):
        sigma, geo = self.density(x, aabb)
        return sigma, self.color(d, geo, aabb)

    def background(self, sph, d):
        """sph: [..., 2] in [-1, 1] (tensoRF/network.py:200-217)."""
        shape = sph.shape[:-1]
        h = sample_2d(self.bg_mat, sph.reshape(-1, 2), align_corners=True).T
        h = jnp.concatenate([freq_encode(d.reshape(-1, 3), 2), h], axis=-1)
        rgb = nn.sigmoid(self.bg_net(h).astype(jnp.float32))
        return rgb.reshape(*shape, 3)

    def full_init(self, x, d, aabb):
        sigma, rgb = self(x, d, aabb)
        if self.bg_radius > 0:
            sph = jnp.zeros(x.shape[:-1] + (2,), x.dtype)
            rgb = rgb + 0.0 * self.background(sph, d)
        return sigma, rgb

    def density_loss(self):
        """L1 on sigma factors (tensoRF/network.py:258-263)."""
        loss = 0.0
        for i in range(3):
            loss = loss + jnp.mean(jnp.abs(self.sigma_mat[i]))
            loss = loss + jnp.mean(jnp.abs(self.sigma_vec[i]))
        return loss


class TensoRFCPNetwork(nn.Module):
    """CP decomposition (tensoRF/network_cp.py): rank-R product of three
    per-axis line factors; color features = basis_mat of the products."""

    resolution: Tuple[int, int, int] = (300, 300, 300)
    sigma_rank: int = 96
    color_rank: int = 288
    color_feat_dim: int = 27
    num_layers: int = 3
    hidden_dim: int = 128

    def setup(self):
        def lines(prefix, rank):
            return [
                self.param(
                    f"{prefix}_vec_{i}",
                    lambda k, s: 0.2 * jax.random.normal(k, s),
                    (rank, self.resolution[VEC_IDS[i]]),
                )
                for i in range(3)
            ]

        self.sigma_vec = lines("sigma", self.sigma_rank)
        self.color_vec = lines("color", self.color_rank)
        self.basis_mat = nn.Dense(self.color_feat_dim, use_bias=False, name="basis_mat")
        self.color_net = MLP(
            dim_out=3, dim_hidden=self.hidden_dim, num_layers=self.num_layers,
            name="color_net",
        )

    def _cp_features(self, xn, vecs):
        f = sample_1d(vecs[0], xn[:, VEC_IDS[0]])
        f = f * sample_1d(vecs[1], xn[:, VEC_IDS[1]])
        f = f * sample_1d(vecs[2], xn[:, VEC_IDS[2]])
        return f  # [R, N]

    def density(self, x, aabb):
        shape = x.shape[:-1]
        xn = _normalize(x.reshape(-1, 3), aabb)
        sigma = trunc_exp(jnp.sum(self._cp_features(xn, self.sigma_vec), axis=0))
        return sigma.reshape(shape), x

    def color(self, d, x, aabb):
        shape = d.shape[:-1]
        xn = _normalize(x.reshape(-1, 3), aabb)
        feat = self.basis_mat(self._cp_features(xn, self.color_vec).T)
        h = jnp.concatenate(
            [freq_encode(feat, 2), freq_encode(d.reshape(-1, 3), 2)], axis=-1
        )
        rgb = nn.sigmoid(self.color_net(h).astype(jnp.float32))
        return rgb.reshape(*shape, 3)

    def __call__(self, x, d, aabb):
        sigma, geo = self.density(x, aabb)
        return sigma, self.color(d, geo, aabb)

    def full_init(self, x, d, aabb):
        return self(x, d, aabb)

    def density_loss(self):
        loss = 0.0
        for i in range(3):
            loss = loss + jnp.mean(jnp.abs(self.sigma_vec[i]))
        return loss


# ---------------------------------------------------------------------------
# param-pytree transforms: progressive upsample & occupancy shrink
# ---------------------------------------------------------------------------


def upsample_vm_params(params, new_resolution: Sequence[int]):
    """Bilinearly upsample all VM factors to ``new_resolution``
    (upsample_model, tensoRF/network.py:268-280). Returns new params."""
    p = dict(params["params"])
    for prefix in ("sigma", "color"):
        for i in range(3):
            m0, m1 = MAT_IDS[i]
            v = VEC_IDS[i]
            mk = f"{prefix}_mat_{i}"
            vk = f"{prefix}_vec_{i}"
            if mk in p:
                p[mk] = resize_bilinear(
                    p[mk], (new_resolution[m1], new_resolution[m0]), align_corners=True
                )
            if vk in p:
                vec = p[vk][:, :, None]  # [R, D, 1]
                p[vk] = resize_bilinear(
                    vec, (new_resolution[v], 1), align_corners=True
                )[:, :, 0]
    return {**params, "params": p}


def upsample_cp_params(params, new_resolution: Sequence[int]):
    p = dict(params["params"])
    for prefix in ("sigma", "color"):
        for i in range(3):
            vk = f"{prefix}_vec_{i}"
            if vk in p:
                vec = p[vk][:, :, None]
                p[vk] = resize_bilinear(
                    vec, (new_resolution[VEC_IDS[i]], 1), align_corners=True
                )[:, :, 0]
    return {**params, "params": p}


def shrink_vm_params(
    params,
    aabb: np.ndarray,
    occ_density: np.ndarray,
    mean_density: float,
    density_thresh: float,
    bound: float,
    grid_size: int,
):
    """Crop factors to the AABB of occupied density-grid cells
    (shrink_model, tensoRF/network.py:282-318). Host-side (shapes
    change). Returns (new_params, new_aabb [6])."""
    half = bound / grid_size
    thresh = min(density_thresh, mean_density)
    occ = np.asarray(occ_density[-1]).reshape(grid_size, grid_size, grid_size) > thresh
    idx = np.stack(np.nonzero(occ), axis=-1)  # [Nz, 3]
    if len(idx) == 0:
        return params, aabb
    pos = (2 * idx / (grid_size - 1) - 1) * (bound - half)
    min_pos = pos.min(0) - half
    max_pos = pos.max(0) + half

    res = _vm_resolution(params)
    units = (aabb[3:] - aabb[:3]) / np.array(res)
    tl = np.clip(np.round((min_pos - aabb[:3]) / units).astype(int), 0, None)
    br = np.minimum(np.round((max_pos - aabb[:3]) / units).astype(int), res)

    p = dict(params["params"])
    for prefix in ("sigma", "color"):
        for i in range(3):
            m0, m1 = MAT_IDS[i]
            v = VEC_IDS[i]
            p[f"{prefix}_vec_{i}"] = p[f"{prefix}_vec_{i}"][:, tl[v] : br[v]]
            p[f"{prefix}_mat_{i}"] = p[f"{prefix}_mat_{i}"][
                :, tl[m1] : br[m1], tl[m0] : br[m0]
            ]
    new_aabb = np.concatenate([min_pos, max_pos]).astype(np.float32)
    return {**params, "params": p}, new_aabb


def _vm_resolution(params) -> Tuple[int, int, int]:
    """Recover current (res_x, res_y, res_z) from factor shapes."""
    p = params["params"]
    # vec i covers axis VEC_IDS[i]
    res = [0, 0, 0]
    for i in range(3):
        res[VEC_IDS[i]] = p[f"sigma_vec_{i}"].shape[1]
    return tuple(res)
