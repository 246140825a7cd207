"""CCNeRF: rank-residual grouped tensor decomposition with
post-training compression and scene composition.

TPU-native equivalent of the reference's ``tensoRF/network_cc.py``:

- density/color fields are sums over K rank GROUPS of (a) CP terms —
  rank-r products of three line factors U_vec [r, H] mixed by
  S_vec [out, r] — and (b) triple-plane terms — products of three
  plane factors U_mat [r, H, W] sampled at the three axis-pair
  projections, mixed by S_mat [out, r] (network_cc.py:128-249;
  grid_sample here uses align_corners=FALSE).
- color output dim = 3 * degree^2; rgb = sigmoid(<feats, SH(d)>)
  (network_cc.py:289-294) — no MLP at all.
- rank-residual training: the forward returns CUMULATIVE per-group
  outputs [K, N, ...]; the loss averages over K so every rank prefix
  is a working model (network_cc.py:274-296 + nerf/utils.py:529-531).
- ``finalize`` sorts ranks by importance and fuses groups;
  ``compress`` slices the leading ranks; ``compose`` concatenates
  several finalized models with per-object rigid transforms and
  softmax-sigma color blending (network_cc.py:463-625).

Because these operations are param-shape surgery, the model is a
functional pytree (plain dicts of arrays) rather than a linen module —
param surgery is then literal dict manipulation, and every method is a
pure function jitted by the trainer.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.models.tensorf import MAT_IDS, VEC_IDS
from ngp_tpu.ops.activation import trunc_exp
from ngp_tpu.ops.interp import sample_1d, sample_2d
from ngp_tpu.ops.sh import sh_encode


@dataclasses.dataclass(frozen=True)
class CCNeRFConfig:
    resolution: Tuple[int, int, int] = (128, 128, 128)
    degree: int = 4
    # cumulative ranks per group (network_cc.py:21-24)
    rank_vec_density: Tuple[int, ...] = (64, 64, 64, 64, 64)
    rank_mat_density: Tuple[int, ...] = (0, 4, 8, 12, 16)
    rank_vec: Tuple[int, ...] = (64, 64, 64, 64, 64)
    rank_mat: Tuple[int, ...] = (0, 4, 16, 32, 64)

    @property
    def K(self) -> int:
        return len(self.rank_vec)

    @property
    def out_dim(self) -> int:
        return 3 * self.degree**2

    def group_sizes(self, cumulative: Sequence[int]) -> List[int]:
        return np.diff(np.asarray(cumulative), prepend=0).tolist()


def _kaiming(key, shape):
    fan_in = shape[1]
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, shape)


def init_ccnerf(key: jax.Array, cfg: CCNeRFConfig) -> Dict:
    """Params: for each kind in (vec_density, mat_density, vec, mat) a
    list of per-group dicts {"U": [3 factors], "S": [out, r]}."""

    def make(kind: str, cumulative, out_dim, is_mat):
        nonlocal key
        groups = []
        for g in cfg.group_sizes(cumulative):
            if g <= 0:
                continue
            U = []
            for i in range(3):
                key, k = jax.random.split(key)
                if is_mat:
                    m0, m1 = MAT_IDS[i]
                    shape = (g, cfg.resolution[m1], cfg.resolution[m0])
                else:
                    shape = (g, cfg.resolution[VEC_IDS[i]])
                U.append(0.2 * jax.random.normal(k, shape))
            key, k = jax.random.split(key)
            S = _kaiming(k, (out_dim, g))
            groups.append({"U": U, "S": S})
        return groups

    return {
        "vec_density": make("vec_density", cfg.rank_vec_density, 1, False),
        "mat_density": make("mat_density", cfg.rank_mat_density, 1, True),
        "vec": make("vec", cfg.rank_vec, cfg.out_dim, False),
        "mat": make("mat", cfg.rank_mat, cfg.out_dim, True),
    }


def _group_features(group: Dict, xn: jnp.ndarray, is_mat: bool) -> jnp.ndarray:
    """[out, N] contribution of one rank group at normalized coords."""
    if is_mat:
        feat = None
        for i in range(3):
            m0, m1 = MAT_IDS[i]
            uv = jnp.stack([xn[:, m0], xn[:, m1]], axis=-1)
            f = sample_2d(group["U"][i], uv, align_corners=False)
            feat = f if feat is None else feat * f
    else:
        feat = None
        for i in range(3):
            f = sample_1d(group["U"][i], xn[:, VEC_IDS[i]], align_corners=False)
            feat = f if feat is None else feat * f
    return group["S"] @ feat  # [out, N]


def _features(params_kind_vec, params_kind_mat, xn, K: int, residual: bool):
    """Cumulative per-group outputs. Groups with 0 rank contribute 0
    but still occupy a K slot (mirroring network_cc.py's group loop).

    Returns [K, N, out] when residual else [N, out]."""
    # map group list entries onto K slots: empty groups were skipped at
    # init; reconstruct alignment by walking sizes
    outputs = []
    last = None
    iv = im = 0
    for k in range(K):
        y = None
        if iv < len(params_kind_vec["slots"]) and params_kind_vec["slots"][iv] == k:
            f = _group_features(params_kind_vec["groups"][iv], xn, False)
            y = f if y is None else y + f
            iv += 1
        if im < len(params_kind_mat["slots"]) and params_kind_mat["slots"][im] == k:
            f = _group_features(params_kind_mat["groups"][im], xn, True)
            y = f if y is None else y + f
            im += 1
        if y is None:
            y = jnp.zeros_like(last) if last is not None else None
        if last is not None and y is not None:
            y = y + last
        last = y
        if residual:
            outputs.append(y)
    if residual:
        return jnp.stack([o.T for o in outputs])  # [K, N, out]
    return last.T  # [N, out]


class CCNeRF:
    """Functional model. ``params`` is the pytree from
    :func:`init_ccnerf` (plus, after ``compose``, per-object lists)."""

    def __init__(self, cfg: CCNeRFConfig, bound: float = 1.0):
        self.cfg = cfg
        self.bound = bound
        self.aabb = np.asarray([-bound] * 3 + [bound] * 3, np.float32)
        self.finalized = cfg.K == 1
        # objects: list of (params, T_4x4 or None, R_3x3 or None, aabb)
        self.objects: Optional[List] = None

    # ---- slot bookkeeping -------------------------------------------------

    def _with_slots(self, params):
        """Attach static slot indices (which K slot each stored group
        belongs to) for each kind."""
        out = {}
        for kind, cumulative in (
            ("vec_density", self.cfg.rank_vec_density),
            ("mat_density", self.cfg.rank_mat_density),
            ("vec", self.cfg.rank_vec),
            ("mat", self.cfg.rank_mat),
        ):
            sizes = self.cfg.group_sizes(cumulative)
            slots = [k for k, g in enumerate(sizes) if g > 0]
            out[kind] = {"groups": params[kind], "slots": slots[: len(params[kind])]}
        return out

    def normalize(self, x, aabb):
        aabb = jnp.asarray(aabb)
        return 2.0 * (x - aabb[:3]) / (aabb[3:] - aabb[:3]) - 1.0

    # ---- forward ----------------------------------------------------------

    def sigma_rgb(self, params, x, d, K: int = -1, residual: bool = False):
        """x: [N, 3] world; d: [N, 3] unit dirs.

        residual → (sigma [K, N], rgb [K, N, 3]); else ([N], [N, 3])."""
        if self.objects is not None:
            shape = x.shape[:-1]
            sigma, rgb = self._compose_forward(x.reshape(-1, 3), d.reshape(-1, 3))
            return sigma.reshape(shape), rgb.reshape(*shape, 3)
        K = self.cfg.K if K <= 0 else K
        p = self._with_slots(params)
        xn = self.normalize(x, self.aabb)
        fd = _features(p["vec_density"], p["mat_density"], xn, K, residual)
        sigma = trunc_exp(fd[..., 0])
        fc = _features(p["vec"], p["mat"], xn, K, residual)
        enc_d = sh_encode(d, self.cfg.degree)  # [N, C]
        C = self.cfg.degree**2
        if residual:
            h = fc.reshape(K, x.shape[0], 3, C)
            rgb = jax.nn.sigmoid(jnp.einsum("knoc,nc->kno", h, enc_d))
        else:
            h = fc.reshape(x.shape[0], 3, C)
            rgb = jax.nn.sigmoid(jnp.einsum("noc,nc->no", h, enc_d))
        return sigma, rgb

    def density(self, params, x):
        if self.objects is not None:
            sigma, _ = self._compose_forward(x.reshape(-1, 3), None)
            return sigma.reshape(x.shape[:-1]), x
        p = self._with_slots(params)
        xn = self.normalize(x.reshape(-1, 3), self.aabb)
        fd = _features(p["vec_density"], p["mat_density"], xn, self.cfg.K, False)
        return trunc_exp(fd[..., 0]).reshape(x.shape[:-1]), x

    def _compose_forward(self, x, d):
        """Multi-object scene: sigma = sum, color = softmax(sigma)-
        weighted blend of per-object raw color logits
        (network_cc.py:297-335)."""
        sigmas, hs = [], []
        N = x.shape[0]
        for (params, T, R, aabb, cfg) in self.objects:
            xo = x
            if T is not None:
                xo = (jnp.concatenate([x, jnp.ones((N, 1))], -1) @ jnp.asarray(T).T)[:, :3]
            sub = CCNeRF(cfg, bound=self.bound)
            sub.aabb = aabb
            p = sub._with_slots(params)
            xn = sub.normalize(xo, aabb)
            fd = _features(p["vec_density"], p["mat_density"], xn, cfg.K, False)
            sigma = trunc_exp(fd[..., 0])
            sigmas.append(sigma)
            if d is not None:
                do = d if R is None else d @ jnp.asarray(R).T
                fc = _features(p["vec"], p["mat"], xn, cfg.K, False)
                enc_d = sh_encode(do, cfg.degree)
                h = fc.reshape(N, 3, cfg.degree**2)
                hs.append(jnp.einsum("noc,nc->no", h, enc_d))
        sigma_all = sum(sigmas)
        if d is None:
            return sigma_all, None
        ws = jax.nn.softmax(jnp.stack(sigmas), axis=0)  # [O, N]
        rgb = jax.nn.sigmoid(sum(h * w[:, None] for h, w in zip(hs, ws)))
        return sigma_all, rgb

    # ---- post-training ops ------------------------------------------------

    def finalize(self, params) -> Dict:
        """Sort ranks by importance within groups, fuse groups
        (network_cc.py:463-516). Returns fused params; self becomes a
        single-group model."""
        params = jax.device_get(params)
        new = {}
        new_ranks = {}
        for kind, is_mat in (
            ("vec_density", False), ("mat_density", True),
            ("vec", False), ("mat", True),
        ):
            groups = params[kind]
            if not groups:
                new[kind] = []
                new_ranks[kind] = 0
                continue
            sorted_groups = []
            for g in groups:
                importance = np.abs(np.asarray(g["S"])).sum(0)
                for u in g["U"]:
                    importance = importance * np.linalg.norm(
                        np.asarray(u).reshape(len(importance), -1), axis=-1
                    )
                order = np.argsort(-importance)
                sorted_groups.append(
                    {
                        "U": [np.asarray(u)[order] for u in g["U"]],
                        "S": np.asarray(g["S"])[:, order],
                    }
                )
            fused = {
                "U": [
                    np.concatenate([g["U"][i] for g in sorted_groups], axis=0)
                    for i in range(3)
                ],
                "S": np.concatenate([g["S"] for g in sorted_groups], axis=1),
            }
            new[kind] = [jax.tree.map(jnp.asarray, fused)]
            new_ranks[kind] = fused["S"].shape[1]
        self.cfg = dataclasses.replace(
            self.cfg,
            rank_vec_density=(new_ranks["vec_density"],),
            rank_mat_density=(new_ranks["mat_density"],),
            rank_vec=(new_ranks["vec"],),
            rank_mat=(new_ranks["mat"],),
        )
        self.finalized = True
        return new

    def compress(self, params, ranks: Tuple[int, int, int, int]) -> Dict:
        """Slice to (density_vec, density_mat, color_vec, color_mat)
        leading ranks (network_cc.py:518-549)."""
        if not self.finalized:
            params = self.finalize(params)
        new = {}
        for kind, r in zip(("vec_density", "mat_density", "vec", "mat"), ranks):
            if r == 0 or not params[kind]:
                new[kind] = []
                continue
            g = params[kind][0]
            new[kind] = [
                {"U": [u[:r] for u in g["U"]], "S": g["S"][:, :r]}
            ]
        self.cfg = dataclasses.replace(
            self.cfg,
            rank_vec_density=(ranks[0],) if ranks[0] else (0,),
            rank_mat_density=(ranks[1],) if ranks[1] else (0,),
            rank_vec=(ranks[2],) if ranks[2] else (0,),
            rank_mat=(ranks[3],) if ranks[3] else (0,),
        )
        return new

    def compose(self, models_params: List[Tuple["CCNeRF", Dict]], transforms=None):
        """Build a multi-object scene. ``transforms``: per-object
        (T_4x4, R_3x3) world→object maps, or None for identity
        (network_cc.py:551-625)."""
        self.objects = []
        for idx, (model, params) in enumerate(models_params):
            if not model.finalized:
                params = model.finalize(params)
            T = R = None
            if transforms is not None and transforms[idx] is not None:
                T, R = transforms[idx]
            self.objects.append((params, T, R, model.aabb, model.cfg))
        return self
