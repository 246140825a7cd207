"""Typed configuration dataclasses.

Replaces the reference's argparse-namespace-splat idiom (``vars(opt)``
forwarded into render calls, ``nerf/utils.py:510``) with explicit,
hashable, static dataclasses — required anyway for jit static args.
Flag surface mirrors ``main_nerf.py:15-63``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Scene/rendering geometry — the NeRFRenderer constructor surface
    (nerf/renderer.py:61-101) plus the per-call render kwargs."""

    bound: float = 1.0
    density_scale: float = 1.0
    min_near: float = 0.2
    density_thresh: float = 0.01
    bg_radius: float = -1.0

    # non-accelerated path (renderer.run)
    num_steps: int = 128
    upsample_steps: int = 128

    # accelerated path (occupancy grid marching)
    grid_size: int = 128
    dt_gamma: float = 0.0
    max_steps: int = 1024
    t_thresh: float = 1e-4
    # static per-ray sample budget for the fixed-shape TPU march; the
    # CUDA reference packs variable counts with atomics (mean_count
    # heuristic, raymarching.py:198-203) — on TPU the budget is a
    # compile-time constant instead.
    max_samples_per_ray: int = 256

    # D-NeRF: number of time slices in the dynamic density grid
    # (dnerf/renderer.py:74)
    time_size: int = 64

    # --- turbo march (TPU-native v2 path) --------------------------------
    # Replaces per-probe occupancy gathers (XLA gathers cost ~15 ns/row
    # on TPU regardless of width) with a one-hot-matmul coarse test
    # against a bit-packed 32^3 pooled grid, a per-crossing 64-bit fine
    # payload gather, and valid-only global sample compaction.
    turbo: bool = False
    # per-ray candidate budget after the coarse test (then fine-tested
    # and compacted to max_samples_per_ray)
    coarse_candidates: int = 96
    # per-ray budget of distinct coarse-cell crossings (fine payload
    # rows gathered per ray); overflow crossings are dropped far-first,
    # the same budget semantics as the reference's mean_count cap
    # (raymarching.py:198-203)
    crossing_slots: int = 16
    # global compacted-sample budget as a mean samples/ray multiplier:
    # M = num_rays * compact_mean_samples; trailing rays beyond the
    # budget keep only their in-budget prefix (the CUDA marcher's point
    # buffer fills the same way, raymarching.cu:405-414). NOTE: during
    # the first steps, while the occupancy grid is still dense, mean
    # occupancy can exceed this budget and late rays composite to
    # background until the first grid refreshes sparsify it — the
    # per-step `turbo_overflow` metric reports the dropped fraction.
    compact_mean_samples: int = 16
    # transmittance-proxy early-out (EVAL dial; None = off): march
    # candidates whose ESTIMATED transmittance — the density grid's
    # log-quantized, 3^3-ERODED per-fine-cell density accumulated
    # along the ray — falls below this never become samples, so the
    # global eval budget flows to VISIBLE samples. The TPU analog of
    # the reference inference loop's exact per-ray early termination
    # (raymarching.cu:700-914: dead rays stop paying for network
    # evals). The erosion makes the estimate a strict UNDERestimate
    # (boundary cells of the EMA-max grid otherwise read fully dense
    # and grazing rays cull real content), so this can sit at the
    # exact composite's t_thresh (e.g. 1e-4).
    t_proxy_thresh: Optional[float] = None
    # world-space probe-lattice coverage (march t-span). None = the full
    # AABB chord 2*sqrt(3)*bound. A caller that KNOWS occupied space is
    # smaller (occupancy.occupied_aabb) can shrink it: the static probe
    # count K = lattice_probes(cfg) scales with this span at UNCHANGED
    # dt, cutting every K-proportional march stage. Pair it with the
    # matching tight `aabb` render argument so nears start at the
    # occupied region (samples only ever materialize in occupied cells,
    # which the tight box contains by construction).
    lattice_span: Optional[float] = None

    @property
    def cascades(self) -> int:
        return 1 + math.ceil(math.log2(max(self.bound, 1.0)))

    @property
    def aabb(self) -> Tuple[float, ...]:
        b = self.bound
        return (-b, -b, -b, b, b, b)


@dataclasses.dataclass(frozen=True)
class NetworkConfig:
    """NeRFNetwork topology (nerf/network.py:10-31)."""

    encoding: str = "hashgrid"
    encoding_dir: str = "sphere_harmonics"
    encoding_bg: str = "hashgrid"
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    # encoder geometry
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    sh_degree: int = 4
    # cpgrid encoder (multiresolution CP factor banks, evaluated by
    # MXU matmuls — ngp_tpu.ops.pallas.cp_kernels)
    cp_resolutions: Tuple[int, ...] = (256, 512, 1024, 2048)
    cp_rank: int = 64
    cp_freq_degree: int = 5
    # compute precision for MLPs/encoders ("bfloat16" replaces the
    # reference's fp16 AMP + GradScaler; bf16 needs no loss scaling)
    use_bf16: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Trainer/optimization surface (main_nerf.py flags + Trainer args)."""

    iters: int = 30000
    lr: float = 1e-2
    num_rays: int = 4096
    eval_interval: int = 50  # epochs
    update_extra_interval: int = 16
    max_keep_ckpt: int = 2
    ema_decay: float = 0.95
    error_map: bool = False
    # fraction of each error-map batch drawn uniformly (TPU-specific
    # guard against error-concentrated batches overflowing the static
    # turbo sample budget — see raysampler.sample_ray_indices; the CUDA
    # reference needs no such guard because its marcher allocates
    # samples dynamically)
    error_map_uniform_frac: float = 0.5
    # coarse error-map resolution (reference: fixed 128, utils.py:107).
    # Without-replacement weighted draws need cells >> draws: at
    # num_rays=16384 a 128^2 map is provably inert (every cell drawn);
    # 256 restores the reference's 4096-draws-over-16384-cells ratio
    error_map_size: int = 128
    patch_size: int = 1
    rand_pose: int = -1
    seed: int = 0
    workspace: str = "workspace"
    ckpt: str = "latest"
    # regularisers (reference gridencoder grad_total_variation /
    # loss.py EffDistLoss, off by default like the reference mains)
    tv_weight: float = 0.0
    distortion_weight: float = 0.0
    # 'linear': dataset images are converted srgb->linear at load and
    # exported frames converted back (nerf/utils.py:691-713)
    color_space: str = "srgb"
