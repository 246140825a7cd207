"""ngp_tpu — a TPU-native neural graphics primitives framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ashawkey/torch-ngp (instant-ngp NeRF / SDF / TensoRF / CCNeRF / D-NeRF
training and rendering), designed TPU-first:

- fixed-shape, mask-based ray marching (no atomics / dynamic compaction)
- bf16 MXU matmul network evaluation on dense [rays, samples] batches
- hash-grid encoding as vectorized gather + scatter-add (Pallas for the
  hot paths)
- `jax.sharding.Mesh` + jit for multi-chip data parallelism
- functional train state (flax + optax + orbax)

Package layout mirrors the reference's layer map (SURVEY.md §1):

- ``ngp_tpu.ops``      — L0/L1: encoders, marching, compositing, losses
- ``ngp_tpu.models``   — L2: renderers + network heads (NeRF, SDF,
                          TensoRF, CCNeRF, D-NeRF)
- ``ngp_tpu.data``     — L3: dataset providers + ray generation
- ``ngp_tpu.training`` — L4: Trainer, metrics, checkpointing, EMA
- ``ngp_tpu.parallel`` — mesh / sharding helpers (DP over rays)
- ``ngp_tpu.native``   — C++ host-side components (mesh SDF, marching
                          cubes) loaded via ctypes
"""

__version__ = "0.1.0"

# Persistent compilation cache: the TPU-tunnel remote compiler in this
# environment has highly variable latency (seconds to minutes); caching
# compiled executables on disk makes every graph compile at most once
# per machine. Harmless on CPU. Users can override via the usual
# JAX_COMPILATION_CACHE_DIR env var (config honors the env if set).
import os as _os

if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    import jax as _jax

    # separate cache per platform: CPU executables AOT-compiled under
    # the axon config trip machine-feature warnings when reloaded
    _plat = _os.environ.get("JAX_PLATFORMS", "default").replace(",", "_")
    _jax.config.update("jax_compilation_cache_dir", f"/root/.jax_cache_{_plat}")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
