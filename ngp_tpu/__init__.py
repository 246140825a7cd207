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
