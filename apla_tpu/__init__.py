"""apla_tpu — a TPU-native adaptation framework for Vision Transformers.

Re-implements the capabilities of the APLA reference (MoeinSorkhei/APLA) as an
idiomatic JAX / XLA / Pallas stack:

- Functional ViT backbones (pytree params, jit-compiled forward).
- APLA adaptation: train only `partial_size` output-channels of each block's
  attention output-projection.  Implemented structurally — trainable columns
  live in their own pytree leaves, so gradients, optimizer state and the
  data-parallel gradient allreduce scale with the APLA rank, not model size.
- SPMD data parallelism over a `jax.sharding.Mesh` (ICI collectives), not
  process-per-device DDP.
- Pallas fused attention kernels for the hot path.

Reference parity map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
