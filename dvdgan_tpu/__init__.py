"""dvdgan_tpu — a TPU-native JAX video-generation framework (DVD-GAN capabilities).

A ground-up JAX/XLA/Pallas rebuild of the DVD-GAN system (Clark, Donahue,
Simonyan, "Adversarial Video Generation on Complex Datasets",
arXiv:1907.06571; reference implementation `Harrypotterrrr/DVD-GAN`).
Nothing here is a port: models are pure functions over explicit parameter /
state pytrees, temporal recurrence is `lax.scan`, spectral-norm power
iteration is a hoisted jit-safe pass over the parameter tree, batch-norm
moments can be `pmean`ed over a `jax.sharding.Mesh` axis (cross-replica BN),
and data parallelism is `shard_map` + XLA collectives over ICI.

Layout (mirrors SURVEY.md §2 component inventory):
  core/      pytree path utilities, orthogonal init, precision policy
  ops/       spectral norm, conditional BN, ConvGRU, separable attention,
             G/D residual blocks, hinge losses, resize/pool primitives
  models/    Generator, SpatialDiscriminator (DS), TemporalDiscriminator (DT)
  parallel/  mesh construction + sharding/collective helpers
  train/     train state, jitted alternating G/D step, EMA, checkpointing,
             sampling
  data/      synthetic + on-disk video clip pipelines
  utils/     config presets (reference CLI parity), logging/observability
  kernels/   Pallas TPU kernels for the hot ops
"""

__version__ = "0.1.0"
