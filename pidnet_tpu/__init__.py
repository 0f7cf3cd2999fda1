"""pidnet_tpu: a TPU-native semantic-segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the PIDNet
reference implementation (PIDNet: A Real-time Semantic Segmentation Network
Inspired from PID Controller, CVPR 2023). The compute path is NHWC
jax/XLA/Pallas; data parallelism is expressed with `jax.sharding.Mesh` +
`shard_map`, matching the reference's DataParallel semantics (per-shard
BatchNorm, per-shard OHEM) while scaling over ICI.
"""

__version__ = "0.1.0"
