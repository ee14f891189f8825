"""rayfinder-tpu: a TPU-native wavefront path tracer in JAX/XLA/Pallas.

Rebuilds the capabilities of Nelarius/rayfinder (C++/WebGPU) TPU-first:
SoA ray batches, lockstep BVH traversal, Pallas kernels on the hot path, and
`shard_map` tile/sample parallelism across device meshes.
"""

__version__ = "0.1.0"
