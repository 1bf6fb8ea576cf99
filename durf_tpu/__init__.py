"""durf_tpu: a TPU-native dynamic urban radiance field framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
FelTris/durf reference (Mip-NeRF ray pipeline, Mip-NeRF 360 scene contraction,
URF LIDAR depth/sky losses, NSG-style scene graph with jointly optimized
SE(3) object box poses under BARF coarse-to-fine annealing), redesigned
TPU-first: jit + mesh sharding instead of pmap, vmapped object MLPs instead of
python-unrolled loops, fused Pallas kernels on the hot path.
"""

__version__ = "0.1.0"
