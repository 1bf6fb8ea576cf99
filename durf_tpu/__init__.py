"""durf_tpu: a TPU-native dynamic urban radiance field framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
FelTris/durf reference (Mip-NeRF ray pipeline, Mip-NeRF 360 scene contraction,
URF LIDAR depth/sky losses, NSG-style scene graph with jointly optimized
SE(3) object box poses under BARF coarse-to-fine annealing), redesigned
TPU-first: jit + mesh sharding instead of pmap, vmapped object MLPs instead of
python-unrolled loops, fused Pallas kernels on the hot path.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level API (keeps `import durf_tpu` light; jax & friends load
    # on first use).
    surface = {
        "Config": ("durf_tpu.configs", "Config"),
        "ModelConfig": ("durf_tpu.configs", "ModelConfig"),
        "load_config": ("durf_tpu.configs", "load_config"),
        "Rays": ("durf_tpu.rays", "Rays"),
        "MipNerf": ("durf_tpu.models", "MipNerf"),
        "construct_model": ("durf_tpu.models", "construct_model"),
        "render_image": ("durf_tpu.models", "render_image"),
        "get_dataset": ("durf_tpu.data", "get_dataset"),
        "load_scene": ("durf_tpu.data", "load_scene"),
        "run_training": ("durf_tpu.train", "run_training"),
        "evaluate": ("durf_tpu.eval", "evaluate"),
    }
    if name in surface:
        import importlib

        module, attr = surface[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'durf_tpu' has no attribute {name!r}")
