"""slam_tpu: a TPU-native, batched lidar-SLAM simulation framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
servos/SLAM reference stack (see SURVEY.md). The per-scan pipeline is one
pure jitted step over a SlamState pytree, vmapped over robots and sharded
over device meshes.
"""

import jax as _jax

# Geometry pipelines need exact f32 matmuls: TPU's default bf16 matmul
# precision injects O(0.4%) coordinate error — meters at lidar range (RMAX
# 100 m), which corrupts raycasts, rotations, and covariance algebra. Hot
# kernels that tolerate bf16 opt in explicitly with precision=DEFAULT.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: TPU (axon) compiles are slow (~minutes for
# Pallas kernels through the remote-compile relay); cache them across runs.
import os as _os

_cache_dir = _os.environ.get("SLAM_TPU_JAX_CACHE",
                             _os.path.expanduser("~/.cache/slam_tpu_jax"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without the knobs
    pass

from slam_tpu.config import SlamConfig, default_config, sim2d_config  # noqa: E402

__version__ = "0.1.0"
