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

def _host_cpu_sig() -> str:
    """Short signature of the host's CPU feature flags. The persistent
    cache stores XLA:CPU AOT executables whose cache key does NOT cover
    host CPU features — loading an entry compiled on a machine with a
    different feature set (VM migration) warns `cpu_aot_loader: ... could
    lead to execution errors such as SIGILL` and can segfault outright.
    Keying the cache DIRECTORY by the feature flags turns a host change
    into a clean cache miss instead."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib
                    return hashlib.sha256(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "nosig"


_cache_dir = _os.environ.get(
    "SLAM_TPU_JAX_CACHE",
    _os.path.expanduser(f"~/.cache/slam_tpu_jax-{_host_cpu_sig()}"))
try:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without the knobs
    pass

from slam_tpu.config import SlamConfig, default_config, sim2d_config  # noqa: E402

__version__ = "0.1.0"
