"""rvt_tpu: TPU-native event-camera object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of uzh-rpg/RVT
(CVPR 2023): recurrent MaxViT backbone + YOLOX detection on Prophesee
event-camera streams, designed TPU-first (NHWC, static shapes, lax.scan
recurrence, pjit data parallelism, on-device voxelization and NMS).
"""

__version__ = "0.1.0"

import jax as _jax

# Precision follows dtype. This JAX build defaults matmul/conv precision to
# a reduced (bf16-class) mode even for float32 operands, which silently
# breaks checkpoint-parity (~2e-3 relative error). We pin float32 operands
# to true float32 math; bf16 speed on the MXU comes from explicitly casting
# activations/params to bfloat16 in the mixed-precision path, never from
# implicit truncation.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: compiles are expensive on this host (single
# CPU core; tunneled TPU). Opt out by setting JAX_COMPILATION_CACHE_DIR="".
import os as _os

if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    _jax.config.update("jax_compilation_cache_dir", "/tmp/rvt_tpu_jax_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
