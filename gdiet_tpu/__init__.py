"""gdiet_tpu — a TPU-native sparsified-genomics read-mapping framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
CMU-SAFARI/Genome-on-Diet (reference mounted at /root/reference): pattern
("diet") sparsified minimizer indexing, per-read pattern-shift inference,
compressed seeding, location voting, and banded dual affine-gap alignment
producing SAM/PAF records for Illumina / HiFi / ONT reads.

Everything on the device side is fixed-shape batched tensor computation;
variable-length constructs from the reference (kvec/khash/kthread) are
replaced by padded arrays + masks, device sorts, and segmented scans.

64-bit integers are required for minimizer hash keys (up to 2k=56 bits), so
x64 mode is enabled at import. All device code uses explicit dtypes.
"""

import os

import jax

# honor JAX_PLATFORMS explicitly: on this deployment the env var alone is
# not reliably read before plugin discovery (a wedged tunnel plugin then
# hangs backend init even for CPU-only runs), but the config route is
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

jax.config.update("jax_enable_x64", True)
# persistent compile cache: index-build / mapping shapes compile once per
# machine, not once per process
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_gdiet"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# numeric tripwires (the asan/tsan analog, SURVEY.md §5.2): fail fast on
# NaN/Inf leaving any device computation when debugging
if os.environ.get("GDIET_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)

from gdiet_tpu.config import IndexOptions, MapOptions, set_preset  # noqa: E402

__version__ = "0.1.0"

__all__ = ["IndexOptions", "MapOptions", "set_preset", "__version__"]
