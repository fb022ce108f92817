"""Device-resident diet minimizer index."""

from gdiet_tpu.index.build import DietIndex, build_index

__all__ = ["DietIndex", "build_index"]
