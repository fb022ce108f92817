"""Shared utilities: profiling, logging."""

from gdiet_tpu.utils.profile import PROFILE, Stage

__all__ = ["PROFILE", "Stage"]
