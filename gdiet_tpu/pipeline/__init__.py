"""Batched device mapping pipelines (the reference's map.c re-designed as
fixed-shape tensor stages)."""

from gdiet_tpu.pipeline.shortread import ShortReadMapper

__all__ = ["ShortReadMapper"]
