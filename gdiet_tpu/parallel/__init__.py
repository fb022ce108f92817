"""Multi-chip / multi-host execution (mesh, sharded index, collectives)."""

from gdiet_tpu.parallel.dist import ShardedIndex, make_mesh, sharded_step

__all__ = ["ShardedIndex", "make_mesh", "sharded_step"]
