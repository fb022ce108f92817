"""Multi-chip sharded mapping on the virtual 8-device CPU mesh.

Validates that the shard_map'd fused step (data-parallel reads x key-range
sharded index with psum/all_gather hit merge) produces the same candidate
scores as the single-device fused step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from functools import partial
from gdiet_tpu.parallel.dist import build_sharded_mapper, make_mesh
from gdiet_tpu.pipeline.device_step import (
    FusedMapper, fused_map_step, unpack_outputs,
)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
def test_sharded_matches_single(mesh_shape):
    n_data, n_ref = mesh_shape
    assert len(jax.devices()) >= n_data * n_ref
    mesh = make_mesh(n_data, n_ref)

    mi, mo, codes, lens, lmax = ge._tiny_problem(n_reads=2 * n_data, lmax=128)
    _, step = build_sharded_mapper(mi, mo, mesh, Lmax=lmax, S=64, S2=32, A=256)
    out = step(jnp.asarray(codes), jnp.asarray(lens))

    mapper = FusedMapper(mi, mo, Lmax=lmax, S=64, S2=32, A=256)
    single = jax.jit(partial(fused_map_step, cfg=mapper.cfg, backtrack=False))
    ref = single(jnp.asarray(codes), jnp.asarray(lens), **mapper.arrays)

    K = mapper.cfg.K
    a = unpack_outputs(np.asarray(out["meta"]), K)
    b = unpack_outputs(np.asarray(ref["meta"]), K)
    for key in ("shift", "extracted", "fallback", "c_valid", "c_score",
                "c_strand", "chrom", "so", "eo", "ts", "te", "dp_score"):
        x, y = a[key], b[key]
        if key == "dp_score":
            x, y = np.where(b["c_valid"], x, 0), np.where(b["c_valid"], y, 0)
        np.testing.assert_array_equal(x, y, err_msg=key)


def test_dryrun_entry_points():
    ge.dryrun_multichip(len(jax.devices()))
