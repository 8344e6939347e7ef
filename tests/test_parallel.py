"""Mesh/sharding tests on the fake 8-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from from_ddpm_to_stable_diffusion_tpu.parallel import (
    build_mesh, replicate, shard_batch)


def test_build_mesh_1d(devices8):
    mesh = build_mesh({"data": 8}, devices8)
    assert mesh.shape == {"data": 8}


def test_build_mesh_2d_with_inference(devices8):
    mesh = build_mesh({"data": -1, "model": 2}, devices8)
    assert mesh.shape == {"data": 4, "model": 2}


def test_build_mesh_bad_shape(devices8):
    with pytest.raises(ValueError):
        build_mesh({"data": 3}, devices8)


def test_shard_batch_places_batch_axis(devices8):
    mesh = build_mesh({"data": 8}, devices8)
    x = np.zeros((16, 4, 4, 3), np.float32)
    y = shard_batch(mesh, x)
    assert y.sharding.spec == P("data", None, None, None)
    # each device holds 16/8 = 2 rows
    shard_shapes = {s.data.shape for s in y.addressable_shards}
    assert shard_shapes == {(2, 4, 4, 3)}


def test_replicate(devices8):
    mesh = build_mesh({"data": 8}, devices8)
    tree = {"w": np.ones((3, 3), np.float32)}
    rep = replicate(mesh, tree)
    assert rep["w"].sharding.spec == P()
    assert len(rep["w"].addressable_shards) == 8


def test_psum_over_mesh(devices8):
    """XLA collective over the data axis (the framework's 'NCCL')."""
    from functools import partial

    mesh = build_mesh({"data": 8}, devices8)

    @partial(jax.shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
    def allreduce(x):
        return jax.lax.psum(x, "data")

    x = np.arange(8, dtype=np.float32)
    out = allreduce(x)
    np.testing.assert_allclose(np.asarray(out), [28.0])
