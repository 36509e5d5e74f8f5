"""parallel/mesh.py unit tests on the 8-device fake mesh."""

import numpy as np

import jax

from dilabhelmholtzoct_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)


def test_mesh_and_shardings():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8}
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    sharded = shard_batch(batch, mesh)
    assert not sharded["x"].sharding.is_fully_replicated
    params = replicate({"w": np.ones((4, 4), np.float32)}, mesh)
    assert params["w"].sharding.is_fully_replicated


def test_pad_to_multiple_zeroes_channel_mask():
    batch = {
        "prompts": np.ones((5, 3, 4), np.float32),
        "channel_mask": np.ones((5, 3), np.float32),
        "comp_map": np.ones((5, 8, 8), np.int32),
    }
    padded, real = pad_to_multiple(batch, 8)
    assert real == 5
    assert padded["prompts"].shape[0] == 8
    np.testing.assert_array_equal(padded["channel_mask"][5:], 0.0)
    np.testing.assert_array_equal(padded["channel_mask"][:5], 1.0)


def test_pad_noop_when_aligned():
    batch = {"x": np.ones((8, 2), np.float32)}
    padded, real = pad_to_multiple(batch, 8)
    assert padded["x"].shape[0] == 8 and real == 8
