"""Framework checkpoint save/load round trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sd_animation_optical_flow_tpu.models import unet as U
from sd_animation_optical_flow_tpu.utils import checkpoint as CK


def test_npz_roundtrip_unet(tmp_path, rng):
    cfg = U.UNetConfig(model_channels=16, channel_mult=(1, 2),
                       attention_resolutions=(1,), num_heads=2,
                       context_dim=32)
    params = U.unet_init(rng, cfg)
    path = str(tmp_path / "ckpt.npz")
    CK.save_pytree(path, params)
    restored = CK.load_pytree(path, params)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_load_shape_mismatch_raises(tmp_path):
    tree = {"a": jnp.zeros((2, 2))}
    path = str(tmp_path / "c.npz")
    CK.save_pytree(path, tree)
    with pytest.raises(ValueError):
        CK.load_pytree(path, {"a": jnp.zeros((3, 3))})
    with pytest.raises(KeyError):
        CK.load_pytree(path, {"b": jnp.zeros((2, 2))})


def test_orbax_or_npz_roundtrip(tmp_path):
    tree = {"w": jnp.arange(6.0).reshape(2, 3), "nested": {"b": jnp.ones(4)}}
    path = str(tmp_path / "ck")
    kind = CK.save_orbax(path, tree)
    restored = CK.restore_orbax(path, tree)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(tree["w"]))
    assert kind in ("orbax", "npz")
