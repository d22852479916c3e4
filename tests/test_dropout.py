"""Packed dropout (ops/dropout.py): 8-bit mask statistics, expectation
preservation, gradient = mask, key determinism, rbg-key compatibility, and
ResBlock/U-Net integration of the dropout_impl switch."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import ResBlock, UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops.dropout import PackedDropout, packed_dropout


def test_rate_zero_is_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    assert packed_dropout(x, 0.0, jax.random.key(0)) is x
    # sub-quantum rate rounds to 0 -> identity too
    assert packed_dropout(x, 1.0 / 1000.0, jax.random.key(0)) is x


def test_invalid_rate_raises():
    x = jnp.ones((4,))
    with pytest.raises(ValueError):
        packed_dropout(x, 1.0, jax.random.key(0))
    with pytest.raises(ValueError):
        packed_dropout(x, -0.1, jax.random.key(0))


def test_drop_rate_and_scale():
    """Empirical drop fraction ~= round(rate*256)/256 and survivors are
    scaled by exactly 1/(1 - t/256), so E[y] == x."""
    rate = 0.1
    t = round(rate * 256)  # 26
    x = jnp.ones((64, 64, 64, 8), jnp.float32)
    y = packed_dropout(x, rate, jax.random.key(1))
    dropped = float(jnp.mean(y == 0.0))
    assert abs(dropped - t / 256.0) < 3e-3  # 2M draws: ~4 sigma
    kept_vals = np.unique(np.asarray(y))
    expected_scale = 1.0 / (1.0 - t / 256.0)
    assert len(kept_vals) == 2  # exactly {0, scale}
    np.testing.assert_allclose(kept_vals, [0.0, expected_scale], atol=1e-6)
    assert abs(float(jnp.mean(y)) - 1.0) < 2e-2


def test_deterministic_in_key_and_decorrelated_across_keys():
    x = jnp.ones((8, 8, 12), jnp.bfloat16)
    a = packed_dropout(x, 0.3, jax.random.key(7))
    b = packed_dropout(x, 0.3, jax.random.key(7))
    c = packed_dropout(x, 0.3, jax.random.key(8))
    assert jnp.array_equal(a, b)
    assert not jnp.array_equal(a, c)


def test_gradient_is_mask_times_scale():
    x = jnp.ones((16, 16, 8), jnp.float32)
    key = jax.random.key(3)
    y = packed_dropout(x, 0.25, key)
    g = jax.grad(lambda xx: jnp.sum(packed_dropout(xx, 0.25, key)))(x)
    # dy/dx is the same mask*scale the forward applied
    np.testing.assert_allclose(np.asarray(g), np.asarray(y), rtol=0, atol=0)


def test_non_multiple_of_4_channels_fallback():
    x = jnp.ones((32, 32, 7), jnp.float32)  # 7 % 4 != 0 -> uint8 bits path
    y = packed_dropout(x, 0.5, jax.random.key(2))
    dropped = float(jnp.mean(y == 0.0))
    assert abs(dropped - 0.5) < 0.03


def test_rbg_key_compatible():
    """The train step re-wraps the dropout key onto the rbg impl
    (training/step.py _dropout_key); packed_dropout must accept it."""
    from ddpm_diffusion_model_tpu.training.step import _dropout_key

    key = _dropout_key(jax.random.key(5), "rbg")
    x = jnp.ones((8, 8, 16), jnp.bfloat16)
    y = packed_dropout(x, 0.1, key)
    assert y.shape == x.shape and y.dtype == x.dtype
    assert float(jnp.mean(y == 0)) > 0.05


def test_module_wrapper_gates_on_deterministic():
    x = jnp.ones((4, 4, 8))
    mod = PackedDropout(0.5, deterministic=True)
    y = mod.apply({}, x)
    assert jnp.array_equal(y, x)
    mod = PackedDropout(0.5, deterministic=False)
    y = mod.apply({}, x, rngs={"dropout": jax.random.key(0)})
    assert float(jnp.mean(y == 0)) > 0.3


@pytest.mark.parametrize("impl", ["packed", "flax"])
def test_resblock_dropout_impls_train_and_eval(impl):
    blk = ResBlock(out_ch=8, dropout=0.2, deterministic=False,
                   dropout_impl=impl, dtype=jnp.float32)
    x = jnp.ones((2, 8, 8, 8))
    t_emb = jnp.ones((2, 16))
    params = blk.init({"params": jax.random.key(0),
                       "dropout": jax.random.key(1)}, x, t_emb)
    y1 = blk.apply(params, x, t_emb, rngs={"dropout": jax.random.key(2)})
    y2 = blk.apply(params, x, t_emb, rngs={"dropout": jax.random.key(3)})
    assert y1.shape == (2, 8, 8, 8)
    assert not jnp.array_equal(y1, y2)  # different masks
    # eval blocks are impl-independent (no dropout applied at all)
    blk_e = ResBlock(out_ch=8, dropout=0.2, deterministic=True,
                     dropout_impl=impl, dtype=jnp.float32)
    ye = blk_e.apply(params, x, t_emb)
    assert jnp.isfinite(ye).all()


def test_unet_dropout_impl_param_tree_unchanged():
    """Switching dropout_impl must not touch the checkpoint format: both
    impls are rng-driven, parameter-free transforms."""
    cfg = UNetConfig(base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
                     attn_resolutions=(), time_embed_dim=16, num_heads=1,
                     head_dim=8, img_resolution=8, dropout=0.1)
    x = jnp.ones((1, 8, 8, 3))
    t = jnp.zeros((1,))
    trees = []
    for impl in ("packed", "flax"):
        m = UNetDenoiser(cfg, dtype=jnp.float32, dropout_impl=impl)
        p = m.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)}, x, t,
                   deterministic=False)
        trees.append(jax.tree.structure(p))
        # eval forward identical across impls given identical params
    assert trees[0] == trees[1]


def test_remat_masks_policy_matches_no_remat():
    """UNetDenoiser(remat="masks") — backward regenerates only the named
    dropout bits — must match remat=False numerically: the rng replay
    yields the SAME masks, so loss/gradients agree to fp-reassociation
    tolerance (remat reschedules fusions, so bitwise equality is not
    expected)."""
    cfg = UNetConfig(base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
                     attn_resolutions=(), time_embed_dim=16, num_heads=1,
                     head_dim=8, img_resolution=8, dropout=0.25)
    x = jax.random.normal(jax.random.key(5), (2, 8, 8, 3))
    t = jnp.array([3.0, 7.0])

    def grads(remat):
        m = UNetDenoiser(cfg, dtype=jnp.float32, remat=remat)
        p = m.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)}, x, t, deterministic=False)

        def loss(pp):
            y = m.apply(pp, x, t, deterministic=False,
                        rngs={"dropout": jax.random.key(2)})
            return jnp.sum(y ** 2)

        return jax.jit(jax.value_and_grad(loss))(p)

    l0, g0 = grads(False)
    l1, g1 = grads("masks")
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
