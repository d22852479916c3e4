"""U-Net model tests — coverage mirrors the reference's
``testing/test_unet_backbone.py`` and ``testing/test_attention.py``:
block shapes/channel changes, down/up x2 round trips, time embeddings,
full U-Net with/without attention, param-count ordering, gradient flow,
multi-resolution forward, attention determinism and head sweeps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import (
    AttnBlock,
    Downsample,
    ResBlock,
    TimeMLP,
    UNetConfig,
    UNetDenoiser,
    Upsample,
    count_params,
    sinusoidal_time_embedding,
    unet_64x64_config,
    unet_64x64_low_config,
)

K = jax.random.key


# ---------- embeddings ----------

def test_sinusoidal_embedding_shape_and_values():
    t = jnp.array([0, 1, 100])
    emb = sinusoidal_time_embedding(t, 128)
    assert emb.shape == (3, 128)
    e = np.asarray(emb)
    # t=0: sin part all 0, cos part all 1
    np.testing.assert_allclose(e[0, :64], 0.0, atol=1e-6)
    np.testing.assert_allclose(e[0, 64:], 1.0, atol=1e-6)
    # first frequency is 1.0 -> sin(t), cos(t)
    np.testing.assert_allclose(e[1, 0], np.sin(1.0), rtol=1e-5)
    np.testing.assert_allclose(e[1, 64], np.cos(1.0), rtol=1e-5)
    assert np.all(np.isfinite(e))


def test_sinusoidal_embedding_odd_dim_padded():
    emb = sinusoidal_time_embedding(jnp.array([5]), 129)
    assert emb.shape == (1, 129)
    assert float(emb[0, -1]) == 0.0


def test_time_mlp():
    mlp = TimeMLP(out_dim=64)
    params = mlp.init(K(0), jnp.ones((2, 32)))
    out = mlp.apply(params, jnp.ones((2, 32)))
    assert out.shape == (2, 64)


# ---------- blocks ----------

def test_resblock_shape_preserved_and_channel_change():
    x = jax.random.normal(K(1), (2, 16, 16, 32))
    t_emb = jax.random.normal(K(2), (2, 128))

    blk = ResBlock(out_ch=32, dtype=jnp.float32)
    params = blk.init(K(3), x, t_emb)
    out = blk.apply(params, x, t_emb)
    assert out.shape == x.shape

    blk2 = ResBlock(out_ch=64, dtype=jnp.float32)
    params2 = blk2.init(K(4), x, t_emb)
    out2 = blk2.apply(params2, x, t_emb)
    assert out2.shape == (2, 16, 16, 64)
    assert np.all(np.isfinite(np.asarray(out2)))


def test_resblock_time_conditioning_matters():
    # NOTE: needs channels > 32 — with <=32 channels GroupNorm(min(32, ch))
    # has one channel per group and exactly cancels the constant per-channel
    # time bias (true for the reference's torch GN too).
    x = jax.random.normal(K(5), (2, 8, 8, 64))
    blk = ResBlock(out_ch=64, dtype=jnp.float32)
    params = blk.init(K(6), x, jnp.zeros((2, 64)))
    out_a = blk.apply(params, x, jnp.zeros((2, 64)))
    out_b = blk.apply(params, x, jnp.ones((2, 64)))
    assert np.abs(np.asarray(out_a) - np.asarray(out_b)).max() > 1e-5


def test_down_up_round_trip_shapes():
    x = jax.random.normal(K(7), (2, 32, 32, 8))
    down = Downsample(8, dtype=jnp.float32)
    dp = down.init(K(8), x)
    y = down.apply(dp, x)
    assert y.shape == (2, 16, 16, 8)

    up = Upsample(8, dtype=jnp.float32)
    upp = up.init(K(9), y)
    z = up.apply(upp, y)
    assert z.shape == (2, 32, 32, 8)


def test_upsample_nearest_semantics():
    # before the conv, upsample must replicate pixels 2x2 (nearest)
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 2, 2, 1)
    b, h, w, c = x.shape
    rep = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(1, 4, 4, 1)
    expected = np.array(
        [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]], dtype=np.float32
    )
    np.testing.assert_allclose(np.asarray(rep)[0, :, :, 0], expected)


# ---------- attention ----------

@pytest.mark.parametrize("res", [8, 16])
@pytest.mark.parametrize("heads,hd", [(1, 32), (2, 32), (4, 64), (8, 16)])
def test_attn_block_shapes(res, heads, hd):
    x = jax.random.normal(K(10), (2, res, res, 64))
    blk = AttnBlock(num_heads=heads, head_dim=hd, dtype=jnp.float32, attn_impl="xla")
    params = blk.init(K(11), x)
    out = blk.apply(params, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_attn_inner_dim_not_equal_channels():
    # 256 channels with 4x64 inner works (reference allows inner != channels)
    x = jax.random.normal(K(12), (1, 8, 8, 96))
    blk = AttnBlock(num_heads=4, head_dim=64, dtype=jnp.float32, attn_impl="xla")
    params = blk.init(K(13), x)
    out = blk.apply(params, x)
    assert out.shape == x.shape


def test_attn_determinism():
    x = jax.random.normal(K(14), (2, 16, 16, 32))
    blk = AttnBlock(num_heads=2, head_dim=16, dtype=jnp.float32, attn_impl="xla")
    params = blk.init(K(15), x)
    out1 = np.asarray(blk.apply(params, x))
    out2 = np.asarray(blk.apply(params, x))
    np.testing.assert_array_equal(out1, out2)


def test_attn_gradient_flow():
    x = jax.random.normal(K(16), (1, 8, 8, 16))
    blk = AttnBlock(num_heads=2, head_dim=8, dtype=jnp.float32, attn_impl="xla")
    params = blk.init(K(17), x)
    g = jax.grad(lambda p: jnp.sum(blk.apply(p, x) ** 2))(params)
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    assert max(norms) > 0


# ---------- full U-Net ----------

def _tiny_cfg(**kw):
    base = dict(
        base_channels=16, channel_mults=(1, 2), num_res_blocks=1,
        attn_resolutions=(8,), time_embed_dim=32, num_heads=2, head_dim=8,
        img_resolution=16, dropout=0.0,
    )
    base.update(kw)
    return UNetConfig(**base)


def test_unet_forward_shape_and_finite():
    cfg = _tiny_cfg()
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    x = jax.random.normal(K(18), (2, 16, 16, 3))
    t = jnp.array([10, 500])
    params = model.init(K(19), x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_attention_increases_params():
    cfg_no = _tiny_cfg(attn_resolutions=())
    cfg_yes = _tiny_cfg(attn_resolutions=(8, 16))
    x = jnp.ones((1, 16, 16, 3))
    t = jnp.zeros((1,))
    p_no = UNetDenoiser(cfg_no, dtype=jnp.float32).init(K(20), x, t)
    p_yes = UNetDenoiser(cfg_yes, dtype=jnp.float32).init(K(21), x, t)
    assert count_params(p_yes) > count_params(p_no)


def test_unet_multi_resolution_forward():
    # same weights must run at 8/16/32 (reference runs the 64x64-built net
    # at 32/64/128, test_unet_backbone.py:176-195)
    cfg = _tiny_cfg()
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    params = model.init(K(22), jnp.ones((1, 16, 16, 3)), jnp.zeros((1,)))
    for res in (8, 16, 32):
        out = model.apply(params, jnp.ones((1, res, res, 3)), jnp.array([3.0]))
        assert out.shape == (1, res, res, 3)


def test_unet_gradient_flow():
    cfg = _tiny_cfg()
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    x = jax.random.normal(K(23), (2, 16, 16, 3))
    t = jnp.array([5, 100])
    params = model.init(K(24), x, t)

    def loss_fn(p):
        return jnp.mean(model.apply(p, x, t) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert len(leaves) == len(jax.tree.leaves(params))
    gnorms = [float(jnp.linalg.norm(l)) for l in leaves]
    assert all(np.isfinite(v) for v in gnorms)
    # virtually all leaves receive gradient
    assert sum(v > 0 for v in gnorms) >= len(gnorms) - 2


def test_unet_bf16_forward_from_fp32_input():
    cfg = _tiny_cfg()
    model = UNetDenoiser(cfg)  # bf16 compute default
    x = jax.random.normal(K(25), (2, 16, 16, 3), dtype=jnp.float32)
    t = jnp.array([1, 999])
    params = model.init(K(26), x, t)
    out = model.apply(params, x, t)
    assert out.dtype == jnp.float32  # returned in input dtype
    assert np.all(np.isfinite(np.asarray(out)))
    # params stay fp32
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))


def _param_count(cfg, res):
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(K(27), jnp.ones((1, res, res, 3)), jnp.zeros((1,)))
    )
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))


def test_unet_param_count_parity_with_reference():
    """GOLDEN: exact parameter-count parity with the reference architecture
    (counts computed once from the torch reference:
    build_unet_64x64() -> 31,312,131; low-GPU notebook config -> 12,143,427;
    CelebA-HQ-256 config -> 63,100,675 — cf. the archived module tree in
    the reference's arquitectures/ dir, SURVEY.md §2.2)."""
    assert _param_count(unet_64x64_config(), 64) == 31_312_131
    assert _param_count(unet_64x64_low_config(), 64) == 12_143_427
    from ddpm_diffusion_model_tpu.models import unet_256x256_config

    assert _param_count(unet_256x256_config(), 256) == 63_100_675


def test_unet_low_config_smaller_than_full():
    def nparams(cfg, res):
        model = UNetDenoiser(cfg, dtype=jnp.float32)
        shapes = jax.eval_shape(
            lambda: model.init(K(28), jnp.ones((1, res, res, 3)), jnp.zeros((1,)))
        )
        return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))

    assert nparams(unet_64x64_low_config(), 64) < nparams(unet_64x64_config(), 64)


def test_unet_odd_resolution_mismatch_resize():
    """Odd input resolutions make the stride-2 encoder and x2 decoder
    disagree spatially — the nearest-resize fix-up branch (reference:
    unet_backbone.py:202-203) must reconcile them."""
    cfg = _tiny_cfg(img_resolution=9, attn_resolutions=())
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    x = jax.random.normal(K(30), (1, 9, 9, 3))
    t = jnp.array([3.0])
    params = model.init(K(31), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (1, 9, 9, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # gradient still flows through the resize
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x, t) ** 2))(params)
    assert all(np.isfinite(float(jnp.linalg.norm(l))) for l in jax.tree.leaves(g))


def test_attn_p_drop_training_vs_eval():
    """SDPA dropout parity (attention.py:43,67-70): p_drop only acts in
    training mode, changes the output stochastically, and keeps shapes/
    finiteness; eval mode is identical to p_drop=0."""
    import jax

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16), jnp.float32)
    base = AttnBlock(num_heads=2, head_dim=8, dtype=jnp.float32, attn_impl="xla")
    params = base.init(jax.random.key(1), x)

    drop = AttnBlock(num_heads=2, head_dim=8, p_drop=0.5, deterministic=False,
                     dtype=jnp.float32, attn_impl="xla")
    drop_eval = AttnBlock(num_heads=2, head_dim=8, p_drop=0.5, deterministic=True,
                          dtype=jnp.float32, attn_impl="xla")

    y_base = base.apply(params, x)
    y_eval = drop_eval.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y_base), np.asarray(y_eval))

    y1 = drop.apply(params, x, rngs={"dropout": jax.random.key(2)})
    y2 = drop.apply(params, x, rngs={"dropout": jax.random.key(3)})
    assert np.isfinite(np.asarray(y1)).all()
    assert y1.shape == x.shape
    assert not np.allclose(np.asarray(y1), np.asarray(y_base))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_unet_attn_p_drop_config_wired():
    """attn_p_drop flows from UNetConfig into training-mode forwards."""
    import jax

    from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser

    cfg = UNetConfig(
        base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
        attn_resolutions=(4,), time_embed_dim=16, num_heads=1, head_dim=8,
        img_resolution=8, attn_p_drop=0.4,
    )
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3), jnp.float32)
    t = jnp.zeros((2,))
    params = model.init(jax.random.key(1), x, t)
    y_eval = model.apply(params, x, t, deterministic=True)
    y_tr1 = model.apply(params, x, t, deterministic=False,
                        rngs={"dropout": jax.random.key(2)})
    y_tr2 = model.apply(params, x, t, deterministic=False,
                        rngs={"dropout": jax.random.key(3)})
    assert np.isfinite(np.asarray(y_tr1)).all()
    assert not np.allclose(np.asarray(y_tr1), np.asarray(y_eval))
    assert not np.allclose(np.asarray(y_tr1), np.asarray(y_tr2))
