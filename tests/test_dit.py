"""DiT denoiser family (models/dit.py) — beyond-reference second family.

The contract under test: DiT is a drop-in ``eps_fn`` body — same call
signature as the U-Net — so the train step, samplers, checkpointing, and
the CLI work unchanged once ``ExperimentConfig`` carries a ``DiTConfig``.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import (
    DiTConfig,
    DiTDenoiser,
    build_denoiser,
    dit_s4_64_config,
)
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.training import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig, get_preset

TINY = DiTConfig(img_resolution=16, patch_size=4, hidden_size=64, depth=2,
                 num_heads=2, time_embed_dim=32)


def _init(cfg=TINY, dtype=jnp.float32, **kw):
    model = DiTDenoiser(cfg, dtype=dtype, **kw)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, cfg.img_resolution, cfg.img_resolution,
                                   cfg.in_channels)), jnp.zeros((1,)))
    return model, params


def test_forward_shape_dtype_and_adaln_zero_init():
    model, params = _init()
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    eps = model.apply(params, x, jnp.array([3.0, 99.0]))
    assert eps.shape == x.shape and eps.dtype == x.dtype
    # adaLN-Zero: the final projection is zero-initialized -> eps == 0
    assert float(jnp.abs(eps).max()) == 0.0


def test_scan_and_unrolled_blocks_match():
    """scan_blocks=True (stacked params) computes the same function as the
    unrolled per-block form: slice layer i from the stacked leaves into
    block{i} and compare forwards."""
    model_s, params_s = _init()
    model_u = DiTDenoiser(TINY, dtype=jnp.float32, scan_blocks=False)

    stacked = params_s["params"]["blocks"]
    rest = {k: v for k, v in params_s["params"].items() if k != "blocks"}
    for i in range(TINY.depth):
        rest[f"block{i}"] = jax.tree.map(lambda a, i=i: a[i], stacked)
    params_u = {"params": rest}

    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 3))
    t = jnp.array([5.0, 60.0])
    # zero-init final layer hides differences -- perturb it
    def bump(p):
        p = jax.tree.map(lambda a: a, p)  # rebuild containers
        p["params"]["final_proj"] = jax.tree.map(
            lambda a: a + 0.01, p["params"]["final_proj"])
        return p

    a = model_s.apply(bump(params_s), x, t)
    b = model_u.apply(bump(params_u), x, t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_dropout_rng_and_determinism():
    cfg = DiTConfig(img_resolution=16, patch_size=4, hidden_size=64, depth=2,
                    num_heads=2, time_embed_dim=32, dropout=0.5)
    model, params = _init(cfg)
    # give the residual branches signal (zero-init gates absorb dropout)
    params = jax.tree.map(lambda a: a + 0.02, params)
    x = jax.random.normal(jax.random.key(3), (2, 16, 16, 3))
    t = jnp.array([5.0, 60.0])
    d1 = model.apply(params, x, t, deterministic=False,
                     rngs={"dropout": jax.random.key(1)})
    d2 = model.apply(params, x, t, deterministic=False,
                     rngs={"dropout": jax.random.key(2)})
    assert float(jnp.abs(d1 - d2).max()) > 0.0
    e1 = model.apply(params, x, t)
    e2 = model.apply(params, x, t)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_rejects_unet_only_paths():
    model, params = _init()
    x = jnp.zeros((1, 16, 16, 3))
    with pytest.raises(ValueError, match="U-Net-only"):
        model.apply(params, x, jnp.zeros((1,)), mode="decode")
    with pytest.raises(ValueError, match="U-Net-only"):
        model.apply(params, x, jnp.zeros((1,)), return_features=True)
    with pytest.raises(TypeError, match="UNet-only"):
        build_denoiser(TINY, fused_gn=True)
    with pytest.raises(ValueError, match="divisible"):
        model.apply(params, jnp.zeros((1, 15, 15, 3)), jnp.zeros((1,)))


def test_config_json_roundtrip_preserves_family():
    exp = get_preset("celeba64_dit_s4")
    assert isinstance(exp.model, DiTConfig)
    d = exp.to_dict()
    assert d["model"]["family"] == "dit"
    back = ExperimentConfig.from_json(exp.to_json())
    assert isinstance(back.model, DiTConfig)
    assert back.model == exp.model
    # legacy=True path (checkpoint meta) dispatches too
    again = ExperimentConfig.from_dict(json.loads(exp.to_json()), legacy=True)
    assert isinstance(again.model, DiTConfig)
    # unet presets stay unet (no family key, so old checkpoints load)
    unet = get_preset("celeba64_attn")
    assert "family" not in unet.to_dict()["model"]


def test_train_step_learns():
    model = build_denoiser(TINY, dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))
    sched = make_schedule(DiffusionConfig(T=100, img_size=16))
    tcfg = TrainConfig(base_lr=2e-3, warmup_steps=5)
    tx = make_optimizer(tcfg)
    state, _ = init_train_state(params, tcfg, tx=tx)
    step = make_train_step(model, sched, tx, tcfg)
    x = jax.random.normal(jax.random.key(4), (16, 16, 16, 3)) * 0.5
    losses = []
    for _ in range(30):
        state, m = step(state, x)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.05
    assert np.isfinite(losses).all()


def test_ddim_sampling_with_dit():
    from ddpm_diffusion_model_tpu.sampling import ddim_sample_loop

    model, params = _init()
    sched = make_schedule(DiffusionConfig(T=100, img_size=16))

    def eps_fn(x, t):
        return model.apply(params, x, t)

    x, _ = ddim_sample_loop(
        sched, eps_fn,
        jax.random.normal(jax.random.key(5), (2, 16, 16, 3)),
        jax.random.key(6), timesteps=np.array([99, 50, 10, 0]), eta=0.0)
    assert x.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(x)).all()


def test_cli_train_sample_checkpoint_roundtrip(tmp_path):
    """End to end through the CLI: train a tiny DiT from a config file,
    auto-resolve the family from the checkpoint meta, and DDIM-sample."""
    from ddpm_diffusion_model_tpu.cli import main as cli_main

    exp = ExperimentConfig(
        model=TINY, diffusion=DiffusionConfig(T=50, img_size=16),
        train=TrainConfig(base_lr=1e-3, warmup_steps=2),
        run_name="dit16", img_size=16, batch_size=8, epochs=1,
        sample_every=0, save_every=1, seed=0)
    cfg_path = str(tmp_path / "dit.json")
    with open(cfg_path, "w") as f:
        f.write(exp.to_json())
    ck = str(tmp_path / "ck")
    rc = cli_main(["train", "--config", cfg_path, "--data", "synthetic",
                   "--synthetic-size", "32", "--ckpt-dir", ck,
                   "--no-samples"])
    assert rc is None or rc == 0
    last = os.path.join(ck, "dit16_last")
    assert os.path.isdir(last)
    with open(os.path.join(last, "meta.json")) as f:
        meta = json.load(f)
    assert meta["configs"]["experiment"]["model"]["family"] == "dit"

    png = str(tmp_path / "dit.png")
    cli_main(["sample-ddim", "--ckpt", last, "--n", "2", "--steps", "4",
              "--out", png])
    assert os.path.exists(png)


def test_interop_rejects_dit(tmp_path):
    from ddpm_diffusion_model_tpu.utils.interop import export_torch_checkpoint

    model, params = _init()
    tcfg = TrainConfig()
    state, _ = init_train_state(params, tcfg, tx=make_optimizer(tcfg))
    exp = ExperimentConfig(
        model=TINY, diffusion=DiffusionConfig(T=50, img_size=16),
        train=tcfg, run_name="x", img_size=16, batch_size=4)
    with pytest.raises(TypeError, match="U-Net architecture only"):
        export_torch_checkpoint(state, exp, str(tmp_path / "x.pt"))


def test_flops_family_dispatch():
    from ddpm_diffusion_model_tpu.utils.flops import (dit_fwd_flops,
                                                      fwd_flops,
                                                      train_step_flops)

    cfg = dit_s4_64_config()
    f = dit_fwd_flops(cfg, 1)
    # ~2 FLOPs/param/token for the dense part: sanity band, not exactness
    assert 5e9 < f < 5e10
    assert fwd_flops(cfg, 2) == 2 * f
    assert train_step_flops(cfg, 1) == 3 * f


def test_dp_mesh_matches_single_device():
    """The DiT train step under a DP mesh equals the single-device step —
    the family composes with the parallel layer unchanged."""
    from ddpm_diffusion_model_tpu.parallel import batch_sharding, make_mesh
    from ddpm_diffusion_model_tpu.parallel.sharding import place_state

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    model = build_denoiser(TINY, dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))
    sched = make_schedule(DiffusionConfig(T=100, img_size=16))
    tcfg = TrainConfig(base_lr=1e-3, warmup_steps=2)
    tx = make_optimizer(tcfg)
    step = make_train_step(model, sched, tx, tcfg)
    x = jax.random.normal(jax.random.key(6), (8, 16, 16, 3)) * 0.5

    state1, _ = init_train_state(params, tcfg, tx=tx)
    state1, m1 = step(state1, x)

    mesh = make_mesh(devices=jax.devices()[:4])
    stateN, _ = init_train_state(params, tcfg, tx=tx)
    stateN = place_state(stateN, mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    stateN, mN = step(stateN, xs)
    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]),
                               rtol=1e-4)


def test_tp_head_sharding_equality():
    """DiT attention under a tensor_parallel_mesh equals the unsharded
    forward/backward — the family rides the same TP seam as AttnBlock."""
    from ddpm_diffusion_model_tpu.parallel import (make_mesh,
                                                   tensor_parallel_mesh)

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = make_mesh((4, 2), ("data", "model"))
    model, params = _init()  # TINY: num_heads=2 / model axis 2
    params = jax.tree.map(lambda a: a + 0.02, params)  # non-zero gates
    x = jax.random.normal(jax.random.key(7), (4, 16, 16, 3))
    t = jnp.array([5.0, 60.0, 9.0, 77.0])

    def loss(p, xx):
        return jnp.sum(model.apply(p, xx, t) ** 2)

    y_ref = model.apply(params, x, t)
    g_ref = jax.grad(loss)(params, x)
    with tensor_parallel_mesh(mesh, "model"):
        y_tp = jax.jit(model.apply)(params, x, t)
        g_tp = jax.jit(jax.grad(loss))(params, x)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=2e-5, rtol=2e-5)
    for a, b in zip(jax.tree.leaves(g_tp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_ring_attention_equality():
    """DiT with attn_impl='ring' under a context_parallel_mesh matches the
    XLA attention numerics — SP/CP works for the family via the shared
    ops.attention dispatcher (N=16 tokens ring over 4 devices)."""
    from ddpm_diffusion_model_tpu.ops.ring_attention import (
        context_parallel_mesh,
    )
    from ddpm_diffusion_model_tpu.parallel import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    model_x = DiTDenoiser(TINY, dtype=jnp.float32, attn_impl="xla")
    model_r = DiTDenoiser(TINY, dtype=jnp.float32, attn_impl="ring")
    params = model_x.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                          jnp.zeros((1,)))
    params = jax.tree.map(lambda a: a + 0.02, params)  # non-zero gates
    x = jax.random.normal(jax.random.key(8), (2, 16, 16, 3))
    t = jnp.array([5.0, 60.0])
    y_ref = model_x.apply(params, x, t)
    mesh = make_mesh((1, 4), ("data", "cp"), devices=jax.devices()[:4])
    with context_parallel_mesh(mesh, "cp"):
        y_ring = jax.jit(model_r.apply)(params, x, t)
    np.testing.assert_allclose(np.asarray(y_ring), np.asarray(y_ref),
                               atol=2e-5, rtol=2e-5)


def test_pallas_flash_attention_path():
    """DiT with attn_impl='pallas' (the path the auto-dispatch takes at
    N>=2048 on TPU, e.g. dit_s4_256_config's 4096 tokens) matches XLA
    numerics — run in Pallas interpret mode on CPU."""
    from jax.experimental import pallas as pl  # noqa: F401  (availability)
    from jax.experimental.pallas import tpu as pltpu

    model_x = DiTDenoiser(TINY, dtype=jnp.float32, attn_impl="xla")
    model_p = DiTDenoiser(TINY, dtype=jnp.float32, attn_impl="pallas")
    params = model_x.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                          jnp.zeros((1,)))
    params = jax.tree.map(lambda a: a + 0.02, params)
    x = jax.random.normal(jax.random.key(9), (2, 16, 16, 3))
    t = jnp.array([5.0, 60.0])
    y_ref = model_x.apply(params, x, t)
    with pltpu.force_tpu_interpret_mode():
        y_pal = model_p.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("mode", [True, "dots", "attn"])
def test_remat_modes_match_no_remat(mode):
    """Full-block remat and the dots-saveable policy are numerically
    IDENTICAL to no remat (same program, different save/recompute split) —
    forward and gradients."""
    model0, params = _init()
    model_r = DiTDenoiser(TINY, dtype=jnp.float32, remat=mode)
    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 3))
    t = jnp.array([5.0, 17.0])

    # nudge params off the adaLN-Zero init so gradients are nontrivial
    params = jax.tree.map(
        lambda p: p + 0.01 * jnp.sign(jnp.sin(jnp.arange(p.size,
                                     dtype=jnp.float32)).reshape(p.shape)),
        params)

    def loss(m):
        def f(p):
            return jnp.mean(m.apply(p, x, t).astype(jnp.float32) ** 2)
        return f

    l0, g0 = jax.value_and_grad(loss(model0))(params)
    lr, gr = jax.value_and_grad(loss(model_r))(params)
    np.testing.assert_allclose(float(lr), float(l0), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flatr = jax.tree_util.tree_leaves(gr)
    for a, b in zip(flat0, flatr):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=1e-7)
