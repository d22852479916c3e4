"""Pipeline parallelism for DiT (parallel/pp.py): the GPipe schedule over a
``pp`` mesh axis must reproduce the plain forward exactly, gradients must
flow through the AD-derived backward schedule, and the guards must refuse
the unsupported modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import DiTConfig, DiTDenoiser
from ddpm_diffusion_model_tpu.parallel import make_mesh
from ddpm_diffusion_model_tpu.parallel.pp import (
    dit_apply_pipelined,
    pipeline_blocks,
)

CFG = DiTConfig(img_resolution=16, patch_size=4, hidden_size=64, depth=4,
                num_heads=2, time_embed_dim=32)


def _setup(dtype=jnp.float32):
    model = DiTDenoiser(CFG, dtype=dtype, attn_impl="xla")
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))
    # non-zero adaLN gates so the blocks actually contribute
    params = jax.tree.map(lambda a: a + 0.02, params)
    return model, params


def _pp_mesh(stages):
    if len(jax.devices()) < stages:
        pytest.skip("needs the virtual multi-device mesh")
    return make_mesh((stages,), ("pp",), devices=jax.devices()[:stages])


@pytest.mark.parametrize("stages,micro", [(2, 2), (4, 4), (4, 8), (2, None)])
def test_pipelined_forward_matches_plain(stages, micro):
    model, params = _setup()
    mesh = _pp_mesh(stages)
    x = jax.random.normal(jax.random.key(1), (8, 16, 16, 3))
    t = jnp.arange(8.0) * 11.0
    y_ref = model.apply(params, x, t)
    y_pp = dit_apply_pipelined(model, params, x, t, mesh,
                               microbatches=micro)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_pipelined_forward_matches_plain_bf16():
    model, params = _setup(dtype=jnp.bfloat16)
    mesh = _pp_mesh(4)
    x = jax.random.normal(jax.random.key(2), (4, 16, 16, 3))
    t = jnp.array([0.0, 250.0, 500.0, 999.0])
    y_ref = model.apply(params, x, t)
    y_pp = dit_apply_pipelined(model, params, x, t, mesh)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               atol=2e-2, rtol=2e-2)


def test_gradients_flow_through_pipeline():
    """AD through the tick scan + ppermute yields the reverse pipeline:
    grads wrt the STACKED BLOCK params match the plain forward's."""
    model, params = _setup()
    mesh = _pp_mesh(4)
    x = jax.random.normal(jax.random.key(3), (4, 16, 16, 3))
    t = jnp.array([5.0, 60.0, 7.0, 800.0])

    def loss_plain(p):
        return jnp.sum(model.apply(p, x, t) ** 2)

    def loss_pp(p):
        return jnp.sum(dit_apply_pipelined(model, p, x, t, mesh) ** 2)

    g_plain = jax.grad(loss_plain)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    flat_a = jax.tree_util.tree_flatten_with_path(g_plain)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(g_pp)[0]
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path))


def test_depth_and_batch_divisibility_guards():
    model, params = _setup()
    mesh = _pp_mesh(4)
    x = jnp.zeros((6, 16, 16, 3))  # 6 % 4 != 0 microbatches
    with pytest.raises(ValueError, match="microbatches"):
        dit_apply_pipelined(model, params, x, jnp.zeros((6,)), mesh)
    mesh3 = make_mesh((3,), ("pp",), devices=jax.devices()[:3]) \
        if len(jax.devices()) >= 3 else None
    if mesh3 is not None:
        with pytest.raises(ValueError, match="pipeline stages"):
            dit_apply_pipelined(model, params, jnp.zeros((3, 16, 16, 3)),
                                jnp.zeros((3,)), mesh3)


def test_unsupported_modes_refused():
    mesh = _pp_mesh(2)
    drop_cfg = DiTConfig(img_resolution=16, patch_size=4, hidden_size=64,
                         depth=2, num_heads=2, time_embed_dim=32, dropout=0.1)
    model_d = DiTDenoiser(drop_cfg, dtype=jnp.float32)
    params = model_d.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                          jnp.zeros((1,)))
    with pytest.raises(ValueError, match="deterministic"):
        dit_apply_pipelined(model_d, params, jnp.zeros((2, 16, 16, 3)),
                            jnp.zeros((2,)), mesh)
    model_u = DiTDenoiser(CFG, dtype=jnp.float32, scan_blocks=False)
    with pytest.raises(ValueError, match="scan_blocks"):
        dit_apply_pipelined(model_u, params, jnp.zeros((2, 16, 16, 3)),
                            jnp.zeros((2,)), mesh)
    model_r = DiTDenoiser(CFG, dtype=jnp.float32, attn_impl="ring")
    with pytest.raises(ValueError, match="ring"):
        dit_apply_pipelined(model_r, params, jnp.zeros((2, 16, 16, 3)),
                            jnp.zeros((2,)), mesh)


def test_pipeline_blocks_identity_stage_count_one():
    """S=1 degenerates to a plain scan over layers (no rotation effects)."""
    model, params = _setup()
    mesh = _pp_mesh(1)
    x = jax.random.normal(jax.random.key(4), (4, 16, 16, 3))
    t = jnp.array([1.0, 2.0, 3.0, 4.0])
    y_ref = model.apply(params, x, t)
    y_pp = dit_apply_pipelined(model, params, x, t, mesh, microbatches=2)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_dp_x_pp_composition():
    """2-D (data, pp) mesh: each data slice runs its own pipeline over the
    same stage-sharded params — output equals the plain forward."""
    model, params = _setup()
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = make_mesh((2, 4), ("data", "pp"), devices=jax.devices()[:8])
    x = jax.random.normal(jax.random.key(5), (8, 16, 16, 3))
    t = jnp.arange(8.0) * 13.0
    y_ref = model.apply(params, x, t)
    y_pp = dit_apply_pipelined(model, params, x, t, mesh,
                               microbatches=2, data_axis="data")
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
    # indivisible local microbatch -> clean error
    with pytest.raises(ValueError, match="not divisible by mesh axis"):
        dit_apply_pipelined(model, params, x[:6], t[:6], mesh,
                            microbatches=2, data_axis="data")


def test_ddim_sampling_through_pipeline():
    """The whole DDIM reverse scan composes with the pipelined eps_fn —
    model-parallel sampling for models too big for one chip."""
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.sampling import ddim_sample_loop

    model, params = _setup()
    mesh = _pp_mesh(4)
    sched = make_schedule(DiffusionConfig(T=20, img_size=16))
    x0 = jax.random.normal(jax.random.key(6), (4, 16, 16, 3))
    ts = np.array([19, 10, 5, 0])

    ref, _ = ddim_sample_loop(
        sched, lambda x, t: model.apply(params, x, t), x0,
        jax.random.key(7), timesteps=ts, eta=0.0)
    pp, _ = ddim_sample_loop(
        sched, lambda x, t: dit_apply_pipelined(model, params, x, t, mesh),
        x0, jax.random.key(7), timesteps=ts, eta=0.0)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_full_train_step_through_pipeline():
    """The STANDARD train step (training/step.py) runs with PipelinedDiT
    unmodified; loss and updated params match the plain model's step.
    SGD optimizer — exact param comparison is only meaningful for a
    linear-in-grads update (same rationale as tests/test_parallel.py:
    Adam's m/sqrt(v) amplifies fp-reassociation noise on tiny grads)."""
    import optax

    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.parallel.pp import PipelinedDiT
    from ddpm_diffusion_model_tpu.training import (TrainConfig,
                                                   init_train_state,
                                                   make_train_step)

    model, params = _setup()
    mesh = _pp_mesh(4)
    sched = make_schedule(DiffusionConfig(T=20, img_size=16))
    tcfg = TrainConfig(base_lr=1e-1, warmup_steps=None, grad_clip=None)
    tx = optax.sgd(tcfg.base_lr)
    x = jax.random.normal(jax.random.key(9), (8, 16, 16, 3)) * 0.5

    s1, _ = init_train_state(params, tcfg, tx=tx)
    s1, m1 = make_train_step(model, sched, tx, tcfg)(s1, x)

    pp_model = PipelinedDiT(model, mesh, microbatches=4)
    s2, _ = init_train_state(params, tcfg, tx=tx)
    s2, m2 = make_train_step(pp_model, sched, tx, tcfg)(s2, x)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)

    drop_model = DiTDenoiser(
        DiTConfig(img_resolution=16, patch_size=4, hidden_size=64, depth=2,
                  num_heads=2, time_embed_dim=32, dropout=0.1))
    with pytest.raises(ValueError, match="dropout"):
        PipelinedDiT(drop_model, mesh)
