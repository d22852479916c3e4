"""Data-parallel / FSDP tests on the virtual 8-device CPU mesh
(the multi-device coverage the reference cannot have — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.parallel import (
    batch_sharding,
    fsdp_leaf_spec,
    make_mesh,
    place_state,
)
from ddpm_diffusion_model_tpu.training import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)

RES = 8
T = 20


def _setup(dtype=jnp.float32):
    cfg = UNetConfig(
        base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
        attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
        img_resolution=RES,
    )
    model = UNetDenoiser(cfg, dtype=dtype)
    sched = make_schedule(DiffusionConfig(T=T, img_size=RES))
    params = model.init(jax.random.key(0), jnp.ones((1, RES, RES, 3)), jnp.zeros((1,)))
    return model, sched, params


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8}
    mesh2 = make_mesh((4, 2), ("data", "fsdp"))
    assert mesh2.shape == {"data": 4, "fsdp": 2}
    with pytest.raises(ValueError):
        make_mesh((3,))


def test_dp_train_step_matches_single_device():
    # NOTE: SGD, not Adam — Adam's g/sqrt(v) normalization amplifies
    # float-reduction-order differences between topologies to O(lr), so
    # exact param comparison is only meaningful for a linear-in-grads update.
    import optax

    model, sched, params = _setup()
    cfg = TrainConfig(base_lr=1e-1, warmup_steps=None, grad_accum_steps=1,
                      grad_clip=None)
    tx = optax.sgd(cfg.base_lr)
    step = make_train_step(model, sched, tx, cfg)
    batch = jax.random.normal(jax.random.key(1), (16, RES, RES, 3)) * 0.3

    # single-device
    s1, _ = init_train_state(params, cfg, tx=tx)
    s1, m1 = step(s1, batch)

    # 8-way DP: replicated state, batch sharded over 'data'
    mesh = make_mesh()
    s2, _ = init_train_state(params, cfg, tx=tx)
    s2 = place_state(s2, mesh)
    sharded_batch = jax.device_put(batch, batch_sharding(mesh))
    s2, m2 = step(s2, sharded_batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_fsdp_leaf_spec_rules():
    mesh = make_mesh((2, 4), ("data", "fsdp"))
    spec = fsdp_leaf_spec(jax.ShapeDtypeStruct((3, 3, 16, 32), jnp.float32), mesh)
    assert spec == jax.sharding.PartitionSpec(None, None, None, "fsdp")
    # nothing divisible by 4 -> replicated
    spec2 = fsdp_leaf_spec(jax.ShapeDtypeStruct((3, 5), jnp.float32), mesh)
    assert spec2 == jax.sharding.PartitionSpec()
    # scalar -> replicated
    spec3 = fsdp_leaf_spec(jax.ShapeDtypeStruct((), jnp.float32), mesh)
    assert spec3 == jax.sharding.PartitionSpec()


def test_fsdp_train_step_runs_and_matches():
    model, sched, params = _setup()
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=None, grad_accum_steps=1)
    tx = make_optimizer(cfg)
    step = make_train_step(model, sched, tx, cfg)
    batch = jax.random.normal(jax.random.key(2), (8, RES, RES, 3)) * 0.3

    s_ref, _ = init_train_state(params, cfg, tx=tx)
    s_ref, m_ref = step(s_ref, batch)

    mesh = make_mesh((2, 4), ("data", "fsdp"))
    s, _ = init_train_state(params, cfg, tx=tx)
    s = place_state(s, mesh, fsdp=True)
    sb = jax.device_put(batch, batch_sharding(mesh))
    s, m = step(s, sb)
    np.testing.assert_allclose(float(m_ref["loss"]), float(m["loss"]), rtol=1e-4)
    # a conv kernel leaf really is sharded over fsdp
    leaves = jax.tree.leaves(s.params)
    assert any(
        not l.sharding.is_fully_replicated for l in leaves if hasattr(l, "sharding")
    )


def test_dp_sampling_sharded_batch():
    from ddpm_diffusion_model_tpu.sampling import ddim_sample_loop

    model, sched, params = _setup()
    mesh = make_mesh()
    x0 = jax.random.normal(jax.random.key(3), (8, RES, RES, 3))
    x0 = jax.device_put(x0, batch_sharding(mesh))
    eps_fn = lambda x, t: model.apply(params, x, t)
    x, _ = ddim_sample_loop(sched, eps_fn, x0, jax.random.key(4), steps=4)
    assert np.all(np.isfinite(np.asarray(x)))
