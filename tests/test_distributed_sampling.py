"""Mesh-sharded sampling (sampling/distributed.py): the SPMD scan over the
8-device CPU mesh must reproduce single-device sampling exactly (threefry
bits are sharding-invariant; per-sample math has no cross-shard reductions),
and validate its divisibility/kind contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.parallel import make_mesh
from ddpm_diffusion_model_tpu.sampling import sample_grid_sharded
from ddpm_diffusion_model_tpu.sampling.inference import _ddim_jit, _ddpm_jit
from ddpm_diffusion_model_tpu.sampling.loops import to_unit_interval
from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule

RES = 8
T = 20


@pytest.fixture(scope="module")
def setup():
    cfg = UNetConfig(
        base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
        attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
        img_resolution=RES,
    )
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    sched = make_schedule(DiffusionConfig(T=T, img_size=RES))
    params = model.init(jax.random.key(0), jnp.ones((1, RES, RES, 3)),
                        jnp.zeros((1,)))
    return model, sched, params


def test_sharded_ddim_matches_single_device(setup):
    model, sched, params = setup
    mesh = make_mesh()
    x_sharded = sample_grid_sharded(
        model, params, sched, mesh, kind="ddim", n=16, img_size=RES,
        seed=7, steps=5,
    )
    ts = tuple(int(t) for t in build_ddim_schedule("t_linear", 5, T))
    x_single, _ = _ddim_jit(
        model, params, sched, jax.random.key(7), (16, RES, RES, 3),
        ts, 0.0, None,
    )
    np.testing.assert_allclose(
        x_sharded, np.asarray(to_unit_interval(x_single)), atol=2e-5)


def test_sharded_dpmpp_matches_single_device(setup):
    model, sched, params = setup
    mesh = make_mesh()
    x_sharded = sample_grid_sharded(
        model, params, sched, mesh, kind="dpmpp", n=16, img_size=RES,
        seed=7, steps=5,
    )
    from ddpm_diffusion_model_tpu.sampling.inference import _dpmpp_jit

    ts = tuple(int(t) for t in build_ddim_schedule("t_linear", 5, T))
    x_single = _dpmpp_jit(
        model, params, sched, jax.random.key(7), (16, RES, RES, 3), ts)
    np.testing.assert_allclose(
        x_sharded, np.asarray(to_unit_interval(x_single)), atol=2e-5)


def test_sharded_dpmpp_sde_matches_single_device(setup):
    """Stochastic solver, same invariance: the per-step noise is drawn over
    the global batch shape from the same fold_in stream, so sharding does
    not change the bits."""
    model, sched, params = setup
    mesh = make_mesh()
    x_sharded = sample_grid_sharded(
        model, params, sched, mesh, kind="dpmpp_sde", n=16, img_size=RES,
        seed=7, steps=5,
    )
    from ddpm_diffusion_model_tpu.sampling.inference import _dpmpp_jit

    ts = tuple(int(t) for t in build_ddim_schedule("t_linear", 5, T))
    x_single = _dpmpp_jit(
        model, params, sched, jax.random.key(7), (16, RES, RES, 3), ts,
        sde=True)
    np.testing.assert_allclose(
        x_sharded, np.asarray(to_unit_interval(x_single)), atol=2e-5)


def test_sharded_ddpm_matches_single_device(setup):
    model, sched, params = setup
    mesh = make_mesh()
    x_sharded = sample_grid_sharded(
        model, params, sched, mesh, kind="ddpm", n=8, img_size=RES, seed=3,
    )
    x_single, _ = _ddpm_jit(
        model, params, sched, jax.random.key(3), (8, RES, RES, 3), None, None)
    np.testing.assert_allclose(
        x_sharded, np.asarray(to_unit_interval(x_single)), atol=2e-5)


def test_sharded_sample_really_shards(setup):
    """the device buffers of the scan output are distributed, not replicated"""
    model, sched, params = setup
    mesh = make_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ddpm_diffusion_model_tpu.sampling.distributed import _sharded_sample_jit

    p = jax.device_put(params, NamedSharding(mesh, P()))
    sd = jax.device_put(sched, NamedSharding(mesh, P()))
    out = _sharded_sample_jit(
        model, p, sd, jax.random.key(0), (16, RES, RES, 3), "ddpm",
        None, None, 0.0, mesh, "data",
    )
    assert len(out.sharding.device_set) == 8
    assert out.sharding.is_equivalent_to(NamedSharding(mesh, P("data")), out.ndim)


def test_sharded_sample_validation(setup):
    model, sched, params = setup
    mesh = make_mesh()
    with pytest.raises(ValueError, match="divisible"):
        sample_grid_sharded(model, params, sched, mesh, n=9, img_size=RES)
    with pytest.raises(ValueError, match="kind"):
        sample_grid_sharded(model, params, sched, mesh, kind="euler", n=8,
                            img_size=RES)
    # steps= is the DDIM ladder knob; silently running the full ancestral
    # chain for kind='ddpm' would be a ~20x wall-clock surprise
    with pytest.raises(ValueError, match="num_steps"):
        sample_grid_sharded(model, params, sched, mesh, kind="ddpm", n=8,
                            img_size=RES, steps=50)


def test_sharded_sample_ema_and_save(setup, tmp_path):
    model, sched, params = setup
    mesh = make_mesh()
    ema = jax.tree.map(lambda x: x * 0.5, params)
    out_path = tmp_path / "grid.png"
    x = sample_grid_sharded(
        model, params, sched, mesh, kind="ddim", n=16, img_size=RES,
        steps=4, ema_params=ema, save_path=str(out_path),
    )
    assert x.shape == (16, RES, RES, 3)
    assert (x >= 0).all() and (x <= 1).all()
    assert out_path.exists()


def test_sharded_hq256_topology_matches_single_device():
    """The CelebA-HQ-256 topology (channel_mults (1,1,2,2,4), attn {16},
    dynamic threshold 0.995 — ``unet_256x256_config`` scaled to base 8 /
    res 32 for CPU speed) shards over the 8-device mesh and reproduces the
    single-device scan.  The full-size (63.1M param, 256px) equality run is
    recorded in docs/BENCH.md (max err 5.4e-7 on the 8-device CPU mesh)."""
    res = 32
    cfg = UNetConfig(
        base_channels=8, channel_mults=(1, 1, 2, 2, 4), num_res_blocks=1,
        attn_resolutions=(16,), time_embed_dim=32, num_heads=2, head_dim=8,
        img_resolution=res,
    )
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    sched = make_schedule(
        DiffusionConfig(T=50, img_size=res, dynamic_threshold=0.995))
    params = model.init(jax.random.key(0), jnp.ones((1, res, res, 3)),
                        jnp.zeros((1,)))
    mesh = make_mesh()
    x8 = sample_grid_sharded(model, params, sched, mesh, kind="ddim", n=8,
                             img_size=res, seed=11, steps=4)
    ts = tuple(int(t) for t in build_ddim_schedule("t_linear", 4, 50))
    x1, _ = _ddim_jit(model, params, sched, jax.random.key(11),
                      (8, res, res, 3), ts, 0.0, None)
    np.testing.assert_allclose(
        x8, np.asarray(to_unit_interval(x1)), atol=2e-5)


def test_sharded_sampling_with_dit():
    """SPMD sampling is family-agnostic: a DiT eps_fn through
    sample_grid_sharded matches the single-device DDIM scan."""
    from ddpm_diffusion_model_tpu.models import DiTConfig, DiTDenoiser

    cfg = DiTConfig(img_resolution=RES, patch_size=4, hidden_size=32,
                    depth=2, num_heads=2, time_embed_dim=16)
    model = DiTDenoiser(cfg, dtype=jnp.float32)
    sched = make_schedule(DiffusionConfig(T=T, img_size=RES))
    params = model.init(jax.random.key(0), jnp.ones((1, RES, RES, 3)),
                        jnp.zeros((1,)))
    params = jax.tree.map(lambda a: a + 0.02, params)
    mesh = make_mesh()
    x_sharded = sample_grid_sharded(
        model, params, sched, mesh, kind="ddim", n=16, img_size=RES,
        seed=3, steps=5,
    )
    ts = tuple(int(t) for t in build_ddim_schedule("t_linear", 5, T))
    x_single, _ = _ddim_jit(
        model, params, sched, jax.random.key(3), (16, RES, RES, 3),
        ts, 0.0, None,
    )
    np.testing.assert_allclose(
        x_sharded, np.asarray(to_unit_interval(x_single)), atol=2e-5)
