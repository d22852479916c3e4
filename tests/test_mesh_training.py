"""train_ddpm with a mesh: end-to-end DP and FSDP runs on the virtual
8-device CPU mesh, including checkpoint resume under sharding."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.parallel import make_mesh
from ddpm_diffusion_model_tpu.training import TrainConfig, train_ddpm

RES = 8


@pytest.fixture(scope="module")
def setup():
    cfg = UNetConfig(
        base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
        attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
        img_resolution=RES,
    )
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    sched = make_schedule(DiffusionConfig(T=20, img_size=RES))
    params = model.init(jax.random.key(0), jnp.ones((1, RES, RES, 3)), jnp.zeros((1,)))
    rng = np.random.default_rng(0)
    data = [rng.normal(size=(16, RES, RES, 3)).astype(np.float32) * 0.3
            for _ in range(2)]
    return model, sched, params, data


def test_train_ddpm_dp_mesh(setup, tmp_path):
    model, sched, params, data = setup
    mesh = make_mesh()
    state, summary = train_ddpm(
        model, sched, data,
        train_config=TrainConfig(warmup_steps=None, grad_accum_steps=1),
        init_params=params, epochs=2, sample_every=100,
        ckpt_dir=str(tmp_path / "ck"), run_name="dp", save_every=1,
        mesh=mesh,
    )
    assert int(state.step) == 4
    assert np.isfinite(summary["epochs"][-1]["loss"])
    # resume under the same mesh
    state2, _ = train_ddpm(
        model, sched, data,
        train_config=TrainConfig(warmup_steps=None, grad_accum_steps=1),
        init_params=params, epochs=2, sample_every=100, save_last=False,
        ckpt_dir=str(tmp_path / "ck2"), run_name="dp2", save_every=100,
        resume_path=os.path.join(str(tmp_path / "ck"), "dp_e000"),
        mesh=mesh,
    )
    assert int(state2.step) == 4  # resumed at 2, one more epoch of 2


def test_train_ddpm_fsdp_mesh(setup, tmp_path):
    model, sched, params, data = setup
    mesh = make_mesh((4, 2), ("data", "fsdp"))
    state, summary = train_ddpm(
        model, sched, data,
        train_config=TrainConfig(warmup_steps=None, grad_accum_steps=2),
        init_params=params, epochs=1, sample_every=100,
        ckpt_dir=str(tmp_path / "ckf"), run_name="fsdp", save_every=100,
        save_last=False, mesh=mesh, fsdp=True,
    )
    assert np.isfinite(summary["epochs"][-1]["loss"])
    # params really sharded over the fsdp axis
    assert any(
        not l.sharding.is_fully_replicated
        for l in jax.tree.leaves(state.params)
        if hasattr(l, "sharding")
    )
