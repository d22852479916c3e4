"""Loop-glue overhead regression (VERDICT r4 #1): the epoch driver must add
no per-step host work beyond dispatch.

The r4 MoE incident: `cli train --device-cache` measured 17x slower than
the identical model/step through the direct path on the tunneled TPU.  The
r5 bisect (`scripts/r5/moe_loop_bisect.py`) showed the loader+loop glue
itself is clean (~1 ms/step dispatch); these tests pin that property so a
future loop change cannot silently reintroduce a per-step sync, a per-step
recompile, or a per-step host transfer — the three ways an epoch loop
silently loses the hardware.

Deterministic by design (counts events, not wall time): timing asserts on
a 1-core CI host are noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.data import DeviceCacheLoader
from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.training import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from ddpm_diffusion_model_tpu.training.loop import train_one_epoch

RES = 8
BATCH = 4
STEPS = 6  # < the loader's 8 batches/epoch (drop_last), so one __iter__ serves


@pytest.fixture(scope="module")
def tiny_rig():
    cfg = UNetConfig(base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
                     attn_resolutions=(), time_embed_dim=16, num_heads=1,
                     head_dim=8, img_resolution=RES)
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    sched = make_schedule(DiffusionConfig(T=20, img_size=RES))
    tcfg = TrainConfig(base_lr=1e-3, warmup_steps=2, grad_accum_steps=1)
    params = model.init(jax.random.key(0), jnp.ones((1, RES, RES, 3)),
                        jnp.zeros((1,)))
    tx = make_optimizer(tcfg)
    step = make_train_step(model, sched, tx, tcfg)
    corpus = np.random.default_rng(0).normal(
        size=(8 * BATCH, RES, RES, 3)).astype(np.float32) * 0.3
    loader = DeviceCacheLoader(corpus, BATCH, seed=0)
    return params, tcfg, tx, step, loader


def test_no_per_step_host_sync(tiny_rig, monkeypatch):
    """With log_every=0 the loop fetches device values O(1) per EPOCH (the
    accumulated loss + state.step bookkeeping), never O(steps) — per-step
    device_get over a tunneled transport is exactly the stall the r4 logs
    misattributed to the loader."""
    params, tcfg, tx, step, loader = tiny_rig
    state, _ = init_train_state(params, tcfg, tx=tx)

    calls = {"n": 0}
    real_get = jax.device_get

    def counting_get(x):
        calls["n"] += 1
        return real_get(x)

    monkeypatch.setattr(jax, "device_get", counting_get)
    state, avg_loss, nb, ni = train_one_epoch(step, state, loader,
                                              max_batches=STEPS)
    assert nb == STEPS
    assert np.isfinite(avg_loss)
    # epoch-constant budget: step0 read + final loss fetch (+ slack for
    # bookkeeping) — NOT one per step
    assert calls["n"] <= 4, (
        f"train_one_epoch made {calls['n']} device_get calls for {STEPS} "
        "steps — per-step host syncs crept into the epoch loop")


def test_no_per_step_recompile_or_transfer(tiny_rig):
    """The jitted step compiles once for the whole epoch (shape-stable
    loader contract) and the device-cache path uploads no image bytes
    per step (gathers run on device)."""
    params, tcfg, tx, step, loader = tiny_rig
    state, _ = init_train_state(params, tcfg, tx=tx)

    # warm the (single) cache entry
    b0, _ = next(iter(loader))
    state, _m = step(state, b0)
    size0 = step._cache_size()
    assert size0 == 1

    state, avg_loss, nb, ni = train_one_epoch(step, state, loader,
                                              max_batches=STEPS)
    assert nb == STEPS
    assert step._cache_size() == size0, (
        "the train step recompiled inside the epoch loop — the loader/loop "
        "glue changed a shape, dtype, or sharding per step")


def test_loop_matches_direct_loop_exactly(tiny_rig):
    """train_one_epoch performs EXACTLY the same step sequence as the bare
    for-loop over the same loader (same batches, same rng chain) — the loop
    adds bookkeeping, never different math."""
    params, tcfg, tx, step, loader = tiny_rig

    state_a, _ = init_train_state(params, tcfg, seed=3, tx=tx)
    loader.set_epoch(5)
    state_a, avg_loss, nb, _ = train_one_epoch(step, state_a, loader,
                                               max_batches=STEPS)

    state_b, _ = init_train_state(params, tcfg, seed=3, tx=tx)
    loader.set_epoch(5)
    losses = []
    for i, (x, _y) in enumerate(loader):
        if i >= STEPS:
            break
        state_b, m = step(state_b, x)
        losses.append(m["loss"])
    direct_avg = float(jax.device_get(sum(losses))) / STEPS

    assert int(jax.device_get(state_a.step)) == int(jax.device_get(state_b.step))
    np.testing.assert_allclose(avg_loss, direct_avg, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
