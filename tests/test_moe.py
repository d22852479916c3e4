"""MoE-DiT (models/moe.py) + expert parallelism (parallel/ep.py).

The reference has no MoE and no parallelism (SURVEY.md §2.6); these are
beyond-reference rows.  Contracts under test:

- switch top-1 routing with static capacity is EXACTLY a per-token
  dispatch loop (one-hot einsums are a layout change, not an approximation);
- overflow tokens drop to zero output (the residual stream carries them);
- the Switch load-balance aux loss has its closed-form value on a crafted
  router and is wired into the train loss with ``moe_aux_weight``;
- expert-sharding over an ``expert`` mesh axis changes the partitioning,
  not the numbers (forward and gradients equal on the CPU mesh up to fp32
  reassociation: the combine einsum contracts over the sharded expert
  axis, so GSPMD's per-device partial sums + all-reduce reorder fp32
  additions — observed deltas are ~1e-9 absolute);
- every non-MoE path (plain apply, samplers, pipeline refusal, config
  round-trip incl. old metas without MoE keys) keeps its contract.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import (
    DiTConfig,
    DiTDenoiser,
    MoEMlp,
    dit_moe_64_config,
)
from ddpm_diffusion_model_tpu.models.moe import _expert_init
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.parallel import (
    ep_param_specs,
    expert_parallel_mesh,
    make_mesh,
    place_params_ep,
)
from ddpm_diffusion_model_tpu.training import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)

E, H, F, B, N = 4, 16, 32, 2, 12

MOE_TINY = DiTConfig(img_resolution=16, patch_size=4, hidden_size=32,
                     depth=2, num_heads=2, time_embed_dim=16,
                     num_experts=4, capacity_factor=2.0)


def _moe(capacity_factor=2.0):
    layer = MoEMlp(hidden_size=H, mlp_dim=F, num_experts=E,
                   capacity_factor=capacity_factor, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (B, N, H), jnp.float32)
    params = layer.init(jax.random.key(1), x)
    return layer, params, x


def _ref_moe(params, x, capacity_factor):
    """Per-token Python reference: route, honor capacity order, gate."""
    p = params["params"]
    C = max(1, -(-int(N * capacity_factor) // E))
    logits = x @ p["router"]["kernel"] + p["router"]["bias"]
    probs = jax.nn.softmax(logits, axis=-1)
    idx = np.asarray(jnp.argmax(probs, axis=-1))
    gate = np.asarray(jnp.max(probs, axis=-1))
    y = np.zeros_like(np.asarray(x))
    for b in range(B):
        counts = [0] * E
        for n in range(N):
            e = int(idx[b, n])
            if counts[e] >= C:
                continue
            counts[e] += 1
            h = jax.nn.gelu(x[b, n] @ p["wi"][e] + p["bi"][e],
                            approximate=True)
            y[b, n] = gate[b, n] * np.asarray(h @ p["wo"][e] + p["bo"][e])
    return y


def test_moe_matches_per_token_dispatch_loop():
    layer, params, x = _moe()
    y, aux = layer.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), _ref_moe(params, x, 2.0),
                               rtol=1e-5, atol=1e-6)
    assert np.isfinite(float(aux))


def test_capacity_overflow_drops_to_zero():
    """All tokens routed to one expert + capacity 1 => only the first token
    per sequence is processed; the rest output exactly 0."""
    layer, params, x = _moe(capacity_factor=E / N)  # C = 1
    p = jax.tree.map(lambda a: a, params)
    p["params"]["router"]["kernel"] = jnp.zeros((H, E))
    p["params"]["router"]["bias"] = jnp.array([0.0, 50.0, 0.0, 0.0])
    y, _ = layer.apply(p, x)
    y = np.asarray(y)
    assert np.abs(y[:, 0]).max() > 0
    np.testing.assert_array_equal(y[:, 1:], 0.0)
    # and the reference loop agrees on the whole thing
    np.testing.assert_allclose(y, _ref_moe(p, x, E / N),
                               rtol=1e-5, atol=1e-6)


def test_aux_loss_closed_form_on_uniform_router():
    """Zeroed router => uniform probs, argmax ties to expert 0:
    f = (1,0,...), P = 1/E  =>  aux = E * sum(f*P) = 1 exactly."""
    layer, params, x = _moe()
    p = jax.tree.map(lambda a: a, params)
    p["params"]["router"]["kernel"] = jnp.zeros((H, E))
    p["params"]["router"]["bias"] = jnp.zeros((E,))
    _, aux = layer.apply(p, x)
    assert float(aux) == pytest.approx(1.0, abs=1e-6)


def test_expert_init_matches_dense_fan_in():
    """Per-expert fan-in statistics match a dense kernel of the same
    (in, out) — the E axis must be a batch axis, not extra fan-in."""
    k = jax.random.key(0)
    w = _expert_init()(k, (E, 256, 512), jnp.float32)
    dense = jax.nn.initializers.lecun_normal()(k, (256, 512), jnp.float32)
    assert np.asarray(w).std() == pytest.approx(
        np.asarray(dense).std(), rel=0.15)


def _init_dit(cfg, **kw):
    model = DiTDenoiser(cfg, dtype=jnp.float32, **kw)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1,)))
    return model, params


def test_dit_moe_scan_matches_unrolled():
    model_s, params_s = _init_dit(MOE_TINY)
    model_u = DiTDenoiser(MOE_TINY, dtype=jnp.float32, scan_blocks=False)
    stacked = params_s["params"]["blocks"]
    rest = {k: v for k, v in params_s["params"].items() if k != "blocks"}
    for i in range(MOE_TINY.depth):
        rest[f"block{i}"] = jax.tree.map(lambda a, i=i: a[i], stacked)
    params_u = {"params": rest}

    x = jax.random.normal(jax.random.key(2), (2, 16, 16, 3))
    t = jnp.array([5.0, 30.0])
    a, aux_a = model_s.apply(params_s, x, t, return_aux=True)
    b, aux_b = model_u.apply(params_u, x, t, return_aux=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    assert float(aux_a) == pytest.approx(float(aux_b), rel=1e-5)


def test_ep_sharding_equality_forward_and_grads():
    model, params = _init_dit(MOE_TINY)
    x = jax.random.normal(jax.random.key(3), (8, 16, 16, 3))
    t = jnp.full((8,), 7.0)
    ref = jax.jit(lambda v: model.apply(v, x, t))(params)

    mesh = make_mesh((2, 4), ("data", "expert"))
    specs = ep_param_specs(params, mesh)
    from jax.sharding import PartitionSpec as P
    sharded_leaves = [s for s in jax.tree.leaves(
        specs, is_leaf=lambda s: isinstance(s, P)) if s != P()]
    assert len(sharded_leaves) == 4  # wi, wo, bi, bo (stacked over layers)

    vp = place_params_ep(params, mesh)
    with expert_parallel_mesh(mesh):
        out = jax.jit(lambda v: model.apply(v, x, t))(vp)
    # not assert_array_equal: the combine einsum contracts over the
    # sharded expert axis, so partial sums + all-reduce reassociate fp32
    # additions (measured ~2e-9 abs on the CPU mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)

    def loss(v):
        eps, aux = model.apply(v, x, t, return_aux=True)
        return jnp.sum(eps.astype(jnp.float32) ** 2) + aux

    g_ref = jax.jit(jax.grad(loss))(params)
    with expert_parallel_mesh(mesh):
        g_ep = jax.jit(jax.grad(loss))(vp)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7), g_ref, g_ep)


def test_ep_requires_divisible_expert_count():
    model, params = _init_dit(dataclasses.replace(MOE_TINY, num_experts=3,
                                                  num_heads=2))
    mesh = make_mesh((4, 2), ("data", "expert"))
    x = jnp.zeros((2, 16, 16, 3))
    with expert_parallel_mesh(mesh):
        with pytest.raises(ValueError, match="not divisible"):
            model.apply(params, x, jnp.zeros((2,)))


def test_train_step_moe_and_aux_weight_contribution():
    from ddpm_diffusion_model_tpu.training.step import make_loss_fn

    cfg = dataclasses.replace(MOE_TINY, moe_aux_weight=0.01)
    model, params = _init_dit(cfg)
    sched = make_schedule(DiffusionConfig(T=50, img_size=16))
    tcfg = TrainConfig(base_lr=1e-3, warmup_steps=5, grad_accum_steps=2)
    tx = make_optimizer(tcfg)
    state, _ = init_train_state(params, tcfg, tx=tx)
    batch = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 16, 16, 3)), jnp.float32)
    step = make_train_step(model, sched, tx, tcfg)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1

    # the aux term contributes exactly moe_aux_weight * aux
    model0 = DiTDenoiser(dataclasses.replace(cfg, moe_aux_weight=0.0),
                         dtype=jnp.float32)
    k = jax.random.key(9)
    lw = float(make_loss_fn(model, sched)(params, batch, k))
    l0 = float(make_loss_fn(model0, sched)(params, batch, k))
    _, aux = model.apply(params, batch, jnp.zeros((8,)), return_aux=True)
    assert lw > l0
    # same key => same (t, noise); difference is order-aux * weight
    assert (lw - l0) == pytest.approx(0.01 * float(aux), rel=0.3)


def test_sampler_path_unchanged_and_pipeline_refuses_moe():
    from ddpm_diffusion_model_tpu.parallel import PipelinedDiT
    from ddpm_diffusion_model_tpu.sampling.loops import ddim_sample_loop

    model, params = _init_dit(MOE_TINY)
    sched = make_schedule(DiffusionConfig(T=50, img_size=16))

    def eps_fn(x_t, tt):
        return model.apply(params, x_t, tt)  # no return_aux: plain array

    x0 = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    x, _ = ddim_sample_loop(sched, eps_fn, x0, jax.random.key(1),
                            timesteps=np.array([40, 20, 10, 0]))
    assert np.isfinite(np.asarray(x)).all()

    mesh = make_mesh((4,), ("pp",), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="expert"):
        PipelinedDiT(model, mesh).apply(params, jnp.zeros((4, 16, 16, 3)),
                                        jnp.zeros((4,)))


def test_config_roundtrip_and_legacy_metas_stay_dense():
    cfg = dit_moe_64_config()
    assert cfg.num_experts == 8
    d = cfg.to_dict()
    back = DiTConfig.from_dict(d)
    assert back == cfg
    # an r3-era meta without MoE keys loads as a dense DiT
    legacy = {k: v for k, v in d.items()
              if k not in ("num_experts", "capacity_factor",
                           "moe_aux_weight")}
    old = DiTConfig.from_dict(legacy)
    assert old.num_experts == 0
