"""Training-runtime tests — EMA init/update/health/repair, LR warmup
schedule, compiled train step (loss decreases on a trivial task, grad accum
equivalence, EMA tracks params), checkpoint save/load round trip with
overrides, and a micro end-to-end train_ddpm run with resume.
Coverage mirrors ``testing/test_training_components.py``."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.training import (
    TrainConfig,
    apply_resume_overrides,
    ema_health,
    ema_init,
    ema_update,
    init_train_state,
    load_checkpoint,
    make_lr_schedule,
    make_optimizer,
    make_probe_fn,
    make_train_step,
    save_checkpoint,
    train_ddpm,
)

RES = 8
T = 50


@pytest.fixture(scope="module")
def setup():
    cfg = UNetConfig(
        base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
        attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
        img_resolution=RES, dropout=0.1,
    )
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    sched = make_schedule(DiffusionConfig(T=T, img_size=RES))
    params = model.init(jax.random.key(0), jnp.ones((1, RES, RES, 3)), jnp.zeros((1,)))
    return model, sched, params


# ---------- EMA ----------

def test_ema_init_mirrors_params(setup):
    _, _, params = setup
    ema = ema_init(params)
    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_update_moves_toward_params(setup):
    _, _, params = setup
    ema = jax.tree.map(jnp.zeros_like, params)
    ema2 = ema_update(ema, params, 0.9)
    for e2, p in zip(jax.tree.leaves(ema2), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(e2), 0.1 * np.asarray(p), rtol=1e-5)


def test_ema_update_traced_decay(setup):
    _, _, params = setup
    ema = ema_init(params)
    f = jax.jit(lambda e, p, d: ema_update(e, p, d))
    out = f(ema, params, jnp.asarray(0.5))
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_ema_health_ok_and_failures(setup):
    _, _, params = setup
    ema = ema_init(params)
    ok, reason, rel = ema_health(ema, params)
    assert ok and reason == "ok" and rel < 1e-6

    # nan poison
    bad = jax.tree.map(lambda p: p, ema)
    leaves, treedef = jax.tree.flatten(bad)
    leaves[0] = leaves[0].at[(0,) * leaves[0].ndim].set(jnp.nan)
    bad = jax.tree.unflatten(treedef, leaves)
    ok, reason, _ = ema_health(bad, params)
    assert not ok and reason == "nan_or_inf_in_ema"

    # zero shadow
    zeros = jax.tree.map(jnp.zeros_like, params)
    ok, reason, _ = ema_health(zeros, params)
    assert not ok and reason == "ema_zero_norm"

    # large drift
    big = jax.tree.map(lambda p: p + 100.0, params)
    ok, reason, rel = ema_health(big, params, rel_tol=5.0)
    assert not ok and reason == "large_rel_diff" and rel > 5.0


# ---------- LR schedule / optimizer ----------

def test_lr_warmup_schedule():
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=100)
    s = make_lr_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), 1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(s(49)), 5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(99)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(s(500)), 1e-3, rtol=1e-5)


def test_lr_no_warmup():
    cfg = TrainConfig(base_lr=2e-4, warmup_steps=None)
    s = make_lr_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), 2e-4, rtol=1e-6)


# ---------- train step ----------

def test_train_step_advances_and_is_finite(setup):
    model, sched, params = setup
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=10, grad_accum_steps=1)
    tx = make_optimizer(cfg)
    state, _ = init_train_state(params, cfg, tx=tx)
    step = make_train_step(model, sched, tx, cfg)

    batch = jax.random.normal(jax.random.key(1), (4, RES, RES, 3)) * 0.5
    state2, metrics = step(state, batch)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"])) and float(metrics["grad_norm"]) > 0
    # params actually moved
    diff = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(state2.params), jax.tree.leaves(params))
    )
    assert diff > 0
    # EMA is between old params and new params (moved slightly)
    ema_diff = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(state2.ema_params), jax.tree.leaves(params))
    )
    assert 0 < ema_diff < diff


def test_loss_decreases_over_steps(setup):
    model, sched, params = setup
    cfg = TrainConfig(base_lr=3e-3, warmup_steps=None, grad_accum_steps=1,
                      ema_decay=0.99)
    tx = make_optimizer(cfg)
    state, _ = init_train_state(params, cfg, tx=tx)
    step = make_train_step(model, sched, tx, cfg)

    # constant dataset: tiny model should quickly beat the eps~N(0,1) baseline
    batch = jnp.zeros((8, RES, RES, 3))
    losses = []
    for _ in range(30):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_grad_accum_equivalence(setup):
    model, sched, params = setup
    batch = jax.random.normal(jax.random.key(2), (8, RES, RES, 3)) * 0.3

    def run(accum):
        cfg = TrainConfig(base_lr=1e-3, warmup_steps=None, grad_accum_steps=accum,
                          grad_clip=None)
        tx = make_optimizer(cfg)
        state, _ = init_train_state(params, cfg, seed=0, tx=tx)
        step = make_train_step(model, sched, tx, cfg)
        state, m = step(state, batch)
        return state, m

    s1, m1 = run(1)
    s2, m2 = run(2)
    # different RNG per microbatch -> not identical, but same scale and both move
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 2.0
    assert int(s2.step) == 1  # 2 microbatches = ONE optimizer step


def test_probe_fn(setup):
    model, sched, params = setup
    probe = make_probe_fn(model, sched)
    x = jax.random.normal(jax.random.key(3), (4, RES, RES, 3)) * 0.3
    vals = probe(params, x, (5, 20, 45), jax.random.key(4))
    v = np.asarray(vals)
    assert v.shape == (3,)
    assert np.all(np.isfinite(v)) and np.all(v > 0)


# ---------- checkpoint ----------

def test_checkpoint_roundtrip_and_overrides(setup, tmp_path):
    model, sched, params = setup
    cfg = TrainConfig(grad_accum_steps=1, warmup_steps=None)
    tx = make_optimizer(cfg)
    state, _ = init_train_state(params, cfg, tx=tx)
    step = make_train_step(model, sched, tx, cfg)
    batch = jax.random.normal(jax.random.key(5), (4, RES, RES, 3)) * 0.3
    for _ in range(3):
        state, _ = step(state, batch)

    p = str(tmp_path / "ckpt_e000")
    save_checkpoint(p, state, epoch=0, extra={"note": "x"},
                    configs={"train": cfg.to_dict()})
    assert os.path.isdir(p)

    template, _ = init_train_state(params, cfg, tx=tx)
    restored, meta = load_checkpoint(p, template)
    assert meta["epoch"] == 0 and meta["global_step"] == 3
    assert meta["configs"]["train"]["base_lr"] == cfg.base_lr
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(restored.ema_params), jax.tree.leaves(state.ema_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored state continues training identically (same rng stream)
    s_a, m_a = step(state, batch)
    # recreate: loading consumed nothing
    restored2, _ = load_checkpoint(p, template)
    s_b, m_b = step(restored2, batch)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5)

    # overrides
    template2, _ = init_train_state(params, cfg, tx=tx)
    restored3, _ = load_checkpoint(p, template2)
    out = apply_resume_overrides(
        restored3, template2, reset_optimizer_state=True, override_ema_decay=0.5,
    )
    np.testing.assert_allclose(float(out.ema_decay), 0.5)

    # EMA repair path: poison the shadow, ask for repair
    poisoned = restored3.replace(
        ema_params=jax.tree.map(lambda p: p * 0.0, restored3.ema_params)
    )
    repaired = apply_resume_overrides(
        poisoned, template2, repair_ema=True, ema_decay_after_repair=0.123,
    )
    np.testing.assert_allclose(float(repaired.ema_decay), 0.123, rtol=1e-6)
    for a, b in zip(
        jax.tree.leaves(repaired.ema_params), jax.tree.leaves(repaired.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------- end-to-end micro run ----------

def test_train_ddpm_end_to_end_with_resume(setup, tmp_path, capsys):
    model, sched, params = setup
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=5, grad_accum_steps=2,
                      ema_decay=0.99)

    rng = np.random.default_rng(0)
    data = [rng.normal(size=(4, RES, RES, 3)).astype(np.float32) * 0.3 for _ in range(3)]

    sample_calls = []

    def sample_fn(model_, params_, sched_, *, n, img_size, save_path, seed):
        sample_calls.append(save_path)

    ckpt_dir = str(tmp_path / "ck")
    state, summary = train_ddpm(
        model, sched, data,
        train_config=cfg, init_params=params,
        epochs=2, sample_every=1, sample_n=1, img_size=RES,
        sample_fn=sample_fn, ckpt_dir=ckpt_dir, run_name="t",
        save_every=1, log_every=1, probe_timesteps=[5, 20],
        log_grad_norm=True,
        configs_for_ckpt={"train": cfg.to_dict()},
    )
    out = capsys.readouterr().out
    assert "DDPM run: t" in out
    assert "imgs/s" in out
    # real zero-predictor baseline on the first device batch (~E[eps^2]=1)
    base_line = [l for l in out.splitlines() if "(baseline)" in l]
    assert base_line, "baseline eps-MSE print missing"
    base_val = float(base_line[0].split("~")[1].split()[0])
    assert abs(base_val - 1.0) < 0.25
    assert "probes" in out or "t=5" in out
    assert len(sample_calls) == 2
    assert int(state.step) == 6  # 2 epochs * 3 batches
    assert len(summary["epochs"]) == 2
    assert os.path.isdir(os.path.join(ckpt_dir, "t_last"))

    # resume from epoch-0 checkpoint and run one more epoch
    state2, _ = train_ddpm(
        model, sched, data,
        train_config=cfg, init_params=params,
        epochs=2, sample_every=10, img_size=RES,
        ckpt_dir=ckpt_dir, run_name="t2", save_every=10, save_last=False,
        resume_path=os.path.join(ckpt_dir, "t_e000"),
        override_lr=5e-4, repair_ema_on_resume=True,
    )
    out2 = capsys.readouterr().out
    assert "[RESUME] loaded" in out2
    assert "override_lr" in out2
    assert int(state2.step) == 6  # resumed at 3, one epoch of 3 batches


def test_loss_weighting_schemes(setup):
    """TrainConfig.loss_weighting wires the reference's per-sample weight
    path; p2 must down-weight low-noise timesteps."""
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.training import resolve_weight_fn

    _model, sched, _params = setup
    t = jnp.array([1, sched.T // 2, sched.T - 1])
    assert resolve_weight_fn(None) is None
    for name in ("snr", "p2", "min_snr_5"):
        w = np.asarray(resolve_weight_fn(name)(t, sched))
        assert w.shape == (3,) and np.all(np.isfinite(w)) and np.all(w > 0)
    p2 = np.asarray(resolve_weight_fn("p2")(t, sched))
    assert p2[0] < p2[-1]  # low-noise t gets less weight
    with pytest.raises(ValueError):
        resolve_weight_fn("nope")

    # end-to-end: a weighted step runs and differs from uniform
    cfg_w = TrainConfig(base_lr=1e-3, warmup_steps=None, grad_accum_steps=1,
                        loss_weighting="p2")
    tx = make_optimizer(cfg_w)
    state, _ = init_train_state(_params, cfg_w, tx=tx)
    step = make_train_step(_model, sched, tx, cfg_w)
    batch = jax.random.normal(jax.random.key(11), (4, RES, RES, 3)) * 0.3
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_partial_checkpoint_restore(setup, tmp_path):
    """Restore-each-iff-passed semantics (chekpoints.py:16-25): a
    params-only load keeps the template's fresh optimizer/step/rng and must
    work even when the template's optimizer structure differs from the one
    in the checkpoint (fine-tuning with a different optimizer)."""
    import optax

    model, sched, params = setup
    cfg = TrainConfig(grad_accum_steps=1, warmup_steps=None)
    tx = make_optimizer(cfg)
    state, _ = init_train_state(params, cfg, tx=tx)
    step = make_train_step(model, sched, tx, cfg)
    batch = jax.random.normal(jax.random.key(5), (4, RES, RES, 3)) * 0.3
    for _ in range(2):
        state, _ = step(state, batch)

    p = str(tmp_path / "ckpt_partial")
    save_checkpoint(p, state, epoch=0)

    # template with a structurally different optimizer (SGD, no moments)
    template, _ = init_train_state(params, cfg, tx=optax.sgd(1e-3))
    restored, _ = load_checkpoint(p, template, components=("params", "ema_params"))
    assert int(restored.step) == 0  # kept template's fresh step
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state is the template's (SGD), untouched by the Adam checkpoint
    assert jax.tree.structure(restored.opt_state) == jax.tree.structure(
        template.opt_state
    )

    with pytest.raises(ValueError, match="unknown checkpoint components"):
        load_checkpoint(p, template, components=("params", "bogus"))


def test_async_checkpoint_save(setup, tmp_path):
    """block=False returns before the meta sidecar lands;
    wait_for_checkpoints makes it durable (VERDICT round-1 item 8)."""
    from ddpm_diffusion_model_tpu.training import wait_for_checkpoints

    model, sched, params = setup
    cfg = TrainConfig(grad_accum_steps=1, warmup_steps=None)
    tx = make_optimizer(cfg)
    state, _ = init_train_state(params, cfg, tx=tx)

    mirror = str(tmp_path / "mirror")
    p = str(tmp_path / "ckpt_async")
    save_checkpoint(p, state, epoch=1, block=False, mirror_dir=mirror,
                    fixed_mirror_name="latest")
    wait_for_checkpoints()
    assert os.path.exists(os.path.join(p, "meta.json"))
    assert os.path.isdir(os.path.join(mirror, "latest"))

    template, _ = init_train_state(params, cfg, tx=tx)
    restored, meta = load_checkpoint(p, template)
    assert meta["epoch"] == 1
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_ddpm_reports_rfid(setup, tmp_path, capsys):
    """fid_reference wires per-epoch rFID scoring into the sampling hook."""
    model, sched, params = setup
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=None, grad_accum_steps=1)
    rng = np.random.default_rng(0)
    data = [rng.normal(size=(4, RES, RES, 3)).astype(np.float32) * 0.3
            for _ in range(2)]
    ref = rng.uniform(-1, 1, size=(64, RES, RES, 3)).astype(np.float32)

    def sample_fn(model_, params_, sched_, *, n, img_size, save_path, seed):
        return np.random.default_rng(seed).uniform(
            0, 1, size=(64, img_size, img_size, 3)
        ).astype(np.float32)

    _state, summary = train_ddpm(
        model, sched, data, train_config=cfg, init_params=params,
        epochs=1, sample_every=1, sample_n=4, img_size=RES,
        sample_fn=sample_fn, ckpt_dir=str(tmp_path), run_name="rf",
        save_every=0, save_last=False, fid_reference=ref,
    )
    out = capsys.readouterr().out
    assert "rFID=" in out
    assert "rfid" in summary["epochs"][-1]
    assert summary["epochs"][-1]["rfid"] >= 0.0


# ---------- flat optimizer + dropout RNG family (round-2 perf knobs) ----------


def test_flat_optimizer_matches_tree(setup):
    """flatten_optimizer applies the same clip+AdamW math as the tree
    optimizer.  Compared on FIXED synthetic grads (feeding both through a
    model step would compare two different XLA programs, whose bf16 fusion
    differences Adam amplifies to O(lr) — see test_parallel's DP note)."""
    model, sched, params = setup
    cfg_tree = TrainConfig(base_lr=1e-3, warmup_steps=None, flat_optimizer=False)
    cfg_flat = TrainConfig(base_lr=1e-3, warmup_steps=None, flat_optimizer=True)
    tx_tree = make_optimizer(cfg_tree)
    tx_flat = make_optimizer(cfg_flat)

    keys = iter(jax.random.split(jax.random.key(7), 100))
    grads = jax.tree.map(
        lambda p: jax.random.normal(next(keys), p.shape, p.dtype) * 0.01, params)

    p1 = p2 = params
    s1, s2 = tx_tree.init(p1), tx_flat.init(p2)
    import optax
    for _ in range(3):
        u1, s1 = tx_tree.update(grads, s1, p1)
        p1 = optax.apply_updates(p1, u1)
        u2, s2 = tx_flat.update(grads, s2, p2)
        p2 = optax.apply_updates(p2, u2)

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_flat_optimizer_state_is_fsdp_shardable(setup):
    """The padded flat m/v leaves divide any power-of-two mesh axis."""
    from ddpm_diffusion_model_tpu.parallel.sharding import fsdp_leaf_spec
    from ddpm_diffusion_model_tpu.parallel.mesh import make_mesh

    model, sched, params = setup
    cfg = TrainConfig(flat_optimizer=True)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    mesh = make_mesh((2, 4), ("data", "fsdp"))
    big = [leaf for leaf in jax.tree.leaves(opt_state)
           if hasattr(leaf, "ndim") and leaf.ndim == 1 and leaf.size > 8192]
    assert big, "expected flat moment vectors in opt_state"
    for leaf in big:
        assert leaf.shape[0] % 8192 == 0
        spec = fsdp_leaf_spec(
            jax.ShapeDtypeStruct(leaf.shape, leaf.dtype), mesh)
        assert spec == jax.sharding.PartitionSpec("fsdp")


def test_flat_optimizer_checkpoint_roundtrip(setup, tmp_path):
    model, sched, params = setup
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=5, flat_optimizer=True)
    tx = make_optimizer(cfg)
    state, _ = init_train_state(params, cfg, tx=tx)
    step = make_train_step(model, sched, tx, cfg)
    batch = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, RES, RES, 3)).astype(np.float32))
    state, _ = step(state, batch)
    p = save_checkpoint(str(tmp_path / "flat"), state, epoch=0)
    template, _ = init_train_state(params, cfg, tx=tx)
    restored, _ = load_checkpoint(p, template)
    for a, b in zip(jax.tree.leaves(restored.opt_state),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_moment_dtype_bf16_trains_and_halves_mu(setup):
    """moment_dtype="bfloat16" stores Adam's mu in bf16 (nu stays fp32) and
    a short training run stays finite and close to the fp32-moment run."""
    model, sched, params = setup
    cfg32 = TrainConfig(base_lr=1e-3, warmup_steps=None)
    cfgbf = TrainConfig(base_lr=1e-3, warmup_steps=None,
                        moment_dtype="bfloat16")
    tx32, txbf = make_optimizer(cfg32), make_optimizer(cfgbf)
    s32 = tx32.init(params)
    sbf = txbf.init(params)
    vecs32 = [l for l in jax.tree.leaves(s32)
              if hasattr(l, "ndim") and l.ndim == 1 and l.size > 1]
    vecsbf = [l for l in jax.tree.leaves(sbf)
              if hasattr(l, "ndim") and l.ndim == 1 and l.size > 1]
    assert {str(l.dtype) for l in vecs32} == {"float32"}
    assert sorted(str(l.dtype) for l in vecsbf) == ["bfloat16", "float32"]

    keys = iter(jax.random.split(jax.random.key(11), 100))
    grads = jax.tree.map(
        lambda p: jax.random.normal(next(keys), p.shape, p.dtype) * 0.01,
        params)
    import optax
    p32 = pbf = params
    for _ in range(3):
        u32, s32 = tx32.update(grads, s32, p32)
        p32 = optax.apply_updates(p32, u32)
        ubf, sbf = txbf.update(grads, sbf, pbf)
        pbf = optax.apply_updates(pbf, ubf)
    for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(pbf)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        # bf16 mu rounding perturbs updates at ~1e-2 relative, not more
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-2 * 1e-3)


def test_fid_extractor_hook_scores_true_fid(setup, tmp_path):
    """train_ddpm(fid_extractor=...) scores TRUE FID next to rFID at each
    sampling epoch (the offline north-star hook, utils/fid.py)."""
    torch = pytest.importorskip("torch")
    model, sched, params = setup

    class TinyExtractor(torch.nn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(0)
            self.conv = torch.nn.Conv2d(3, 16, 3, stride=2)

        def forward(self, x):
            h = torch.nn.functional.leaky_relu(self.conv(x * 2 - 1), 0.2)
            return torch.cat([h.mean(dim=(2, 3)), h.std(dim=(2, 3))], dim=1)

    ex_path = str(tmp_path / "extractor.pt")
    torch.jit.save(torch.jit.script(TinyExtractor()), ex_path)

    rng = np.random.default_rng(0)
    ref = (rng.random((96, RES, RES, 3)).astype(np.float32) * 2 - 1)
    data = [rng.normal(size=(4, RES, RES, 3)).astype(np.float32) * 0.3]

    def fake_sample(model_, params_, sched_, *, n, img_size, save_path, seed):
        r = np.random.default_rng(seed or 0)
        return r.random((n, img_size, img_size, 3)).astype(np.float32)

    cfg = TrainConfig(base_lr=1e-3, warmup_steps=None, grad_accum_steps=1)
    _, summary = train_ddpm(
        model, sched, data, train_config=cfg, init_params=params,
        epochs=1, sample_every=1, sample_n=96, img_size=RES,
        sample_fn=fake_sample, fid_reference=ref, fid_extractor=ex_path,
        ckpt_dir=str(tmp_path / "ck"), run_name="fidhook", save_every=10,
        save_last=False,
    )
    ep = summary["epochs"][-1]
    assert np.isfinite(ep["rfid"]) and np.isfinite(ep["fid"])
    assert ep["fid"] >= 0.0


def test_train_config_from_dict_legacy_defaults():
    """Checkpoint metas written before the r2 knobs (legacy=True) restore
    the legacy behaviors; fresh config files get the modern defaults."""
    pre_r2 = {k: v for k, v in TrainConfig().to_dict().items()
              if k not in ("flat_optimizer", "dropout_rng_impl")}
    cfg = TrainConfig.from_dict(pre_r2, legacy=True)
    assert cfg.flat_optimizer is False
    assert cfg.dropout_rng_impl == "threefry"
    # a fresh config file omitting the knobs gets the modern defaults
    fresh = TrainConfig.from_dict(pre_r2)
    assert fresh.flat_optimizer is True
    assert fresh.dropout_rng_impl == "rbg"
    # and a modern round trip preserves explicit values either way
    assert TrainConfig.from_dict(TrainConfig().to_dict(), legacy=True).flat_optimizer is True


def test_dropout_rng_impl_rbg_trains(setup):
    """rbg dropout keys: step runs, loss finite, and the mask stream really
    changes (loss differs from the threefry run on the same step key)."""
    model, sched, params = setup
    batch = jnp.asarray(
        np.random.default_rng(5).normal(size=(8, RES, RES, 3)).astype(np.float32) * 0.3)

    losses = {}
    for impl in ("threefry", "rbg"):
        cfg = TrainConfig(base_lr=1e-3, warmup_steps=None, dropout_rng_impl=impl)
        tx = make_optimizer(cfg)
        state, _ = init_train_state(params, cfg, tx=tx)
        step = make_train_step(model, sched, tx, cfg)
        state, m = step(state, batch)
        loss = float(m["loss"])
        assert np.isfinite(loss)
        losses[impl] = loss
    # same t/noise stream (threefry), different dropout masks
    assert losses["threefry"] != losses["rbg"]


def test_dropout_key_identity_and_validation():
    from ddpm_diffusion_model_tpu.training.step import _dropout_key

    k = jax.random.key(0)
    assert _dropout_key(k, "threefry") is k
    krbg = _dropout_key(k, "rbg")
    assert jax.random.bernoulli(krbg, 0.5, (16,)).shape == (16,)
    with pytest.raises(ValueError):
        _dropout_key(k, "nope")


def test_train_ddpm_metrics_jsonl(setup, tmp_path):
    """Per-epoch machine-readable run log: one JSON line per epoch with
    loss/lr/global_step/imgs_per_s, appended as the run progresses."""
    import json as _json

    model, sched, params = setup
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=5, grad_accum_steps=1)
    rng = np.random.default_rng(0)
    data = [rng.normal(size=(4, RES, RES, 3)).astype(np.float32) * 0.3
            for _ in range(2)]
    ckpt_dir = str(tmp_path / "ck")
    _state, summary = train_ddpm(
        model, sched, data, train_config=cfg, init_params=params,
        epochs=2, sample_every=10, img_size=RES, ckpt_dir=ckpt_dir,
        run_name="mj", save_every=10, save_last=False,
    )
    path = summary["metrics_jsonl"]
    assert path == os.path.join(ckpt_dir, "mj_metrics.jsonl")
    with open(path) as f:
        recs = [_json.loads(l) for l in f]
    assert len(recs) == 2
    assert [r["epoch"] for r in recs] == [0, 1]
    for r in recs:
        assert np.isfinite(r["loss"]) and r["lr"] > 0
        assert r["global_step"] > 0 and r["imgs_per_s"] > 0

    # explicit path override and None-disable
    custom = str(tmp_path / "run.jsonl")
    _s, summ2 = train_ddpm(
        model, sched, data, train_config=cfg, init_params=params,
        epochs=1, sample_every=10, img_size=RES, ckpt_dir=ckpt_dir,
        run_name="mj2", save_every=10, save_last=False,
        metrics_jsonl=custom,
    )
    assert os.path.exists(custom) and summ2["metrics_jsonl"] == custom
    _s, summ3 = train_ddpm(
        model, sched, data, train_config=cfg, init_params=params,
        epochs=1, sample_every=10, img_size=RES, ckpt_dir=ckpt_dir,
        run_name="mj3", save_every=10, save_last=False, metrics_jsonl=None,
    )
    assert "metrics_jsonl" not in summ3
    assert not os.path.exists(os.path.join(ckpt_dir, "mj3_metrics.jsonl"))


def test_evaluate_loss_and_eval_hook(setup, tmp_path):
    """Validation pass: evaluate_loss is deterministic in its fixed keys
    (same value on repeat call), and train_ddpm(eval_loader=...) records
    val_loss / val_loss_ema per epoch in summary and the metrics JSONL."""
    import json as _json

    from ddpm_diffusion_model_tpu.training import evaluate_loss, make_eval_step

    model, sched, params = setup
    eval_fn = make_eval_step(model, sched)
    rng = np.random.default_rng(1)
    val = [rng.normal(size=(4, RES, RES, 3)).astype(np.float32) * 0.3
           for _ in range(2)]
    a = evaluate_loss(eval_fn, params, val)
    b = evaluate_loss(eval_fn, params, val)
    assert a == b and np.isfinite(a)
    # max_batches truncation changes the estimate's support
    c = evaluate_loss(eval_fn, params, val, max_batches=1)
    assert np.isfinite(c)

    cfg = TrainConfig(base_lr=1e-3, warmup_steps=5, grad_accum_steps=1)
    data = [rng.normal(size=(4, RES, RES, 3)).astype(np.float32) * 0.3
            for _ in range(2)]
    ckpt_dir = str(tmp_path / "ck")
    _state, summary = train_ddpm(
        model, sched, data, train_config=cfg, init_params=params,
        epochs=2, sample_every=10, img_size=RES, ckpt_dir=ckpt_dir,
        run_name="ev", save_every=10, save_last=False,
        eval_loader=val, eval_every=1,
    )
    for e in summary["epochs"]:
        assert np.isfinite(e["val_loss"]) and np.isfinite(e["val_loss_ema"])
    with open(summary["metrics_jsonl"]) as f:
        recs = [_json.loads(l) for l in f]
    assert all("val_loss" in r and "val_loss_ema" in r for r in recs)


def test_repair_decay_respects_override(setup):
    """An explicit override_ema_decay must survive a forced EMA repair
    (the repair's default decay must not clobber it)."""
    from ddpm_diffusion_model_tpu.training import apply_resume_overrides

    model, sched, params = setup
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=2)
    state, _ = init_train_state(params, cfg, tx=make_optimizer(cfg))
    out = apply_resume_overrides(
        state, state, repair_ema="force", override_ema_decay=0.98)
    assert abs(float(jax.device_get(out.ema_decay)) - 0.98) < 1e-6
    # explicit after-repair value still wins over the override
    out2 = apply_resume_overrides(
        state, state, repair_ema="force", override_ema_decay=0.98,
        ema_decay_after_repair=0.5)
    assert abs(float(jax.device_get(out2.ema_decay)) - 0.5) < 1e-6
    # and the forced repair re-seeds the shadow from the params (copy)
    a = jax.tree.leaves(out.ema_params)[0]
    b = jax.tree.leaves(state.params)[0]
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_resume_overrides_ignored_on_fresh_start(setup, tmp_path, capsys):
    """Resume-time overrides must not silently apply when --resume auto
    finds nothing: the run warns, trains at the config LR, and skips the
    repair/reset."""
    model, sched, params = setup
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=2, grad_accum_steps=1)
    rng = np.random.default_rng(0)
    data = [rng.normal(size=(4, RES, RES, 3)).astype(np.float32) * 0.3]
    _state, _summary = train_ddpm(
        model, sched, data, train_config=cfg, init_params=params,
        epochs=1, sample_every=10, img_size=RES,
        ckpt_dir=str(tmp_path / "empty"), run_name="fresh", save_every=10,
        save_last=False, resume_path="auto",
        override_lr=5e-4, repair_ema_on_resume="force",
        reset_optimizer_state=True,
    )
    out = capsys.readouterr().out
    assert "none found (fresh start)" in out
    assert "WARNING: resume-time overrides requested" in out
    assert "base_lr: 1.00e-03" in out      # config LR, not the override
    assert "Reinitialized" not in out      # no repair happened


def test_explicit_falsy_override_warns_on_fresh_start(setup, tmp_path, capsys):
    """--override-lr 0.0 is falsy but explicitly passed: the fresh-start
    gate must catch it (is-not-None test, not truthiness)."""
    model, sched, params = setup
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=None, grad_accum_steps=1)
    rng = np.random.default_rng(0)
    data = [rng.normal(size=(4, RES, RES, 3)).astype(np.float32) * 0.3]
    train_ddpm(
        model, sched, data, train_config=cfg, init_params=params,
        epochs=1, sample_every=10, img_size=RES,
        ckpt_dir=str(tmp_path / "empty"), run_name="fresh0", save_every=10,
        save_last=False, override_lr=0.0,
    )
    out = capsys.readouterr().out
    assert "WARNING: resume-time overrides requested" in out
    assert "base_lr: 1.00e-03" in out  # override cleared, config LR kept


def test_resume_adopts_checkpoint_optimizer_layout(setup, tmp_path, capsys):
    """A checkpoint written under the per-leaf tree optimizer (round-1 meta:
    no flat_optimizer key) must resume under a config whose default is the
    flat raveled layout — the loop reconciles from the meta sidecar instead
    of hitting an Orbax structure mismatch."""
    model, sched, params = setup
    cfg_tree = TrainConfig(base_lr=1e-3, warmup_steps=2, flat_optimizer=False,
                           dropout_rng_impl="threefry")
    rng = np.random.default_rng(0)
    data = [rng.normal(size=(4, RES, RES, 3)).astype(np.float32) * 0.3
            for _ in range(2)]
    ckpt_dir = str(tmp_path / "ck")
    # legacy meta: strip the r2 knobs, as a round-1 run would have written
    legacy_tc = {k: v for k, v in cfg_tree.to_dict().items()
                 if k not in ("flat_optimizer", "dropout_rng_impl")}
    train_ddpm(
        model, sched, data, train_config=cfg_tree, init_params=params,
        epochs=1, sample_every=10, img_size=RES,
        ckpt_dir=ckpt_dir, run_name="r1", save_every=10,
        configs_for_ckpt={"train": legacy_tc},
    )
    capsys.readouterr()

    cfg_flat = TrainConfig(base_lr=1e-3, warmup_steps=2)  # default: flat
    assert cfg_flat.flat_optimizer
    state, _ = train_ddpm(
        model, sched, data, train_config=cfg_flat, init_params=params,
        epochs=2, sample_every=10, img_size=RES,
        ckpt_dir=ckpt_dir, run_name="r1b", save_every=10, save_last=False,
        resume_path=os.path.join(ckpt_dir, "r1_last"),
    )
    out = capsys.readouterr().out
    assert "adopting checkpoint optimizer layout: flat_optimizer=False" in out
    assert "[RESUME] loaded" in out
    assert int(state.step) == 4  # resumed at 2, one more epoch of 2 batches


def test_flat_step_tail_bit_exact(setup):
    """flat_step_tail=True (raveled EMA lerp + grad-norm metric) must match
    the tree version: EMA/params/opt-state bit-exact (the lerp is
    elementwise — raveling only reorders memory), grad_norm to fp
    reassociation."""
    model, sched, params = setup
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(4, RES, RES, 3)), jnp.float32)
    outs = {}
    for flat in (False, True):
        cfg = TrainConfig(base_lr=1e-3, warmup_steps=2, flat_step_tail=flat)
        tx = make_optimizer(cfg)
        state, _ = init_train_state(params, cfg, tx=tx)
        step = make_train_step(model, sched, tx, cfg)
        state, metrics = step(state, x)
        state, metrics = step(state, x)
        outs[flat] = (state, metrics)
    a, b = outs[False], outs[True]
    for field in ("params", "ema_params", "opt_state"):
        jax.tree.map(
            lambda u, v: np.testing.assert_array_equal(
                np.asarray(u), np.asarray(v)),
            getattr(a[0], field), getattr(b[0], field))
    assert float(a[1]["grad_norm"]) == pytest.approx(
        float(b[1]["grad_norm"]), rel=1e-5)
    # pre-knob checkpoint metas resolve to the (default) tree tail
    legacy = {k: v for k, v in TrainConfig().to_dict().items()
              if k != "flat_step_tail"}
    assert TrainConfig.from_dict(legacy, legacy=True).flat_step_tail is False
    assert TrainConfig.from_dict(legacy).flat_step_tail is False
