"""Class-conditional models + classifier-free guidance (CFG).

Beyond-reference: the reference is unconditional-only (its UNet forward is
``unet_backbone.py:161-218``, no label path).  Contracts under test:

- ``num_classes == 0`` param trees are UNCHANGED (checkpoint compat) and
  reject labels;
- on a conditional model ``y=None`` IS the NULL token (unconditional
  sampling needs no special-casing);
- ``cfg_eps_fn`` is exactly ``e_u + w * (e_c - e_u)`` against two manual
  forwards, and ``guidance=1`` is a single conditional forward;
- the loss's label dropout hits the NULL token at rate ``cond_dropout``
  (extremes pinned exactly); unconditional RNG draws stay bit-identical to
  the pre-conditional split (resume/repro compat);
- labeled batches flow end to end: train step (incl. grad-accum microbatch
  splitting), train_one_epoch, evaluate_loss, DP mesh, samplers, CLI wiring;
- the labeled blob-faces source makes the label a visible attribute
  (class-hued background), so conditioning is falsifiable by pixels.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.data import ArrayDataset, BlobFacesDataset, DataLoader
from ddpm_diffusion_model_tpu.models import (
    DiTConfig,
    DiTDenoiser,
    UNetConfig,
    UNetDenoiser,
)
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.sampling import ddim_infer_sample
from ddpm_diffusion_model_tpu.sampling.inference import cfg_eps_fn
from ddpm_diffusion_model_tpu.training import (
    TrainConfig,
    evaluate_loss,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    train_one_epoch,
)
from ddpm_diffusion_model_tpu.training.step import make_loss_fn

K = jax.random.key

# base 64, NOT 16: group_norm uses min(32, C) groups, so C=16 degenerates
# to per-channel instance norm, which exactly cancels the constant
# (time+class)-bias over (H, W) — 64 channels keep 2 channels/group and the
# conditioning signal measurably alive at init
UNET_KW = dict(in_channels=3, base_channels=64, channel_mults=(1, 2),
               num_res_blocks=1, attn_resolutions=(8,), time_embed_dim=32,
               dropout=0.0, num_heads=2, head_dim=8, img_resolution=16)
NC = 4


def _unet(num_classes=NC):
    model = UNetDenoiser(UNetConfig(**UNET_KW, num_classes=num_classes),
                         dtype=jnp.float32)
    params = model.init(K(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)))
    return model, params


def _dit(num_classes=NC):
    cfg = DiTConfig(img_resolution=16, patch_size=4, hidden_size=32,
                    depth=2, num_heads=2, time_embed_dim=16,
                    num_classes=num_classes)
    model = DiTDenoiser(cfg, dtype=jnp.float32)
    params = model.init(K(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)))
    return model, params


# ---------- model-level contracts ----------

def test_unconditional_tree_unchanged_and_rejects_labels():
    for build in (_unet, _dit):
        model, params = build(num_classes=0)
        flat = jax.tree_util.tree_leaves_with_path(params)
        assert not any("class_emb" in jax.tree_util.keystr(p)
                       for p, _ in flat)
        with pytest.raises(ValueError, match="unconditional"):
            model.apply(params, jnp.zeros((2, 16, 16, 3)), jnp.zeros((2,)),
                        y=jnp.zeros((2,), jnp.int32))


def _perturb(params, scale=0.05):
    """Break zero-inits (adaLN-Zero gates/head) so label effects are visible
    at 'init' — a deterministic keyed jiggle of every leaf."""
    leaves, treedef = jax.tree.flatten(params)
    out = [l + scale * jax.random.normal(K(1000 + i), l.shape, l.dtype)
           if jnp.issubdtype(l.dtype, jnp.floating) else l
           for i, l in enumerate(leaves)]
    return jax.tree.unflatten(treedef, out)


def test_conditional_adds_null_row_and_defaults_to_it():
    for build in (_unet, _dit):
        model, params = build()
        emb = [v for p, v in jax.tree_util.tree_leaves_with_path(params)
               if "class_emb" in jax.tree_util.keystr(p)]
        assert len(emb) == 1 and emb[0].shape[0] == NC + 1
        # DiT is adaLN-Zero (output identically 0 at init): perturb the
        # zero-init gates/head so the class signal can reach the output
        params = _perturb(params)
        x = jax.random.normal(K(1), (3, 16, 16, 3))
        t = jnp.array([5.0, 50.0, 90.0])
        a = model.apply(params, x, t)  # y=None -> NULL token
        b = model.apply(params, x, t, y=jnp.full((3,), NC, jnp.int32))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # a real class changes the output
        c = model.apply(params, x, t, y=jnp.zeros((3,), jnp.int32))
        assert np.abs(np.asarray(c) - np.asarray(a)).max() > 1e-5


def test_cfg_eps_fn_formula_and_identity():
    model, params = _unet()
    x = jax.random.normal(K(2), (4, 16, 16, 3))
    t = jnp.full((4,), 37.0)
    y = jnp.array([0, 1, 2, 3], jnp.int32)
    e_c = np.asarray(model.apply(params, x, t, y=y), np.float32)
    e_u = np.asarray(model.apply(params, x, t), np.float32)
    for w in (0.0, 2.5):
        got = np.asarray(cfg_eps_fn(model, params, y, w)(x, t), np.float32)
        np.testing.assert_allclose(got, e_u + w * (e_c - e_u),
                                   rtol=1e-5, atol=1e-6)
    # w=1 short-circuits to ONE conditional forward — exact equality
    np.testing.assert_array_equal(
        np.asarray(cfg_eps_fn(model, params, y, 1.0)(x, t)), e_c)
    # unconditional model refuses labels
    model0, params0 = _unet(num_classes=0)
    with pytest.raises(ValueError, match="conditional"):
        cfg_eps_fn(model0, params0, y, 2.0)


# ---------- training ----------

def test_loss_label_dropout_extremes():
    model, params = _unet()
    sched = make_schedule(DiffusionConfig(T=50, img_size=16))
    x = jax.random.normal(K(3), (8, 16, 16, 3))
    y = jnp.arange(8, dtype=jnp.int32) % NC
    key = K(9)
    # cond_dropout=1: every label is the NULL token
    l_all = float(make_loss_fn(model, sched, cond_dropout=1.0)(
        params, (x, y), key))
    l_null = float(make_loss_fn(model, sched, cond_dropout=1.0)(
        params, (x, jnp.full((8,), 0, jnp.int32)), key))
    assert l_all == l_null  # labels fully ignored
    # cond_dropout=0: labels pass through untouched -> different classes
    # give a different loss than all-NULL
    l_real = float(make_loss_fn(model, sched, cond_dropout=0.0)(
        params, (x, y), key))
    assert l_real != l_all


def test_unconditional_rng_stream_unchanged():
    """The conditional feature must not shift unconditional (t, noise, mask)
    draws: loss_fn splits the key 3 ways exactly as before (resume/repro
    compatibility with pre-conditional checkpoints)."""
    model, params = _unet(num_classes=0)
    sched = make_schedule(DiffusionConfig(T=50, img_size=16))
    x = jax.random.normal(K(4), (4, 16, 16, 3))
    key = K(7)
    kt, kn, _kd = jax.random.split(key, 3)
    from ddpm_diffusion_model_tpu.ops import loss_simple, sample_timesteps

    t = sample_timesteps(kt, 4, sched.T)
    noise = jax.random.normal(kn, x.shape, dtype=jnp.float32)
    manual = float(loss_simple(
        sched, lambda xt, tt: model.apply(params, xt, tt), x, t, noise))
    got = float(make_loss_fn(model, sched)(params, x, key))
    assert got == pytest.approx(manual, rel=1e-6)


def test_conditional_needs_labeled_batch():
    model, _params = _unet()
    sched = make_schedule(DiffusionConfig(T=50, img_size=16))
    with pytest.raises(ValueError, match="labeled"):
        make_loss_fn(model, sched)(_params, jnp.zeros((2, 16, 16, 3)), K(0))


def test_train_step_conditional_with_accum():
    model, params = _unet()
    sched = make_schedule(DiffusionConfig(T=50, img_size=16))
    tcfg = TrainConfig(base_lr=1e-3, warmup_steps=5, grad_accum_steps=2,
                       cond_dropout=0.1)
    tx = make_optimizer(tcfg)
    state, _ = init_train_state(params, tcfg, tx=tx)
    step = make_train_step(model, sched, tx, tcfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 16, 16, 3)),
                    jnp.float32)
    y = jnp.arange(8, dtype=jnp.int32) % NC
    state, metrics = step(state, (x, y))
    assert np.isfinite(float(metrics["loss"])) and int(state.step) == 1


def test_eval_step_uses_real_labels():
    model, params = _unet()
    # amplify the embedding so the two classes' losses differ well above
    # fp32 mean-reduction noise (the init-scale effect is ~1e-6 in eps-hat)
    params["params"]["class_emb"]["embedding"] = 20.0 * jax.random.normal(
        K(11), params["params"]["class_emb"]["embedding"].shape)
    sched = make_schedule(DiffusionConfig(T=50, img_size=16))
    ev = make_eval_step(model, sched)
    x = jax.random.normal(K(5), (4, 16, 16, 3))
    a = float(ev(params, (x, jnp.zeros((4,), jnp.int32)), K(1)))
    b = float(ev(params, (x, jnp.full((4,), 2, jnp.int32)), K(1)))
    assert np.isfinite(a) and a != b  # label reaches the forward


# ---------- labeled data ----------

def test_labeled_blob_faces():
    ds = BlobFacesDataset(8, img_size=16, seed=0, num_classes=NC)
    imgs, labels = zip(*(ds[i] for i in range(8)))
    assert list(labels) == [0, 1, 2, 3, 0, 1, 2, 3]
    # determinism
    np.testing.assert_array_equal(imgs[0], ds[0][0])
    # the label is a VISIBLE attribute: same-class top rows are closer in
    # mean color than cross-class ones
    top = np.stack([im[:2].mean(axis=(0, 1)) for im in imgs])  # (8, 3)
    same = np.linalg.norm(top[0] - top[4])
    cross = min(np.linalg.norm(top[0] - top[k]) for k in (1, 2, 3))
    assert same < cross


def test_labeled_epoch_and_eval_end_to_end():
    model, params = _unet()
    sched = make_schedule(DiffusionConfig(T=50, img_size=16))
    tcfg = TrainConfig(base_lr=1e-3, warmup_steps=2, grad_accum_steps=1)
    tx = make_optimizer(tcfg)
    state, _ = init_train_state(params, tcfg, tx=tx)
    step = make_train_step(model, sched, tx, tcfg)
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(16, 16, 16, 3)).astype(np.float32) * 0.5
    loader = DataLoader(ArrayDataset(arr, np.arange(16) % NC), 8,
                        seed=0, shuffle=True)
    state, avg_loss, n_batches, n_images = train_one_epoch(
        step, state, loader, labeled=True)
    assert (n_batches, n_images) == (2, 16) and np.isfinite(avg_loss)
    val = evaluate_loss(make_eval_step(model, sched), state.params, loader,
                        labeled=True)
    assert np.isfinite(val)
    # a bare-array loader on a conditional model fails loudly, not silently
    bare = DataLoader(ArrayDataset(arr), 8, seed=0)

    class _Unlabeled:
        def __iter__(self):
            for x, _y in bare:
                yield x

    with pytest.raises(ValueError, match="labels"):
        train_one_epoch(step, state, _Unlabeled(), labeled=True)


def test_labeled_dp_mesh_equality():
    """Conditional train step under a DP mesh == single-device numerics."""
    from ddpm_diffusion_model_tpu.parallel import (
        batch_sharding, make_mesh, place_state)
    from jax.sharding import NamedSharding, PartitionSpec

    model, params = _unet()
    sched = make_schedule(DiffusionConfig(T=50, img_size=16))
    tcfg = TrainConfig(base_lr=1e-3, warmup_steps=2, cond_dropout=0.1)
    tx = make_optimizer(tcfg)
    step = make_train_step(model, sched, tx, tcfg)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 16, 16, 3)),
                    jnp.float32)
    y = jnp.arange(8, dtype=jnp.int32) % NC

    state1, _ = init_train_state(params, tcfg, tx=tx)
    _s1, m1 = step(state1, (x, y))

    mesh = make_mesh()
    state2, _ = init_train_state(params, tcfg, tx=tx)
    state2 = place_state(state2, mesh)
    xd = jax.device_put(x, batch_sharding(mesh))
    yd = jax.device_put(y, NamedSharding(mesh, PartitionSpec("data")))
    _s2, m2 = step(state2, (xd, yd))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)


# ---------- sampling ----------

def test_cfg_sampling_grid_and_class_separation(tmp_path):
    """DDIM grids for two classes from an UNTRAINED-but-initialized model
    differ (the label reaches the sampler); guidance kicks the CFG path."""
    model, params = _unet()
    sched = make_schedule(DiffusionConfig(T=50, img_size=16))
    a = ddim_infer_sample(model, params, sched, n=4, img_size=16, steps=4,
                          out_path=str(tmp_path / "a.png"), class_id=0,
                          guidance=2.0, seed=3)
    b = ddim_infer_sample(model, params, sched, n=4, img_size=16, steps=4,
                          out_path=str(tmp_path / "b.png"), class_id=1,
                          guidance=2.0, seed=3)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 0
    # per-sample label vector ('all' in the CLI)
    c = ddim_infer_sample(model, params, sched, n=4, img_size=16, steps=4,
                          out_path=str(tmp_path / "c.png"),
                          class_id=np.arange(4) % NC, guidance=1.0, seed=3)
    assert np.isfinite(c).all()
    with pytest.raises(ValueError, match="shape"):
        ddim_infer_sample(model, params, sched, n=4, img_size=16, steps=4,
                          out_path=str(tmp_path / "d.png"),
                          class_id=np.zeros(3, np.int32), seed=3)


def test_pipelined_dit_label_parity():
    """Conditional DiT through the GPipe pipeline == plain forward."""
    from ddpm_diffusion_model_tpu.parallel import dit_apply_pipelined, make_mesh

    model, params = _dit()  # depth 2 -> 2 pipeline stages
    mesh = make_mesh((2,), ("pp",), devices=jax.devices()[:2])
    x = jax.random.normal(K(6), (4, 16, 16, 3))
    t = jnp.full((4,), 11.0)
    y = jnp.array([0, 1, 2, 3], jnp.int32)
    ref = model.apply(params, x, t, y=y)
    got = dit_apply_pipelined(model, params, x, t, mesh, y=y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and y=None still matches (NULL token on both paths)
    np.testing.assert_allclose(
        np.asarray(dit_apply_pipelined(model, params, x, t, mesh)),
        np.asarray(model.apply(params, x, t)), rtol=1e-5, atol=1e-5)


# ---------- config compat ----------

def test_config_roundtrip_and_legacy():
    u = UNetConfig(**UNET_KW, num_classes=5)
    assert UNetConfig.from_dict(u.to_dict()) == u
    legacy = {k: v for k, v in u.to_dict().items() if k != "num_classes"}
    assert UNetConfig.from_dict(legacy).num_classes == 0
    d = DiTConfig(num_classes=7)
    assert DiTConfig.from_dict(d.to_dict()).num_classes == 7
    legacy_d = {k: v for k, v in d.to_dict().items() if k != "num_classes"}
    assert DiTConfig.from_dict(legacy_d).num_classes == 0
    tc = {k: v for k, v in TrainConfig().to_dict().items()
          if k != "cond_dropout"}
    assert TrainConfig.from_dict(tc, legacy=True).cond_dropout == 0.1


def test_sharded_cfg_matches_single_device():
    """CFG sampling sharded over the 8-device mesh == the single-device
    CFG kernel (CFG is per-sample: zero extra collectives)."""
    from ddpm_diffusion_model_tpu.parallel import make_mesh
    from ddpm_diffusion_model_tpu.sampling import sample_grid_sharded
    from ddpm_diffusion_model_tpu.sampling.inference import _ddim_jit
    from ddpm_diffusion_model_tpu.sampling.loops import to_unit_interval
    from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule

    model, params = _unet()
    sched = make_schedule(DiffusionConfig(T=50, img_size=16))
    mesh = make_mesh()
    y = np.arange(8, dtype=np.int32) % NC
    x_sharded = sample_grid_sharded(
        model, params, sched, mesh, kind="ddim", n=8, img_size=16,
        seed=5, steps=4, class_id=y, guidance=2.0)
    ts = tuple(int(t) for t in build_ddim_schedule("t_linear", 4, 50))
    x_single, _ = _ddim_jit(
        model, params, sched, jax.random.key(5), (8, 16, 16, 3),
        ts, 0.0, None, y=jnp.asarray(y), guidance=2.0)
    np.testing.assert_allclose(
        x_sharded, np.asarray(to_unit_interval(x_single)), atol=2e-5)
