"""Regression tests for the round-1 self-review findings."""

import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.data import (
    ArrayDataset,
    DataLoader,
    ImageFolderDataset,
    ensure_extracted,
    make_celeba_transform,
)


class _ExplodingDataset:
    def __len__(self):
        return 16

    def __getitem__(self, i):
        if i >= 4:
            raise ValueError("boom at index %d" % i)
        return np.zeros((4, 4, 3), np.float32), 0


def test_loader_propagates_dataset_exception():
    """A dataset error must surface in the consuming thread, not hang."""
    dl = DataLoader(_ExplodingDataset(), 8, shuffle=False, num_workers=2)
    with pytest.raises(ValueError, match="boom"):
        for _ in dl:
            pass


def test_reset_optimizer_keeps_warmup_at_global_step():
    """reset_optimizer_state must not re-ramp the LR from zero — the
    reference drives warmup off global_step."""
    import optax

    from ddpm_diffusion_model_tpu.training import (
        TrainConfig,
        apply_resume_overrides,
        init_train_state,
        make_optimizer,
    )

    cfg = TrainConfig(base_lr=1e-3, warmup_steps=100)
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    state, _ = init_train_state(params, cfg, tx=tx)
    # pretend we're at global step 5000 with a loaded opt state
    state = state.replace(step=jnp.asarray(5000, jnp.int32))
    template, _ = init_train_state(params, cfg, tx=tx)
    out = apply_resume_overrides(state, template, reset_optimizer_state=True)

    # moments fresh (Adam count back to 0), schedule count fast-forwarded
    flat = jax.tree.leaves(
        out.opt_state,
        is_leaf=lambda n: isinstance(
            n, (optax.ScaleByAdamState, optax.ScaleByScheduleState)
        ),
    )
    sched_counts = [
        int(n.count) for n in flat if isinstance(n, optax.ScaleByScheduleState)
    ]
    adam_counts = [
        int(n.count) for n in flat if isinstance(n, optax.ScaleByAdamState)
    ]
    assert sched_counts and all(c == 5000 for c in sched_counts)
    assert adam_counts and all(c == 0 for c in adam_counts)

    # and one update applies ~full LR, not base_lr/100
    grads = {"w": jnp.ones((4,))}
    updates, _ = tx.update(grads, out.opt_state, out.params)
    # adam update magnitude == lr after warmup (bias-corrected |g/sqrt(v)| = 1)
    np.testing.assert_allclose(
        float(jnp.abs(updates["w"][0])), 1e-3, rtol=0.05
    )


def test_cli_epochs_zero_honored(tmp_path, capsys):
    from ddpm_diffusion_model_tpu.cli import main
    from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig, get_preset

    tiny = ExperimentConfig(
        model=get_preset("celeba64_low").model.__class__(
            base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
            attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
            img_resolution=8,
        ),
        diffusion=get_preset("celeba64_low").diffusion.__class__(T=10, img_size=8),
        train=get_preset("celeba64_low").train.__class__(warmup_steps=None),
        run_name="zeroep", img_size=8, batch_size=4, epochs=3,
        sample_every=10, save_every=10,
    )
    cfg_path = str(tmp_path / "e.json")
    with open(cfg_path, "w") as f:
        f.write(tiny.to_json())
    import json

    main(["train", "--config", cfg_path, "--data", "synthetic",
          "--synthetic-size", "8", "--epochs", "0",
          "--ckpt-dir", str(tmp_path / "ck"), "--no-samples"])
    out = capsys.readouterr().out
    payload = json.loads(out.strip().splitlines()[-1])
    assert payload["final_loss"] is None  # zero epochs -> no training


def test_ensure_extracted_retries_partial(tmp_path):
    from PIL import Image

    zp = str(tmp_path / "z.zip")
    src_img = np.zeros((8, 8, 3), np.uint8)
    p1 = str(tmp_path / "a.jpg")
    Image.fromarray(src_img).save(p1)
    with zipfile.ZipFile(zp, "w") as zf:
        zf.write(p1, "a.jpg")
        zf.write(p1, "b.jpg")

    ex = str(tmp_path / "ex")
    os.makedirs(ex)
    # simulate interrupted extraction: one file present, NO sentinel
    Image.fromarray(src_img).save(os.path.join(ex, "a.jpg"))
    ensure_extracted(zp, ex)
    assert os.path.exists(os.path.join(ex, "b.jpg"))  # re-extracted
    assert os.path.exists(os.path.join(ex, ".extraction_complete"))

    # with sentinel present, extraction is skipped (b removed stays removed)
    os.remove(os.path.join(ex, "b.jpg"))
    ensure_extracted(zp, ex)
    assert not os.path.exists(os.path.join(ex, "b.jpg"))


def test_native_path_requires_matching_transform(tmp_path):
    from PIL import Image

    root = tmp_path / "imgs"
    os.makedirs(root)
    Image.fromarray(np.zeros((200, 200, 3), np.uint8)).save(root / "x.jpg")

    # custom transform without the chain marker -> native must stay off
    custom = lambda img: np.full((16, 16, 3), 0.25, np.float32)
    ds = ImageFolderDataset(str(root), custom, img_size=16, crop=178)
    assert not ds._native
    x, _ = ds[0]
    np.testing.assert_allclose(x, 0.25)

    # mismatched chain (different crop) -> native off
    t = make_celeba_transform(16, crop=100)
    ds2 = ImageFolderDataset(str(root), t, img_size=16, crop=178)
    assert not ds2._native


def test_dataset_paths_slice_confines_corrupt_fallback(tmp_path):
    from PIL import Image

    root = tmp_path / "imgs"
    os.makedirs(root)
    for i in range(4):
        Image.fromarray(
            np.full((200, 200, 3), i * 60, np.uint8)
        ).save(root / f"{i}.png")
    # corrupt file that sorts LAST in the slice
    with open(root / "2z_broken.png", "wb") as f:
        f.write(b"junk")

    t = make_celeba_transform(8, crop=178)
    # slice = [2.png, 2z_broken.png]; fallback from broken must wrap to
    # 2.png (inside slice), never 3.png (outside)
    ds = ImageFolderDataset(
        str(root), t, on_corrupt="next", img_size=8, crop=178,
        paths=[str(root / "2.png"), str(root / "2z_broken.png")],
    )
    x_ok, _ = ds[0]
    x_fb, _ = ds[1]
    np.testing.assert_allclose(x_fb, x_ok)


def test_t_cosine_ladder_point_count():
    from ddpm_diffusion_model_tpu.sampling import build_ddim_schedule

    cos = build_ddim_schedule("cosine", 20, 1000)     # training: steps+1 pts
    tcos = build_ddim_schedule("t_cosine", 20, 1000)  # strip: steps pts
    assert len(tcos) <= len(cos)
    assert tcos[0] == 999 and tcos[-1] == 0


def test_ensure_extracted_adopts_when_zip_gone(tmp_path):
    """Upgrade path: images extracted by an older version (no sentinel) and
    the zip deleted — adopt the existing extraction instead of crashing."""
    from PIL import Image

    ex = str(tmp_path / "ex2")
    os.makedirs(ex)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(os.path.join(ex, "a.jpg"))
    out = ensure_extracted(str(tmp_path / "missing.zip"), ex)
    assert out == ex
    assert os.path.exists(os.path.join(ex, ".extraction_complete"))
    # truly empty dir + missing zip still errors
    with pytest.raises(FileNotFoundError):
        ensure_extracted(str(tmp_path / "missing.zip"), str(tmp_path / "empty"))


def test_empty_split_slices_allowed(tmp_path):
    """get_celeba_loaders-style empty valid/test splits must not crash."""
    from PIL import Image

    root = tmp_path / "imgs2"
    os.makedirs(root)
    for i in range(3):
        Image.fromarray(np.zeros((200, 200, 3), np.uint8)).save(root / f"{i}.png")
    t = make_celeba_transform(8, crop=178)
    empty = ImageFolderDataset(str(root), t, img_size=8, crop=178, paths=[])
    assert len(empty) == 0
    dl = DataLoader(empty, 4, shuffle=False, drop_last=False, num_workers=1)
    assert list(dl) == []
    # implicit (walk) empty root still raises
    with pytest.raises(FileNotFoundError):
        ImageFolderDataset(str(tmp_path / "nothing"), t)


def test_serving_buckets_bound_compiles():
    from ddpm_diffusion_model_tpu.serving import SamplerService

    assert SamplerService.STEP_CHOICES[0] == 1
    # snapping: 47 -> 50, 3 -> 2, 700 -> 1000 (nearest)
    pick = lambda s: min(SamplerService.STEP_CHOICES, key=lambda c: abs(c - s))
    assert pick(47) == 50 and pick(3) == 2 and pick(800) == 1000


# ---------------------------------------------------------------------------
# round-3 review sweep (CFG / labeled-cache / serving-guidance findings)
# ---------------------------------------------------------------------------


def _tiny_service(num_classes=0):
    from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.serving import SamplerService

    cfg = UNetConfig(
        base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
        attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
        img_resolution=8, num_classes=num_classes,
    )
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    sched = make_schedule(DiffusionConfig(T=20, img_size=8))
    params = model.init(jax.random.key(0), jnp.ones((1, 8, 8, 3)),
                        jnp.zeros((1,)))
    return SamplerService(model, params, sched, 8)


def test_serving_guidance_snapped_to_bounded_grid():
    """guidance is a compile-time constant AND a coalescer queue key: every
    accepted value must land on the bounded 0.25 grid, so adversarial query
    strings cannot mint unbounded XLA recompiles or queue entries."""
    svc = _tiny_service(num_classes=3)
    _, used = svc.sample(n=1, steps=2, class_id=1, guidance=2.9999)
    assert used["guidance"] == 3.0
    _, used = svc.sample(n=1, steps=2, class_id=1, guidance=99.0)
    assert used["guidance"] == svc.MAX_GUIDANCE  # clamped
    # 1.0 maps to itself: unconditional requests never pay the CFG forward
    assert round(1.0 / svc.GUIDANCE_STEP) * svc.GUIDANCE_STEP == 1.0
    with pytest.raises(ValueError, match="finite"):
        svc.sample(n=1, steps=2, guidance=float("nan"))


def test_serving_bad_schedule_is_valueerror_any_eta():
    """A bogus schedule kind must raise the SAME error class whether the
    request coalesces (eta=0) or goes direct (eta>0) — upfront validation,
    not a RuntimeError from inside the coalescer worker."""
    svc = _tiny_service()
    for eta in (0.0, 0.5):
        with pytest.raises(ValueError, match="schedule"):
            svc.sample(n=1, steps=2, eta=eta, schedule_kind="bogus")


def test_device_cache_harvests_any_labeled_dataset():
    """Tuple-yielding datasets WITHOUT a num_classes attribute (e.g.
    ArrayDataset(arr, labels)) must keep their labels in the cache."""
    from ddpm_diffusion_model_tpu.data import DeviceCacheLoader

    arr = np.random.default_rng(0).normal(size=(12, 4, 4, 3)).astype(np.float32)
    labels = (np.arange(12, dtype=np.int32) * 7) % 3  # NOT i % k
    dl = DeviceCacheLoader(ArrayDataset(arr, labels), 4, shuffle=False)
    got = np.concatenate([np.asarray(y) for _, y in dl])
    np.testing.assert_array_equal(got, labels)


def test_device_prefetch_reshards_device_resident_labels():
    """device_prefetch must honor an explicit label_sharding even when the
    labels are already jax.Arrays (single-device cache feeding a mesh run)."""
    from ddpm_diffusion_model_tpu.data.loader import device_prefetch
    from ddpm_diffusion_model_tpu.parallel import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()
    lsh = NamedSharding(mesh, P("data"))
    x = np.zeros((8, 4, 4, 3), np.float32)
    y_dev = jax.device_put(np.arange(8, dtype=np.int32),
                           jax.devices()[0])  # committed single-device
    out = list(device_prefetch(iter([(x, y_dev)]), size=1,
                               put_labels=True, label_sharding=lsh))
    assert len(out) == 1
    _, y = out[0]
    assert y.sharding.is_equivalent_to(lsh, y.ndim)


def test_cli_conditional_device_cache_eval_loader_is_labeled(tmp_path):
    """--data blobs --device-cache with a conditional model + eval: the val
    loader must yield (x, y) pairs (the eval pass feeds labels through the
    loss), and the train cache must carry the dataset's own labels."""
    import argparse
    import dataclasses

    from ddpm_diffusion_model_tpu.cli import _make_loader
    from ddpm_diffusion_model_tpu.utils.config import get_preset

    exp = get_preset("celeba64_low")
    exp = dataclasses.replace(
        exp, img_size=8, batch_size=4,
        model=dataclasses.replace(exp.model, num_classes=4,
                                  img_resolution=8))
    args = argparse.Namespace(
        data="blobs", synthetic_size=16, preload=False, device_cache=True,
        device_cache_sharded=False, eval_size=8)
    train, val = _make_loader(args, exp, with_eval=True)
    xb, yb = next(iter(train))
    assert yb is not None and int(np.asarray(yb).max()) < 4
    assert val is not None
    xv, yv = next(iter(val))
    assert yv is not None and yv.shape[0] == xv.shape[0]
