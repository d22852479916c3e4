"""Preemption-safe training (training/preemption.py): SIGTERM mid-epoch
stops at a batch boundary, saves <run>_preempt, skips _last; a relaunch with
resume_path="auto" finds it and finishes the run with the step clock intact."""

import json
import os
import signal

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.training import (
    PreemptionFlag,
    TrainConfig,
    catch_preemption,
    find_latest_checkpoint,
    train_ddpm,
)

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
    params = model.init(jax.random.key(0), jnp.ones((1, RES, RES, 3)),
                        jnp.zeros((1,)))
    return model, sched, params


def test_catch_preemption_trips_and_restores():
    before = signal.getsignal(signal.SIGTERM)
    with catch_preemption() as flag:
        assert not flag
        os.kill(os.getpid(), signal.SIGTERM)
        # CPython delivers the signal at the next bytecode boundary
        for _ in range(1000):
            if flag:
                break
        assert flag and flag.signum == signal.SIGTERM
    assert signal.getsignal(signal.SIGTERM) is before


def test_preemption_flag_manual():
    flag = PreemptionFlag()
    assert not flag
    flag()
    assert flag and flag.signum is None


class _SignalingLoader:
    """Yields batches forever-ish; sends SIGTERM to our own process once,
    on the 2nd batch of the first pass (later passes are signal-free)."""

    def __init__(self, n_batches=6):
        self.n_batches = n_batches
        self.fired = False

    def __iter__(self):
        rng = np.random.default_rng(0)
        for i in range(self.n_batches):
            if i == 2 and not self.fired:
                self.fired = True
                os.kill(os.getpid(), signal.SIGTERM)
            yield rng.normal(size=(4, RES, RES, 3)).astype(np.float32) * 0.3


def test_train_preempt_then_auto_resume(setup, tmp_path, capsys):
    model, sched, params = setup
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=5, grad_accum_steps=1)
    ckpt_dir = str(tmp_path / "ck")
    loader = _SignalingLoader()

    state, summary = train_ddpm(
        model, sched, loader, train_config=cfg, init_params=params,
        epochs=3, sample_every=10, img_size=RES, ckpt_dir=ckpt_dir,
        run_name="pre", save_every=10,
    )
    out = capsys.readouterr().out
    assert summary["preempted"] is True
    assert "[PREEMPT]" in out
    steps_done = int(jax.device_get(state.step))
    # stopped at a batch boundary inside epoch 0 (how many steps got
    # dispatched before the flag check races with the prefetch thread —
    # any count short of the full 3-epoch run is a valid stop point)
    assert 0 <= steps_done < 18
    preempt = os.path.join(ckpt_dir, "pre_preempt")
    assert os.path.isdir(preempt)
    assert not os.path.exists(os.path.join(ckpt_dir, "pre_last"))
    with open(os.path.join(preempt, "meta.json")) as f:
        meta = json.load(f)
    assert meta["epoch"] == -1  # interrupted epoch 0 must be redone
    assert meta["global_step"] == steps_done

    # relaunch: auto-resume finds the preempt save, redoes epoch 0, finishes
    state2, summary2 = train_ddpm(
        model, sched, loader, train_config=cfg, init_params=params,
        epochs=3, sample_every=10, img_size=RES, ckpt_dir=ckpt_dir,
        run_name="pre", save_every=10, resume_path="auto",
    )
    out2 = capsys.readouterr().out
    assert "[RESUME] auto ->" in out2 and "pre_preempt" in out2
    assert "preempted" not in summary2
    assert len(summary2["epochs"]) == 3  # epochs 0..2 all ran
    assert int(jax.device_get(state2.step)) == steps_done + 18
    assert os.path.isdir(os.path.join(ckpt_dir, "pre_last"))


def test_cooperative_flag_after_complete_epoch(setup, tmp_path, capsys):
    """An external PreemptionFlag tripped in the epoch-end sampling hook:
    the epoch is complete, so the preempt save records it as done and
    auto-resume continues at the NEXT epoch (no redo)."""
    model, sched, params = setup
    cfg = TrainConfig(base_lr=1e-3, warmup_steps=5, grad_accum_steps=1)
    ckpt_dir = str(tmp_path / "ck")
    rng = np.random.default_rng(0)
    data = [rng.normal(size=(4, RES, RES, 3)).astype(np.float32) * 0.3
            for _ in range(3)]
    flag = PreemptionFlag()

    def tripping_sample_fn(model_, params_, sched_, *, n, img_size,
                           save_path, seed):
        flag()  # cooperative stop requested during the epoch-0 hook

    state, summary = train_ddpm(
        model, sched, data, train_config=cfg, init_params=params,
        epochs=3, sample_every=1, img_size=RES, ckpt_dir=ckpt_dir,
        run_name="coop", save_every=10, sample_fn=tripping_sample_fn,
        handle_preemption=flag,
    )
    assert summary["preempted"] is True
    assert int(jax.device_get(state.step)) == 3  # exactly epoch 0
    with open(os.path.join(ckpt_dir, "coop_preempt", "meta.json")) as f:
        meta = json.load(f)
    assert meta["epoch"] == 0  # complete epoch: no redo
    capsys.readouterr()

    state2, summary2 = train_ddpm(
        model, sched, data, train_config=cfg, init_params=params,
        epochs=3, sample_every=10, img_size=RES, ckpt_dir=ckpt_dir,
        run_name="coop", save_every=10, resume_path="auto",
    )
    out2 = capsys.readouterr().out
    assert "start_epoch=1" in out2
    assert len(summary2["epochs"]) == 2  # epochs 1 and 2 only
    assert int(jax.device_get(state2.step)) == 9


def test_find_latest_checkpoint_picks_max_step(tmp_path):
    ckpt_dir = str(tmp_path)

    def fake(name, step, epoch):
        d = os.path.join(ckpt_dir, name)
        os.makedirs(d)
        with open(os.path.join(d, "meta.json"), "w") as f:
            json.dump({"global_step": step, "epoch": epoch}, f)

    assert find_latest_checkpoint(ckpt_dir, "r") is None
    fake("r_e000", 10, 0)
    fake("r_e001", 20, 1)
    fake("r_preempt", 25, 1)
    fake("other_e005", 99, 5)  # different run: ignored
    assert find_latest_checkpoint(ckpt_dir, "r").endswith("r_preempt")
    fake("r_last", 30, 2)
    assert find_latest_checkpoint(ckpt_dir, "r").endswith("r_last")
    # corrupt meta is skipped, not fatal
    os.makedirs(os.path.join(ckpt_dir, "r_e002"))
    with open(os.path.join(ckpt_dir, "r_e002", "meta.json"), "w") as f:
        f.write("{broken")
    assert find_latest_checkpoint(ckpt_dir, "r").endswith("r_last")


def test_read_meta_tolerance_modes(tmp_path):
    """read_meta: the single sidecar parser — None when missing/corrupt,
    strict=True propagates parse errors on a present-but-corrupt file."""
    import pytest

    from ddpm_diffusion_model_tpu.training.checkpoint import read_meta

    d = str(tmp_path / "ck")
    os.makedirs(d)
    assert read_meta(d) is None  # missing sidecar
    assert read_meta(d, strict=True) is None  # strict only hardens parsing
    with open(os.path.join(d, "meta.json"), "w") as f:
        f.write("{broken")
    assert read_meta(d) is None
    with pytest.raises(json.JSONDecodeError):
        read_meta(d, strict=True)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump({"epoch": 3}, f)
    assert read_meta(d) == {"epoch": 3}


def test_handle_preemption_off_leaves_handlers(setup, tmp_path):
    """handle_preemption=False must not touch the process signal table."""
    model, sched, params = setup
    before = signal.getsignal(signal.SIGTERM)
    sentinel = lambda s, f: None
    signal.signal(signal.SIGTERM, sentinel)
    try:
        cfg = TrainConfig(base_lr=1e-3, warmup_steps=5, grad_accum_steps=1)
        rng = np.random.default_rng(0)
        data = [rng.normal(size=(4, RES, RES, 3)).astype(np.float32) * 0.3]
        train_ddpm(
            model, sched, data, train_config=cfg, init_params=params,
            epochs=1, sample_every=10, img_size=RES,
            ckpt_dir=str(tmp_path), run_name="np", save_every=10,
            save_last=False, handle_preemption=False,
        )
        assert signal.getsignal(signal.SIGTERM) is sentinel
    finally:
        signal.signal(signal.SIGTERM, before)
