"""ExperimentConfig round-trips, presets, and the CLI (train on synthetic
data end-to-end, then sample from the checkpoint)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig, get_preset


def test_presets_exist_and_match_baseline_configs():
    low = get_preset("celeba64_low")
    assert low.model.base_channels == 96
    assert low.model.attn_resolutions == (8,)
    assert low.train.ema_decay == 0.9995
    assert low.batch_size == 32

    attn = get_preset("celeba64_attn")
    assert attn.model.base_channels == 128
    assert attn.model.attn_resolutions == (16, 8)
    assert attn.diffusion.dynamic_threshold == 0.95
    assert attn.batch_size == 128

    hq = get_preset("celebahq256")
    assert hq.model.channel_mults == (1, 1, 2, 2, 4)
    assert hq.model.attn_resolutions == (16,)
    assert hq.diffusion.dynamic_threshold == 0.995
    assert hq.train.grad_accum_steps == 8
    assert hq.remat is True


def test_config_json_roundtrip():
    exp = get_preset("celeba64_attn")
    s = exp.to_json()
    back = ExperimentConfig.from_json(s)
    assert back == exp


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        get_preset("nope")


def test_cli_info(capsys):
    from ddpm_diffusion_model_tpu.cli import main

    main(["info", "--preset", "celeba64_low"])
    out = capsys.readouterr().out
    cfg = json.loads(out)
    assert cfg["model"]["base_channels"] == 96


def test_cli_train_and_sample_roundtrip(tmp_path, capsys, monkeypatch):
    """Micro train run on synthetic data via the CLI API, then DDIM-sample
    from the produced checkpoint."""
    from ddpm_diffusion_model_tpu.cli import main
    from ddpm_diffusion_model_tpu.utils import config as cfgmod

    # shrink the preset so the test is fast
    tiny = ExperimentConfig(
        model=get_preset("celeba64_low").model.__class__(
            base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
            attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
            img_resolution=8,
        ),
        diffusion=get_preset("celeba64_low").diffusion.__class__(T=20, img_size=8),
        train=get_preset("celeba64_low").train.__class__(
            base_lr=1e-3, warmup_steps=2, grad_accum_steps=1
        ),
        run_name="clitest", img_size=8, batch_size=4, epochs=1,
        sample_every=10, save_every=1,
    )
    cfg_path = str(tmp_path / "exp.json")
    with open(cfg_path, "w") as f:
        f.write(tiny.to_json())

    ckpt_dir = str(tmp_path / "ck")
    main([
        "train", "--config", cfg_path, "--data", "synthetic",
        "--synthetic-size", "16", "--ckpt-dir", ckpt_dir, "--no-samples",
    ])
    out = capsys.readouterr().out
    assert "DDPM run: clitest" in out
    last = os.path.join(ckpt_dir, "clitest_last")
    assert os.path.isdir(last)

    png = str(tmp_path / "s.png")
    main([
        "sample-ddim", "--config", cfg_path, "--ckpt", last, "--n", "4",
        "--steps", "4", "--out", png, "--ema",
    ])
    assert os.path.exists(png)

    png2 = str(tmp_path / "s_dpmpp.png")
    main([
        "sample-dpmpp", "--config", cfg_path, "--ckpt", last, "--n", "4",
        "--steps", "5", "--out", png2, "--ema",
    ])
    assert os.path.exists(png2)

    # editing commands reuse the same checkpoint + a grid as the init image
    png3 = str(tmp_path / "i2i.png")
    main([
        "img2img", "--config", cfg_path, "--ckpt", last, "--init", png,
        "--n", "4", "--strength", "0.5", "--steps", "6", "--out", png3,
    ])
    out = capsys.readouterr().out
    assert "[IMG2IMG]" in out and os.path.exists(png3)

    png4 = str(tmp_path / "inp.png")
    main([
        "inpaint", "--config", cfg_path, "--ckpt", last, "--init", png,
        "--box", "2,2,6,6", "--n", "4", "--steps", "6", "--resamples", "2",
        "--out", png4,
    ])
    out = capsys.readouterr().out
    assert "[INPAINT]" in out and "generated=" in out
    assert os.path.exists(png4)

    with pytest.raises(SystemExit, match="exactly one"):
        main(["inpaint", "--config", cfg_path, "--ckpt", last,
              "--init", png, "--out", png4])


def test_cli_train_mesh_and_sharded_sampling(tmp_path, capsys):
    """`train --mesh dp` runs DP over the 8-device CPU mesh with the epoch
    sampling hook routed through the SPMD sharded sampler (n=8 divides the
    data axis), and `sample-ddim --sharded` samples the checkpoint SPMD."""
    from ddpm_diffusion_model_tpu.cli import main

    tiny = ExperimentConfig(
        model=get_preset("celeba64_low").model.__class__(
            base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
            attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
            img_resolution=8,
        ),
        diffusion=get_preset("celeba64_low").diffusion.__class__(T=20, img_size=8),
        train=get_preset("celeba64_low").train.__class__(
            base_lr=1e-3, warmup_steps=2, grad_accum_steps=1
        ),
        run_name="climesh", img_size=8, batch_size=8, epochs=1,
        sample_every=1, sample_n=8, save_every=1,
    )
    cfg_path = str(tmp_path / "exp.json")
    with open(cfg_path, "w") as f:
        f.write(tiny.to_json())

    ckpt_dir = str(tmp_path / "ck")
    main([
        "train", "--config", cfg_path, "--data", "synthetic",
        "--synthetic-size", "64", "--ckpt-dir", ckpt_dir, "--mesh", "dp",
        "--eval-every", "1",
    ])
    out = capsys.readouterr().out
    assert "[MESH] dp over 8 devices" in out
    assert "[SAMPLE]" in out  # the sharded hook produced the grid
    assert "val_loss=" in out  # eval pass ran DP-sharded (batch 8 over 8)
    assert os.path.exists(os.path.join(ckpt_dir, "climesh_samples_e000.png"))
    last = os.path.join(ckpt_dir, "climesh_last")
    assert os.path.isdir(last)

    png = str(tmp_path / "sharded.png")
    main([
        "sample-ddim", "--config", cfg_path, "--ckpt", last, "--n", "16",
        "--steps", "4", "--out", png, "--ema", "--sharded",
    ])
    out = capsys.readouterr().out
    assert "sharded x8" in out
    assert os.path.exists(png)


def test_cli_train_mesh_fsdp(tmp_path, capsys):
    """`train --mesh fsdp` shards params/optimizer over the mesh and still
    produces a loadable checkpoint."""
    from ddpm_diffusion_model_tpu.cli import main

    tiny = ExperimentConfig(
        model=get_preset("celeba64_low").model.__class__(
            base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
            attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
            img_resolution=8,
        ),
        diffusion=get_preset("celeba64_low").diffusion.__class__(T=20, img_size=8),
        train=get_preset("celeba64_low").train.__class__(
            base_lr=1e-3, warmup_steps=2, grad_accum_steps=1
        ),
        run_name="clifsdp", img_size=8, batch_size=8, epochs=1,
        sample_every=10, save_every=1,
    )
    cfg_path = str(tmp_path / "exp.json")
    with open(cfg_path, "w") as f:
        f.write(tiny.to_json())

    ckpt_dir = str(tmp_path / "ck")
    main([
        "train", "--config", cfg_path, "--data", "synthetic",
        "--synthetic-size", "32", "--ckpt-dir", ckpt_dir, "--mesh", "fsdp",
        "--no-samples",
    ])
    out = capsys.readouterr().out
    assert "[MESH] fsdp over 8 devices" in out
    png = str(tmp_path / "g.png")
    main([
        "sample-ddpm", "--config", cfg_path,
        "--ckpt", os.path.join(ckpt_dir, "clifsdp_last"),
        "--n", "8", "--out", png, "--sharded",
    ])
    assert os.path.exists(png)


def test_cli_sample_ddim_fast(tmp_path, capsys):
    """`sample-ddim --refresh-every K` routes through the encoder-cached
    sampler and produces a grid from an existing checkpoint."""
    from ddpm_diffusion_model_tpu.cli import main

    tiny = ExperimentConfig(
        model=get_preset("celeba64_low").model.__class__(
            base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
            attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
            img_resolution=8,
        ),
        diffusion=get_preset("celeba64_low").diffusion.__class__(T=20, img_size=8),
        train=get_preset("celeba64_low").train.__class__(
            base_lr=1e-3, warmup_steps=2, grad_accum_steps=1
        ),
        run_name="clifast", img_size=8, batch_size=4, epochs=1,
        sample_every=10, save_every=1,
    )
    cfg_path = str(tmp_path / "exp.json")
    with open(cfg_path, "w") as f:
        f.write(tiny.to_json())
    ckpt_dir = str(tmp_path / "ck")
    main([
        "train", "--config", cfg_path, "--data", "synthetic",
        "--synthetic-size", "8", "--ckpt-dir", ckpt_dir, "--no-samples",
    ])
    capsys.readouterr()
    png = str(tmp_path / "fast.png")
    main([
        "sample-ddim", "--config", cfg_path,
        "--ckpt", os.path.join(ckpt_dir, "clifast_last"),
        "--n", "4", "--steps", "6", "--refresh-every", "3", "--out", png,
    ])
    out = capsys.readouterr().out
    assert "encoder-cached 1/3" in out
    assert os.path.exists(png)


def test_cli_train_blobs_preload_rfid(tmp_path, capsys):
    """`train --data blobs --preload` renders the corpus to RAM, trains,
    scores per-epoch rFID against the held-out reference, and runs the
    validation pass."""
    from ddpm_diffusion_model_tpu.cli import main

    tiny = ExperimentConfig(
        model=get_preset("celeba64_low").model.__class__(
            base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
            attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
            img_resolution=8,
        ),
        diffusion=get_preset("celeba64_low").diffusion.__class__(T=20, img_size=8),
        train=get_preset("celeba64_low").train.__class__(
            base_lr=1e-3, warmup_steps=2, grad_accum_steps=1
        ),
        run_name="cliblob", img_size=8, batch_size=4, epochs=1,
        sample_every=1, sample_n=4, save_every=10,
    )
    cfg_path = str(tmp_path / "exp.json")
    with open(cfg_path, "w") as f:
        f.write(tiny.to_json())
    main([
        "train", "--config", cfg_path, "--data", "blobs", "--preload",
        "--synthetic-size", "16", "--ckpt-dir", str(tmp_path / "ck"),
        "--eval-every", "1",
    ])
    out = capsys.readouterr().out
    assert "rFID=" in out
    assert "val_loss=" in out


def test_cli_resume_overrides(tmp_path, capsys):
    """CLI resume overrides: --repair-ema re-seeds the shadow from the
    model, --override-lr applies, --reset-optimizer starts warmup clock
    fast-forwarded (reference main_train_loop.py:69-77 semantics)."""
    from ddpm_diffusion_model_tpu.cli import main

    tiny = ExperimentConfig(
        model=get_preset("celeba64_low").model.__class__(
            base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
            attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
            img_resolution=8,
        ),
        diffusion=get_preset("celeba64_low").diffusion.__class__(T=20, img_size=8),
        train=get_preset("celeba64_low").train.__class__(
            base_lr=1e-3, warmup_steps=2, grad_accum_steps=1
        ),
        run_name="cliovr", img_size=8, batch_size=4, epochs=1,
        sample_every=10, save_every=1,
    )
    cfg_path = str(tmp_path / "exp.json")
    with open(cfg_path, "w") as f:
        f.write(tiny.to_json())
    ckpt_dir = str(tmp_path / "ck")
    main(["train", "--config", cfg_path, "--data", "synthetic",
          "--synthetic-size", "8", "--ckpt-dir", ckpt_dir, "--no-samples"])
    capsys.readouterr()
    main(["train", "--config", cfg_path, "--data", "synthetic",
          "--synthetic-size", "8", "--ckpt-dir", ckpt_dir, "--no-samples",
          "--resume", "auto", "--epochs", "2",
          "--repair-ema", "force", "--override-lr", "5e-4",
          "--override-ema-decay", "0.99", "--reset-optimizer"])
    out = capsys.readouterr().out
    assert "override_lr -> 5.000e-04" in out
    assert "optimizer state reset" in out
    assert "forced" in out and "Reinitialized" in out
    # auto mode keeps a healthy shadow (reference semantics)
    main(["train", "--config", cfg_path, "--data", "synthetic",
          "--synthetic-size", "8", "--ckpt-dir", ckpt_dir, "--no-samples",
          "--resume", "auto", "--epochs", "3", "--repair-ema"])
    out = capsys.readouterr().out
    assert "EMA healthy" in out and "Kept" in out


def test_cli_eval_command(tmp_path, capsys):
    """`ddpm-tpu eval --ckpt ...` scores a checkpoint: val loss (raw+EMA)
    on a held-out set plus rFID of an EMA grid, as one JSON line."""
    from ddpm_diffusion_model_tpu.cli import main

    tiny = ExperimentConfig(
        model=get_preset("celeba64_low").model.__class__(
            base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
            attn_resolutions=(), time_embed_dim=16, num_heads=1, head_dim=8,
            img_resolution=8,
        ),
        diffusion=get_preset("celeba64_low").diffusion.__class__(T=20, img_size=8),
        train=get_preset("celeba64_low").train.__class__(
            base_lr=1e-3, warmup_steps=2, grad_accum_steps=1
        ),
        run_name="clieval", img_size=8, batch_size=4, epochs=1,
        sample_every=10, save_every=10,
    )
    cfg_path = str(tmp_path / "exp.json")
    with open(cfg_path, "w") as f:
        f.write(tiny.to_json())
    ckpt_dir = str(tmp_path / "ck")
    main(["train", "--config", cfg_path, "--data", "blobs",
          "--synthetic-size", "8", "--ckpt-dir", ckpt_dir, "--no-samples"])
    capsys.readouterr()
    main(["eval", "--config", cfg_path,
          "--ckpt", os.path.join(ckpt_dir, "clieval_last"),
          "--data", "blobs", "--eval-size", "8", "--rfid-n", "4"])
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[-1])
    assert np.isfinite(rec["val_loss"]) and np.isfinite(rec["val_loss_ema"])
    assert np.isfinite(rec["rfid_ema"]) and rec["global_step"] == 2
