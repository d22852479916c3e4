"""torch -> flax checkpoint migration (utils/interop.py, CLI import-torch).

Runs against the LIVE reference: builds real torch models/checkpoints
(``src/training_loops/chekpoints.py`` format), imports them, and asserts
forward/EMA parity through the conversion.  Covers all three presets'
architectures, the EMA shadow, the bare-state_dict fallback, and an
end-to-end CLI import + sample from the imported checkpoint.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")),
    reason="reference checkout not mounted",
)

from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.utils.config import get_preset
from ddpm_diffusion_model_tpu.utils.interop import (
    ema_shadow_to_flax,
    import_torch_checkpoint,
    load_reference_checkpoint,
    state_dict_to_flax,
    torch_name_to_flax_path,
)


@pytest.fixture(scope="module")
def torch_ref():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    from src.model.unet_backbone import UNetDenoiser as RefUNet

    return torch, RefUNet


TINY = dict(in_channels=3, base_channels=8, channel_mults=(1, 2),
            num_res_blocks=1, time_embed_dim=16, dropout=0.0,
            num_heads=1, head_dim=8, img_resolution=16)


def _template(cfg: UNetConfig, img: int):
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    return model, jax.eval_shape(
        model.init, jax.random.key(0), jnp.ones((1, img, img, 3)),
        jnp.zeros((1,)))


def test_name_mapping_rejects_unknown():
    cfg = UNetConfig(attn_resolutions=(8,), **TINY)
    with pytest.raises(KeyError):
        torch_name_to_flax_path("bogus.0.weight", cfg)
    with pytest.raises(KeyError):
        torch_name_to_flax_path("time_mlp.net.5.weight", cfg)


@pytest.mark.parametrize("preset", ["celeba64_low", "celeba64_attn",
                                    "celebahq256"])
def test_state_dict_maps_completely_for_all_presets(torch_ref, preset):
    """Every torch param of every preset architecture lands on exactly one
    flax leaf (bidirectional completeness check inside state_dict_to_flax)."""
    torch, RefUNet = torch_ref
    exp = get_preset(preset)
    m = exp.model
    ref_m = RefUNet(
        in_channels=m.in_channels, base_channels=m.base_channels,
        channel_mults=tuple(m.channel_mults),
        num_res_blocks=m.num_res_blocks,
        attn_resolutions=set(m.attn_resolutions),
        time_embed_dim=m.time_embed_dim, dropout=m.dropout,
        num_heads=m.num_heads, head_dim=m.head_dim,
        img_resolution=m.img_resolution,
    )
    _model, template = _template(m, m.img_resolution)
    tree = state_dict_to_flax(ref_m.state_dict(), m, template)
    n_ours = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))
    n_theirs = sum(p.numel() for p in ref_m.parameters())
    assert n_ours == n_theirs


def test_state_dict_mismatch_raises(torch_ref):
    torch, RefUNet = torch_ref
    ref_m = RefUNet(attn_resolutions=set(), **TINY)
    wrong = UNetConfig(attn_resolutions=(8,), **TINY)  # expects attn params
    _model, template = _template(wrong, 16)
    with pytest.raises((KeyError, ValueError)):
        state_dict_to_flax(ref_m.state_dict(), wrong, template)


def _make_ref_checkpoint(torch, RefUNet, path, steps=3):
    """A REAL reference checkpoint: model + AdamW + GradScaler + EMA written
    by the reference's own save_ckpt (chekpoints.py:4-13)."""
    from src.training_loops.chekpoints import save_ckpt
    from src.training_loops.ema import EMA

    torch.manual_seed(0)
    ref_m = RefUNet(attn_resolutions={8}, **TINY)
    opt = torch.optim.AdamW(ref_m.parameters(), lr=1e-3)
    scaler = torch.amp.GradScaler("cpu", enabled=False)
    ema = EMA(ref_m, decay=0.9)
    # a few real update steps so EMA shadow != params
    for i in range(steps):
        x = torch.randn(2, 3, 16, 16)
        t = torch.randint(1, 100, (2,))
        loss = ref_m(x, t).pow(2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        ema.update(ref_m)
    save_ckpt(path, ref_m, opt, scaler, ema, step=steps,
              extra={"epoch": 1, "global_step": steps})
    ref_m.eval()
    return ref_m, ema


def test_tiny_roundtrip_forward_and_ema_parity(torch_ref, tmp_path):
    """Import a real reference checkpoint and verify: (a) the imported raw
    params reproduce the torch forward to 1e-4, (b) the imported EMA tree
    equals the torch EMA shadow, (c) step/epoch metadata survive."""
    torch, RefUNet = torch_ref
    from ddpm_diffusion_model_tpu.training import (init_train_state,
                                                   load_checkpoint,
                                                   make_optimizer)
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig
    from ddpm_diffusion_model_tpu.training import TrainConfig
    from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig

    pt = str(tmp_path / "ref.pt")
    ref_m, ema = _make_ref_checkpoint(torch, RefUNet, pt)

    cfg = UNetConfig(attn_resolutions=(8,), **TINY)
    exp = ExperimentConfig(
        model=cfg, diffusion=DiffusionConfig(T=100, img_size=16),
        train=TrainConfig(), run_name="imported", img_size=16, batch_size=4)
    out = str(tmp_path / "orbax")
    path, info = import_torch_checkpoint(pt, exp, out, require_ema=True)
    assert info["ema"] and info["step"] == 3

    # restore through the standard loader
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.ones((1, 16, 16, 3)),
                        jnp.zeros((1,)))
    template, _ = init_train_state(params, exp.train,
                                   tx=make_optimizer(exp.train))
    state, meta = load_checkpoint(path, template)
    assert int(state.step) == 3
    assert meta["epoch"] == 1
    assert meta["extra"]["imported_from"] == os.path.abspath(pt)

    # (a) forward parity, matched inputs
    rng = np.random.default_rng(5)
    xa = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    tv = np.array([7, 93], dtype=np.int64)
    with torch.no_grad():
        theirs = ref_m(torch.from_numpy(xa), torch.from_numpy(tv))
    ours = model.apply(
        jax.tree.map(lambda x: x.astype(jnp.float32), state.params),
        jnp.asarray(np.transpose(xa, (0, 2, 3, 1))),
        jnp.asarray(tv.astype(np.int32)))
    np.testing.assert_allclose(
        np.asarray(ours), np.transpose(theirs.numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-4)

    # (b) EMA parity: shadow tensors mapped leaf-for-leaf
    sd_keys = list(ref_m.state_dict().keys())
    expect_ema = ema_shadow_to_flax(
        [s.numpy() for s in ema.shadow], sd_keys, cfg,
        jax.eval_shape(model.init, jax.random.key(0),
                       jnp.ones((1, 16, 16, 3)), jnp.zeros((1,))))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(state.ema_params)[0],
        jax.tree_util.tree_flatten_with_path(expect_ema)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_bare_state_dict_and_ema_fallback(torch_ref, tmp_path):
    """A bare ``torch.save(model.state_dict())`` file imports too; EMA falls
    back to a copy of the raw params."""
    torch, RefUNet = torch_ref
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig
    from ddpm_diffusion_model_tpu.training import TrainConfig
    from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig

    torch.manual_seed(1)
    ref_m = RefUNet(attn_resolutions=set(), **TINY)
    pt = str(tmp_path / "bare.pt")
    torch.save(ref_m.state_dict(), pt)

    cfg = UNetConfig(attn_resolutions=(), **TINY)
    exp = ExperimentConfig(
        model=cfg, diffusion=DiffusionConfig(T=100, img_size=16),
        train=TrainConfig(), run_name="bare", img_size=16, batch_size=4)
    path, info = import_torch_checkpoint(pt, exp, str(tmp_path / "o"))
    assert not info["ema"] and info["step"] == 0

    with pytest.raises(ValueError):
        import_torch_checkpoint(pt, exp, str(tmp_path / "o2"),
                                require_ema=True)


def test_cli_import_torch_full_attn_and_sample(torch_ref, tmp_path):
    """The VERDICT round-trip: full-size 64px attention architecture
    (31,312,131 params) through the CLI import, then an actual DDIM sample
    from the imported checkpoint."""
    torch, RefUNet = torch_ref
    from ddpm_diffusion_model_tpu.cli import main as cli_main

    exp = get_preset("celeba64_attn")
    m = exp.model
    torch.manual_seed(2)
    ref_m = RefUNet(
        in_channels=m.in_channels, base_channels=m.base_channels,
        channel_mults=tuple(m.channel_mults),
        num_res_blocks=m.num_res_blocks,
        attn_resolutions=set(m.attn_resolutions),
        time_embed_dim=m.time_embed_dim, dropout=m.dropout,
        num_heads=m.num_heads, head_dim=m.head_dim,
        img_resolution=m.img_resolution,
    )
    n_params = sum(p.numel() for p in ref_m.parameters())
    assert n_params == 31_312_131
    pt = str(tmp_path / "attn.pt")
    torch.save(ref_m.state_dict(), pt)

    out = str(tmp_path / "orbax_attn")
    rc = cli_main(["import-torch", "--preset", "celeba64_attn",
                   "--torch-ckpt", pt, "--out", out])
    assert rc is None or rc == 0
    assert os.path.isdir(out)
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert meta["configs"]["experiment"]["model"]["base_channels"] == 128

    # sample from the imported checkpoint (tiny grid, few steps — proves the
    # restored weights drive the whole sampling stack)
    png = str(tmp_path / "imported.png")
    cli_main(["sample-ddim", "--ckpt", out, "--n", "2", "--steps", "4",
              "--out", png])
    assert os.path.exists(png)


# ---------------------------------------------------------------------------
# flax -> torch export (the off-ramp)
# ---------------------------------------------------------------------------

from ddpm_diffusion_model_tpu.utils.interop import (  # noqa: E402
    export_torch_checkpoint,
    flax_to_state_dict,
    reference_param_entries,
)


@pytest.mark.parametrize("preset", ["celeba64_low", "celeba64_attn",
                                    "celebahq256"])
def test_reference_key_order_matches_all_presets(torch_ref, preset):
    """The export key walk reproduces the reference's state_dict keys
    EXACTLY, order included — order is load-bearing because the EMA shadow
    is a bare list in ``model.parameters()`` order (ema.py:10-13)."""
    torch, RefUNet = torch_ref
    exp = get_preset(preset)
    m = exp.model
    ref_m = RefUNet(
        in_channels=m.in_channels, base_channels=m.base_channels,
        channel_mults=tuple(m.channel_mults),
        num_res_blocks=m.num_res_blocks,
        attn_resolutions=set(m.attn_resolutions),
        time_embed_dim=m.time_embed_dim, dropout=m.dropout,
        num_heads=m.num_heads, head_dim=m.head_dim,
        img_resolution=m.img_resolution,
    )
    _model, template = _template(m, m.img_resolution)
    import flax

    tree = flax.core.unfreeze(template)["params"]
    ours = [k for k, _ in reference_param_entries(m, tree)]
    theirs = list(ref_m.state_dict().keys())
    assert ours == theirs
    # parameters() order == state_dict order (the EMA shadow contract)
    assert len(list(ref_m.parameters())) == len(theirs)


def test_export_loads_into_reference_with_forward_parity(torch_ref, tmp_path):
    """Export a flax TrainState and load it with the reference's own
    load_ckpt: forwards must match to 1e-4 and the EMA shadow must land
    tensor-for-tensor."""
    torch, RefUNet = torch_ref
    from src.training_loops.chekpoints import load_ckpt
    from src.training_loops.ema import EMA

    from ddpm_diffusion_model_tpu.ops import DiffusionConfig
    from ddpm_diffusion_model_tpu.training import (TrainConfig,
                                                   init_train_state,
                                                   make_optimizer)
    from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig

    cfg = UNetConfig(attn_resolutions=(8,), **TINY)
    exp = ExperimentConfig(
        model=cfg, diffusion=DiffusionConfig(T=100, img_size=16),
        train=TrainConfig(), run_name="exported", img_size=16, batch_size=4)
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    params = model.init(jax.random.key(3), jnp.ones((1, 16, 16, 3)),
                        jnp.zeros((1,)))
    state, _ = init_train_state(params, exp.train,
                                tx=make_optimizer(exp.train))
    # make EMA differ from raw params so the test can tell them apart
    state = state.replace(
        ema_params=jax.tree.map(lambda x: x * 1.5, state.params),
        step=jnp.asarray(17, jnp.int32))

    pt = str(tmp_path / "exported.pt")
    path, info = export_torch_checkpoint(state, exp, pt)
    assert info["step"] == 17 and info["ema"]

    torch.manual_seed(0)
    ref_m = RefUNet(attn_resolutions={8}, **TINY)
    ema = EMA(ref_m, decay=0.999)
    step, extra = load_ckpt(pt, ref_m, ema=ema, map_location="cpu")
    assert step == 17
    assert extra["exported_from"] == "ddpm_diffusion_model_tpu"
    ref_m.eval()

    rng = np.random.default_rng(11)
    xa = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    tv = np.array([5, 88], dtype=np.int64)
    with torch.no_grad():
        theirs = ref_m(torch.from_numpy(xa), torch.from_numpy(tv))
    ours = model.apply(params, jnp.asarray(np.transpose(xa, (0, 2, 3, 1))),
                       jnp.asarray(tv.astype(np.int32)))
    np.testing.assert_allclose(
        np.asarray(ours), np.transpose(theirs.numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-4)

    # EMA shadow: copy_to must reproduce 1.5x the raw weights
    ema.copy_to(ref_m)
    with torch.no_grad():
        p0 = next(ref_m.parameters()).numpy()
    sd = flax_to_state_dict(state.ema_params, cfg)
    np.testing.assert_allclose(p0, sd[list(sd)[0]], rtol=1e-6)


def test_import_export_roundtrip_bitwise(torch_ref, tmp_path):
    """reference ckpt -> import -> export reproduces every model and EMA
    tensor bitwise (fp32 end to end, layout transforms are permutations)."""
    torch, RefUNet = torch_ref
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig
    from ddpm_diffusion_model_tpu.training import (TrainConfig,
                                                   init_train_state,
                                                   load_checkpoint,
                                                   make_optimizer)
    from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig

    pt = str(tmp_path / "ref.pt")
    ref_m, ema = _make_ref_checkpoint(torch, RefUNet, pt)

    cfg = UNetConfig(attn_resolutions=(8,), **TINY)
    exp = ExperimentConfig(
        model=cfg, diffusion=DiffusionConfig(T=100, img_size=16),
        train=TrainConfig(), run_name="rt", img_size=16, batch_size=4)
    out = str(tmp_path / "orbax")
    path, _ = import_torch_checkpoint(pt, exp, out, require_ema=True)

    model = UNetDenoiser(cfg, dtype=jnp.float32)
    params = model.init(jax.random.key(0), jnp.ones((1, 16, 16, 3)),
                        jnp.zeros((1,)))
    template, _ = init_train_state(params, exp.train,
                                   tx=make_optimizer(exp.train))
    state, _ = load_checkpoint(path, template)

    back = str(tmp_path / "back.pt")
    export_torch_checkpoint(state, exp, back)
    orig = torch.load(pt, map_location="cpu", weights_only=False)
    rt = torch.load(back, map_location="cpu", weights_only=False)
    assert list(rt["model"].keys()) == list(orig["model"].keys())
    for k in orig["model"]:
        np.testing.assert_array_equal(rt["model"][k].numpy(),
                                      orig["model"][k].numpy(), err_msg=k)
    assert len(rt["ema"]["shadow"]) == len(orig["ema"]["shadow"])
    for i, (a, b) in enumerate(zip(rt["ema"]["shadow"],
                                   orig["ema"]["shadow"])):
        np.testing.assert_array_equal(a.numpy(), b.numpy(), err_msg=str(i))
    assert rt["step"] == orig["step"]
    assert rt["ema"]["decay"] == pytest.approx(orig["ema"]["decay"])


def test_cli_export_torch(torch_ref, tmp_path):
    """CLI off-ramp: save a native checkpoint, export-torch it, and load the
    file with plain torch."""
    torch, _RefUNet = torch_ref
    from ddpm_diffusion_model_tpu.cli import main as cli_main
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig
    from ddpm_diffusion_model_tpu.training import (TrainConfig,
                                                   init_train_state,
                                                   make_optimizer)
    from ddpm_diffusion_model_tpu.training.checkpoint import save_checkpoint
    from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig

    cfg = UNetConfig(attn_resolutions=(8,), **TINY)
    exp = ExperimentConfig(
        model=cfg, diffusion=DiffusionConfig(T=100, img_size=16),
        train=TrainConfig(), run_name="cliexp", img_size=16, batch_size=4)
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    params = model.init(jax.random.key(4), jnp.ones((1, 16, 16, 3)),
                        jnp.zeros((1,)))
    state, _ = init_train_state(params, exp.train,
                                tx=make_optimizer(exp.train))
    ck = save_checkpoint(str(tmp_path / "ck"), state, epoch=0,
                         configs={"experiment": exp.to_dict()})

    out = str(tmp_path / "native.pt")
    rc = cli_main(["export-torch", "--ckpt", ck, "--out", out])
    assert rc is None or rc == 0
    payload = torch.load(out, map_location="cpu", weights_only=False)
    n = sum(int(t.numel()) for t in payload["model"].values())
    assert n == sum(int(p.size) for p in jax.tree.leaves(params))
    assert "optimizer" not in payload  # load_ckpt treats it as optional
