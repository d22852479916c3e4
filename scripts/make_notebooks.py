"""Generate (and optionally execute) the example notebooks.

The reference's actual entry points are its three Colab notebooks
(`/root/reference/full_notebooks/Difussion_Model_{Attention,CelebHQ,Low_GPU}
.ipynb`); `examples/notebooks/` mirrors that UX with TPU-native notebooks
over this framework's API.  They are GENERATED here (single source of truth,
no hand-edited JSON) and committed in executed form so readers see real
outputs.

Every notebook carries a ``QUICK`` switch: ``True`` (the committed, executed
form) shrinks the config so the whole notebook runs in minutes on any
backend — including the CPU this repo's CI uses; ``False`` runs the actual
preset and expects a TPU.

Usage:
    python scripts/make_notebooks.py            # write .ipynb files
    python scripts/make_notebooks.py --execute  # write + run (CPU-sanitized)
"""

from __future__ import annotations

import argparse
import os
import sys

import nbformat
from nbformat.v4 import new_code_cell, new_markdown_cell, new_notebook

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "examples", "notebooks")


# --------------------------------------------------------------------------
# shared cell fragments
# --------------------------------------------------------------------------

SETUP = """\
# QUICK=True shrinks everything so the notebook executes in minutes on any
# backend (the committed outputs were produced this way, on CPU).  Set
# QUICK=False on a TPU host to run the real preset.
QUICK = True

import os, sys
if "google.colab" not in sys.modules and os.path.isdir("../../ddpm_diffusion_model_tpu"):
    sys.path.insert(0, os.path.abspath("../.."))  # run from examples/notebooks/

import jax, jax.numpy as jnp, numpy as np
from ddpm_diffusion_model_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()  # persistent jit cache: re-runs skip the compile wait
print("backend:", jax.default_backend(), "|", len(jax.devices()), "device(s)")"""


def _display_grid_cell(var: str, scale: int = 4, nrow: str = "None") -> str:
    return f"""\
from PIL import Image
from ddpm_diffusion_model_tpu.utils.images import make_grid

_g = make_grid(np.clip(np.asarray({var}, np.float32), 0, 1), nrow={nrow})
_im = Image.fromarray((_g * 255).astype(np.uint8))
_im.resize((_im.width * {scale}, _im.height * {scale}), Image.NEAREST)"""


def quick_config_cell(preset: str) -> str:
    return f"""\
from ddpm_diffusion_model_tpu.utils.config import get_preset
from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.training import TrainConfig

exp = get_preset("{preset}")
if QUICK:  # tiny-but-real: same topology family, toy size
    from ddpm_diffusion_model_tpu.utils.config import ExperimentConfig
    exp = ExperimentConfig(
        model=UNetConfig(base_channels=32, channel_mults=(1, 2),
                         num_res_blocks=1, attn_resolutions=(8,),
                         time_embed_dim=64, dropout=0.0, num_heads=2,
                         head_dim=16, img_resolution=16),
        diffusion=DiffusionConfig(T=100, img_size=16),
        train=TrainConfig(base_lr=1e-3, warmup_steps=5, grad_accum_steps=1,
                          ema_decay=0.999),
        run_name="{preset}_quick", img_size=16, batch_size=8, epochs=2,
    )

model = UNetDenoiser(exp.model, dtype=jnp.bfloat16, remat=exp.remat)
sched = make_schedule(exp.diffusion)   # never checkpointed; rebuilt from config
params = model.init(jax.random.key(0),
                    jnp.ones((1, exp.img_size, exp.img_size, 3)), jnp.zeros((1,)))
n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
print(f"{{exp.run_name}}: {{n_params:,}} params at {{exp.img_size}}px, T={{exp.diffusion.T}}")"""


DATA_CELL = """\
# Zero-egress stand-in corpus: procedural "blob faces" with real structure
# (data/synthetic.py).  For the real datasets use data.celeba:
#   get_celeba_loaders(...)          # torchvision CelebA (aligned 64px crop)
#   get_celeba_loader_from_zip(...)  # local img_align_celeba.zip
#   build_hf_image_loader(...)       # HuggingFace CelebA-HQ-256
from ddpm_diffusion_model_tpu.data import ArrayDataset, DataLoader, blob_faces_array

N_TRAIN = 64 if QUICK else 50_000
corpus = blob_faces_array(N_TRAIN, img_size=exp.img_size, seed=exp.seed)
loader = DataLoader(ArrayDataset(corpus), exp.batch_size, seed=exp.seed)
print("corpus", corpus.shape, corpus.dtype, "in [%.2f, %.2f]" % (corpus.min(), corpus.max()))"""


FORWARD_CELL = """\
# the forward (noising) process q(x_t | x_0) at increasing t
from ddpm_diffusion_model_tpu.ops import q_sample

x0 = jnp.asarray(corpus[:1])
ts = [0, exp.diffusion.T // 4, exp.diffusion.T // 2, 3 * exp.diffusion.T // 4,
      exp.diffusion.T - 1]
eps = jax.random.normal(jax.random.key(1), x0.shape)
noisy = jnp.concatenate([
    q_sample(sched, x0, jnp.full((1,), t), eps) for t in ts])
strip = (np.asarray(noisy) + 1.0) / 2.0   # [-1,1] -> [0,1] for display"""


def train_cell(extra: str = "") -> str:
    return f"""\
from ddpm_diffusion_model_tpu.training import train_ddpm

state, summary = train_ddpm(
    model, sched, loader,
    train_config=exp.train, init_params=params,
    epochs=exp.epochs, img_size=exp.img_size,
    sample_every=0, save_every=exp.epochs,   # checkpoint at the end
    ckpt_dir="/tmp/nb_ckpt", run_name=exp.run_name,
    log_every=4, probe_timesteps=(10, exp.diffusion.T // 2),{extra}
    configs_for_ckpt={{"experiment": exp.to_dict()}},
)
print("final epoch loss:", summary["epochs"][-1]["loss"])"""


SAMPLE_CELL = """\
# ancestral DDPM sampling (all T steps) with the EMA parameters — one jitted
# lax.scan, so the whole reverse process is a single compiled program
from ddpm_diffusion_model_tpu.sampling import ddpm_sample

n = 16
imgs = ddpm_sample(model, state.ema_params, sched, n, exp.img_size,
                   seed=42, return_grid=False)"""


DDIM_CELL = """\
# DDIM: 10-50 sub-sampled steps instead of T; eta=0 is deterministic
from ddpm_diffusion_model_tpu.sampling import ddim_sample

imgs_ddim = ddim_sample(model, state.params, sched, ema_params=state.ema_params,
                        n=16, img_size=exp.img_size, steps=10 if QUICK else 50,
                        eta=0.0, schedule="t_linear", seed=7)"""


STRIP_CELL = """\
# the denoising trajectory x_T -> x_0, snapshotted in-scan
from ddpm_diffusion_model_tpu.sampling import render_denoise_strip

strip_img = render_denoise_strip(model, state.params, sched,
                                 ema_params=state.ema_params,
                                 img_size=exp.img_size, seed=3,
                                 out_path="/tmp/nb_strip.png")
from PIL import Image
_im = Image.fromarray((np.clip(strip_img, 0, 1) * 255).astype(np.uint8))
_im.resize((_im.width * 3, _im.height * 3), Image.NEAREST)"""


RESUME_CELL = """\
# resume from the final checkpoint and train one more epoch; the loop
# reconciles config vs checkpoint (optimizer layout, EMA health) itself
import os
state2, _ = train_ddpm(
    model, sched, loader, train_config=exp.train, init_params=params,
    epochs=exp.epochs + 1, img_size=exp.img_size,
    sample_every=0, save_every=exp.epochs + 1, save_last=False,
    ckpt_dir="/tmp/nb_ckpt", run_name=exp.run_name,
    resume_path=os.path.join("/tmp/nb_ckpt", exp.run_name + "_last"),
)
print("resumed and advanced to step", int(state2.step))"""


# --------------------------------------------------------------------------
# notebooks
# --------------------------------------------------------------------------

def nb_attention() -> nbformat.NotebookNode:
    """Counterpart of Difussion_Model_Attention.ipynb — the flagship 64px
    attention U-Net, full train -> sample -> strip -> resume journey."""
    cells = [
        new_markdown_cell(
            "# DDPM on TPU — 64×64 attention U-Net (flagship)\n\n"
            "TPU-native walkthrough of the full workflow: config → data → "
            "forward process → training → DDPM/DDIM sampling → denoising "
            "strip → checkpoint/resume.  Mirrors the reference's "
            "`Difussion_Model_Attention.ipynb` journey (31.3M-param U-Net, "
            "attention at 16² and 8², batch 128) on this framework.\n\n"
            "Everything compute-side is JAX/Flax compiled by XLA: the train "
            "step is one donated jitted program (bf16 compute, fp32 params, "
            "fused uint8 dropout masks, flat raveled optimizer), and each "
            "sampler is a single `lax.scan`.  Measured on one TPU v5e this "
            "config trains at **1105 imgs/s = 4.3× the reference's Colab GPU "
            "baseline** (`docs/BENCH.md`)."),
        new_code_cell(SETUP),
        new_markdown_cell(
            "## Configuration\n\nPresets reproduce the three reference "
            "notebooks: `celeba64_low`, `celeba64_attn`, `celebahq256` "
            "(`utils/config.py`).  A config is a frozen dataclass tree — "
            "model topology, diffusion schedule, optimizer — and is the "
            "single source of truth: schedules are never checkpointed, "
            "they're rebuilt from it."),
        new_code_cell(quick_config_cell("celeba64_attn")),
        new_markdown_cell(
            "## Data\n\nLoaders yield `(images, labels)` with images NHWC "
            "float32 in [-1, 1].  On hosts with a slow link to the chip, "
            "`DeviceCacheLoader` pins the whole corpus in HBM as uint8 and "
            "gathers batches on-device (CLI `--device-cache`)."),
        new_code_cell(DATA_CELL),
        new_code_cell(_display_grid_cell("(corpus[:16] + 1) / 2")),
        new_markdown_cell(
            "## The forward process\n\n`q_sample` draws "
            "x_t = √ᾱ_t·x₀ + √(1−ᾱ_t)·ε in one shot from the schedule "
            "tables — left to right: t increasing toward pure noise."),
        new_code_cell(FORWARD_CELL),
        new_code_cell(_display_grid_cell("strip", nrow="len(ts)")),
        new_markdown_cell(
            "## Training\n\n`train_ddpm` runs the reference's loop contract "
            "(warmup, grad clip, EMA, probes at fixed t, periodic sampling, "
            "checkpoints) as one compiled step per batch.  Preemption "
            "(SIGTERM) saves and resumes cleanly; `--mesh dp|fsdp` scales "
            "it over a device mesh with XLA collectives."),
        new_code_cell(train_cell()),
        new_markdown_cell(
            "## Sampling\n\nDDPM ancestral sampling uses all T steps; DDIM "
            "jumps through a sub-sampled ladder (linear-in-t, cosine-ᾱ, or "
            "karras spacing) and is deterministic at η=0."),
        new_code_cell(SAMPLE_CELL),
        new_code_cell(_display_grid_cell("imgs")),
        new_code_cell(DDIM_CELL),
        new_code_cell(_display_grid_cell("imgs_ddim")),
        new_markdown_cell("## The denoising trajectory"),
        new_code_cell(STRIP_CELL),
        new_markdown_cell(
            "## Checkpoint → resume\n\nCheckpoints are Orbax directories "
            "with a `meta.json` sidecar (epoch, global step, configs).  "
            "Saves are async (they overlap the next epoch); restores can be "
            "partial (`components=`), and resume supports hyperparameter "
            "overrides and EMA repair.  Trained reference (PyTorch) "
            "checkpoints migrate in with\n"
            "`python -m ddpm_diffusion_model_tpu.cli import-torch --ckpt "
            "ref.pt --preset celeba64_attn --out <dir>`."),
        new_code_cell(RESUME_CELL),
        new_markdown_cell(
            "## Going further\n\n"
            "- **Real run**: set `QUICK = False` on a TPU host, or use the "
            "CLI: `python -m ddpm_diffusion_model_tpu.cli train --preset "
            "celeba64_attn --data zip --zip-path img_align_celeba.zip`\n"
            "- **Multi-chip**: `--mesh dp|fsdp` (training), `sample-ddim "
            "--sharded` (SPMD sampling) — see `docs/MULTICHIP.md`\n"
            "- **Serving**: `python -m ddpm_diffusion_model_tpu.serving "
            "--ckpt <dir> --port 8000` — request coalescing + mesh-sharded "
            "batches\n"
            "- **Perf**: `docs/BENCH.md` — rooflines, MFU attribution, and "
            "every number's measurement"),
    ]
    return new_notebook(cells=cells, metadata=_meta())


def nb_hq256() -> nbformat.NotebookNode:
    """Counterpart of Difussion_Model_CelebHQ.ipynb — 256px config."""
    cells = [
        new_markdown_cell(
            "# DDPM on TPU — CelebA-HQ 256×256\n\n"
            "The high-resolution config (63.1M params, mults (1,1,2,2,4), "
            "attention at 16², dynamic threshold 0.995, grad-accum 8): the "
            "counterpart of the reference's `Difussion_Model_CelebHQ.ipynb`."
            "\n\nTPU notes for this scale: rematerialization "
            "(`remat=True`) trades FLOPs for HBM so micro-batch 16 fits; "
            "grad accumulation is a `lax.scan` inside ONE jitted step; "
            "measured training runs at **112 imgs/s = 72% MFU on one v5e "
            "(3.5× the reference's A100)**, DDPM-1000 inference at 79% MFU "
            "(`docs/BENCH.md` 256px roofline)."),
        new_code_cell(SETUP),
        new_markdown_cell(
            "## Configuration\n\n`celebahq256` reproduces the notebook's "
            "exact topology (`docs/architecture_UNetDenoiser_CelebAHQ256"
            ".txt` archives the printed module tree).  `QUICK` shrinks it "
            "for this executed copy; the real config needs a TPU."),
        new_code_cell(quick_config_cell("celebahq256")),
        new_markdown_cell(
            "## Data\n\nThe real corpus comes from HuggingFace "
            "(`build_hf_image_loader`, CelebA-HQ-256) or a local zip of "
            "pre-cropped squares (`get_celeba_loader_from_zip(..., "
            "crop=None)`, CLI `--no-crop`).  At 256px the host→device link "
            "matters: `DeviceCacheLoader(quantize=True)` stores the corpus "
            "as uint8 in HBM (4× less upload) and dequantizes in the "
            "on-device gather."),
        new_code_cell(DATA_CELL),
        new_markdown_cell(
            "## Dynamic thresholding\n\nAt 256px the x₀ reconstruction "
            "uses Imagen-style dynamic thresholding (clamp at the 0.995 "
            "activation quantile, `ops/diffusion.py predict_x0`) instead "
            "of a hard ±1 clamp — the reference does the same "
            "(`difussion_class.py:143-149`)."),
        new_code_cell(train_cell(extra="\n    log_grad_norm=True,")),
        new_markdown_cell(
            "## DDIM inference — the flagship 256px workload\n\nThe "
            "reference's galleries are DDIM 50–150 steps at 256px.  Here "
            "(quick form) the same call at toy size:"),
        new_code_cell(DDIM_CELL),
        new_code_cell(_display_grid_cell("imgs_ddim")),
        new_code_cell(STRIP_CELL),
        new_markdown_cell(
            "## Scale-out\n\nOne v5e chip caps at ~157 imgs/s for this "
            "architecture at 100% MFU (roofline in `docs/BENCH.md`); "
            "beyond that is the `parallel/` layer: DP/FSDP via "
            "`train --mesh fsdp`, SPMD sampling via `sample-ddim "
            "--sharded`, ring attention (`attn_impl=\"ring\"`) for "
            "sequence-parallel attention.  All of it runs on a virtual "
            "CPU mesh too — that is how this repo's tests validate it."),
    ]
    return new_notebook(cells=cells, metadata=_meta())


def nb_low() -> nbformat.NotebookNode:
    """Counterpart of Difussion_Model_Low_GPU.ipynb — small budget."""
    cells = [
        new_markdown_cell(
            "# DDPM on TPU — low-resource 64×64\n\n"
            "The small-budget config (12.1M params, batch 32, no 16² "
            "attention): the counterpart of the reference's "
            "`Difussion_Model_Low_GPU.ipynb`, which it trained on a "
            "laptop-class GPU at 345–379 imgs/s.  This framework runs the "
            "same config at **1739 imgs/s (4.8×) on one TPU v5e** — and "
            "because params are fp32 with bf16 compute, there is no "
            "GradScaler to babysit."),
        new_code_cell(SETUP),
        new_code_cell(quick_config_cell("celeba64_low")),
        new_code_cell(DATA_CELL),
        new_markdown_cell(
            "## Train, sample, inspect\n\nIdentical API to the flagship "
            "notebook — the budget knobs live entirely in the preset "
            "(channels, attention placement, batch size, EMA decay)."),
        new_code_cell(train_cell()),
        new_code_cell(SAMPLE_CELL),
        new_code_cell(_display_grid_cell("imgs")),
        new_markdown_cell(
            "## When you outgrow it\n\nSwitch presets — nothing else "
            "changes: `get_preset(\"celeba64_attn\")` for the flagship, "
            "`celebahq256` for high resolution, `--mesh dp` when one chip "
            "isn't enough.  The CLI mirrors this notebook: `python -m "
            "ddpm_diffusion_model_tpu.cli train --preset celeba64_low "
            "--data zip --zip-path img_align_celeba.zip`."),
    ]
    return new_notebook(cells=cells, metadata=_meta())


def _meta() -> dict:
    return {
        "kernelspec": {"display_name": "Python 3", "language": "python",
                       "name": "python3"},
        "language_info": {"name": "python"},
    }


NOTEBOOKS = {
    "ddpm_celeba64_attention.ipynb": nb_attention,
    "ddpm_celebahq256.ipynb": nb_hq256,
    "ddpm_celeba64_low.ipynb": nb_low,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true",
                    help="run each notebook (CPU-sanitized env) and save "
                         "with outputs")
    ap.add_argument("--only", help="single notebook filename to (re)build")
    args = ap.parse_args()

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, build in NOTEBOOKS.items():
        if args.only and name != args.only:
            continue
        nb = build()
        path = os.path.join(OUT_DIR, name)
        if args.execute:
            # sanitize like tests/conftest.py: notebooks must execute
            # without TPU hardware
            os.environ.pop("PALLAS_AXON_POOL_IPS", None)
            os.environ["JAX_PLATFORMS"] = "cpu"
            from nbclient import NotebookClient

            client = NotebookClient(nb, timeout=900,
                                    resources={"metadata": {"path": OUT_DIR}})
            client.execute()
        nbformat.write(nb, path)
        print(("executed + " if args.execute else "") + "wrote " + path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
