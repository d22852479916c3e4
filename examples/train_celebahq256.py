"""CelebA-HQ-256 training run — the TPU counterpart of the reference's
``Difussion_Model_CelebHQ.ipynb`` (BASELINE.md rows 4/6/8): 63M-param U-Net
(mults (1,1,2,2,4), attention at 16x16), effective batch 64 via grad-accum 8,
dynamic thresholding 0.995, remat on ResBlocks instead of OOM-skip.

    python examples/train_celebahq256.py            # streams from HF hub
    python examples/train_celebahq256.py --synthetic
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from ddpm_diffusion_model_tpu.data import ArrayDataset, DataLoader, build_hf_image_loader
from ddpm_diffusion_model_tpu.models import UNetDenoiser
from ddpm_diffusion_model_tpu.ops import make_schedule
from ddpm_diffusion_model_tpu.sampling import ddim_sample
from ddpm_diffusion_model_tpu.training import train_ddpm
from ddpm_diffusion_model_tpu.utils.config import get_preset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--epochs", type=int, default=15)
    args = ap.parse_args()

    exp = get_preset("celebahq256")
    model = UNetDenoiser(exp.model, dtype=jnp.bfloat16, remat=True)
    sched = make_schedule(exp.diffusion)

    if args.synthetic:
        rng = np.random.default_rng(0)
        arr = np.clip(rng.normal(size=(256, 256, 256, 3)) * 0.4, -1, 1).astype(np.float32)
        loader = DataLoader(ArrayDataset(arr), exp.batch_size, seed=exp.seed)
    else:
        loader = build_hf_image_loader(img_size=256, batch_size=exp.batch_size,
                                       seed=exp.seed)

    # in-training sampling via 50-step karras DDIM (cheap at 256px)
    def sample_fn(model_, params_, sched_, *, n, img_size, save_path, seed):
        ddim_sample(model_, params_, sched_, n=min(n, 16), img_size=img_size,
                    save_path=save_path, seed=seed, steps=50, schedule="karras")

    train_ddpm(
        model, sched, loader,
        train_config=exp.train, epochs=args.epochs,
        sample_every=1, sample_n=16, img_size=256, sample_fn=sample_fn,
        ckpt_dir="checkpoints", run_name=exp.run_name, save_every=1,
        log_every=50, probe_timesteps=[10, 50, 200, 500], log_grad_norm=True,
        configs_for_ckpt={"experiment": exp.to_dict()},
    )


if __name__ == "__main__":
    main()
