"""DiT-S/4 training at 64px — the second model family (beyond-reference).

Same task/hyperparameters as the attention preset (batch 128, EMA 0.9997),
but the denoiser is the transformer family (models/dit.py): every other
moving part — train step, EMA, checkpoints, DDIM/DPM++ sampling — is
identical, which is the point of the shared call contract.

    python examples/train_dit.py --zip-path /path/to/celeba.zip
    python examples/train_dit.py --synthetic   # no-download smoke
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from ddpm_diffusion_model_tpu.data import (ArrayDataset, DataLoader,
                                           get_celeba_loader_from_zip)
from ddpm_diffusion_model_tpu.models import build_denoiser
from ddpm_diffusion_model_tpu.ops import make_schedule
from ddpm_diffusion_model_tpu.sampling import ddim_infer_sample
from ddpm_diffusion_model_tpu.training import train_ddpm
from ddpm_diffusion_model_tpu.utils.config import get_preset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--zip-path")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--epochs", type=int, default=50)
    args = ap.parse_args()

    exp = get_preset("celeba64_dit_s4")
    model = build_denoiser(exp.model, dtype=jnp.bfloat16)
    sched = make_schedule(exp.diffusion)

    if args.synthetic or not args.zip_path:
        rng = np.random.default_rng(0)
        arr = np.clip(rng.normal(size=(2048, 64, 64, 3)) * 0.4, -1, 1).astype(np.float32)
        loader = DataLoader(ArrayDataset(arr), exp.batch_size, seed=exp.seed)
    else:
        loader = get_celeba_loader_from_zip(
            args.zip_path, img_size=64, batch_size=exp.batch_size, seed=exp.seed
        )

    def sample_fn(model_, params_, sched_, *, n, img_size, save_path, seed):
        ddim_infer_sample(model_, params_, sched_, n=n, img_size=img_size,
                          out_path=save_path, seed=seed, steps=50)

    train_ddpm(
        model, sched, loader,
        train_config=exp.train, epochs=args.epochs,
        sample_every=exp.sample_every, sample_n=36, img_size=64,
        sample_fn=sample_fn, ckpt_dir="checkpoints", run_name=exp.run_name,
        save_every=exp.save_every, log_every=100,
        probe_timesteps=[10, 50, 200, 500], log_grad_norm=True,
        configs_for_ckpt={"experiment": exp.to_dict()},
    )


if __name__ == "__main__":
    main()
