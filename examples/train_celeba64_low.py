"""CelebA-64 "low-GPU" training run — the TPU counterpart of the reference's
``Difussion_Model_Low_GPU.ipynb`` (BASELINE.md rows 1/2/5/7): base-96 U-Net,
attention at 8x8, batch 32, EMA 0.9995, 10 epochs, DDPM grid samples every
epoch, checkpoints with mirror copy.

    python examples/train_celeba64_low.py --zip-path /path/to/celeba.zip
    python examples/train_celeba64_low.py --synthetic   # no-download smoke
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from ddpm_diffusion_model_tpu.data import ArrayDataset, DataLoader, get_celeba_loader_from_zip
from ddpm_diffusion_model_tpu.models import UNetDenoiser
from ddpm_diffusion_model_tpu.ops import make_schedule
from ddpm_diffusion_model_tpu.sampling import ddpm_sample
from ddpm_diffusion_model_tpu.training import train_ddpm
from ddpm_diffusion_model_tpu.utils.config import get_preset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--zip-path")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--epochs", type=int, default=10)
    args = ap.parse_args()

    exp = get_preset("celeba64_low")
    model = UNetDenoiser(exp.model, dtype=jnp.bfloat16)
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
        ddpm_sample(model_, params_, sched_, n, img_size, seed=seed, save_path=save_path)

    train_ddpm(
        model, sched, loader,
        train_config=exp.train, epochs=args.epochs,
        sample_every=1, sample_n=36, img_size=64, sample_fn=sample_fn,
        ckpt_dir="checkpoints", run_name=exp.run_name, save_every=2,
        log_every=100, probe_timesteps=[10, 50, 200, 500], log_grad_norm=True,
        configs_for_ckpt={"experiment": exp.to_dict()},
    )


if __name__ == "__main__":
    main()
