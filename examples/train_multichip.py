"""Data-parallel (optionally FSDP) training over a device mesh.

Runs the whole reference workflow — warmup, EMA, probes, checkpoints,
samples — sharded over every available chip.  On a TPU pod slice this is
the scale-out path (XLA emits the gradient all-reduce over ICI); on a dev
box, try it with a virtual mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_multichip.py --synthetic --fsdp
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ddpm_diffusion_model_tpu.data import ArrayDataset, DataLoader, get_celeba_loader_from_zip
from ddpm_diffusion_model_tpu.models import UNetDenoiser
from ddpm_diffusion_model_tpu.ops import make_schedule
from ddpm_diffusion_model_tpu.parallel import initialize_distributed, make_mesh
from ddpm_diffusion_model_tpu.sampling import sample_grid_sharded
from ddpm_diffusion_model_tpu.training import train_ddpm
from ddpm_diffusion_model_tpu.utils.config import get_preset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--zip-path")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--fsdp", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="small model/images for CPU-mesh smoke runs")
    args = ap.parse_args()

    initialize_distributed()  # no-op single-process; multi-host via env
    n_dev = jax.device_count()
    if args.fsdp and n_dev % 2 == 0:
        mesh = make_mesh((n_dev // 2, 2), ("data", "fsdp"))
    else:
        mesh = make_mesh()
    print(f"devices: {n_dev} | mesh: {dict(mesh.shape)} | fsdp={args.fsdp}")

    exp = get_preset("celeba64_low")
    img = 64
    if args.tiny:
        exp = exp.__class__(
            model=exp.model.__class__(
                base_channels=16, channel_mults=(1, 2), num_res_blocks=1,
                attn_resolutions=(8,), time_embed_dim=32, num_heads=2,
                head_dim=8, img_resolution=16,
            ),
            diffusion=exp.diffusion.__class__(T=50, img_size=16),
            train=exp.train.__class__(warmup_steps=10),
            run_name="tiny_dp", img_size=16, batch_size=16, epochs=2,
        )
        img = 16
    model = UNetDenoiser(exp.model, dtype=jnp.bfloat16 if not args.tiny else jnp.float32)
    sched = make_schedule(exp.diffusion)

    # global batch must divide by the data axis
    batch = max(exp.batch_size, mesh.shape["data"] * 4)
    batch -= batch % mesh.shape["data"]

    if args.synthetic or not args.zip_path:
        rng = np.random.default_rng(0)
        arr = np.clip(rng.normal(size=(batch * 8, img, img, 3)) * 0.4, -1, 1).astype(np.float32)
        loader = DataLoader(ArrayDataset(arr), batch, seed=exp.seed)
    else:
        loader = get_celeba_loader_from_zip(
            args.zip_path, img_size=img, batch_size=batch, seed=exp.seed,
        )
        loader.shard_hosts = jax.process_count() > 1

    def sample_fn(model_, params_, sched_, *, n, img_size, save_path, seed):
        # SPMD sampling: each chip denoises its slice of the grid
        n = max(n - n % mesh.shape["data"], mesh.shape["data"])
        return sample_grid_sharded(
            model_, params_, sched_, mesh, kind="ddim", n=n,
            img_size=img_size, save_path=save_path, seed=seed,
            steps=10 if args.tiny else 50)

    train_ddpm(
        model, sched, loader,
        train_config=exp.train, epochs=args.epochs,
        sample_every=1, sample_n=16, img_size=img, sample_fn=sample_fn,
        ckpt_dir="checkpoints", run_name=exp.run_name + "_dp",
        save_every=1, log_every=10,
        mesh=mesh, fsdp=args.fsdp,
        configs_for_ckpt={"experiment": exp.to_dict()},
    )


if __name__ == "__main__":
    main()
