"""Nearest-train-neighbor panel: are generated faces memorized or novel?

Samples 12 faces from a checkpoint (DDIM-50), finds each one's nearest
training image (pixel L2), and writes a 2-row panel (top: samples, bottom:
nearest neighbors) + the distance stats.  Run on the natface64 checkpoint.
"""
import argparse, glob, sys
sys.path.insert(0, ".")
import numpy as np
from PIL import Image

def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--data-dir", default="data/celeba_ref64/celeba")
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--out", default="docs/artifacts/r4/natface_nn.png")
    args = ap.parse_args(argv)

    import jax, jax.numpy as jnp
    from ddpm_diffusion_model_tpu.cli import _exp_from_args, _load_state
    from ddpm_diffusion_model_tpu.sampling.inference import _ddim_jit
    from ddpm_diffusion_model_tpu.sampling.timesteps import build_ddim_schedule
    from ddpm_diffusion_model_tpu.utils.images import save_image_grid

    exp = _exp_from_args(argparse.Namespace(
        config=args.config, preset="celeba64_attn", ckpt=args.ckpt))
    model, sched, state, _ = _load_state(args.ckpt, exp)
    ts = tuple(int(t) for t in build_ddim_schedule("t_linear", 50, sched.T))
    x, _ = _ddim_jit(model, state.ema_params, sched, jax.random.key(99),
                     (args.n, 64, 64, 3), ts, 0.0, None)
    x01 = np.clip((np.asarray(x) + 1.0) / 2.0, 0, 1)

    train = np.stack([np.asarray(Image.open(f)).astype(np.float32) / 255.0
                      for f in sorted(glob.glob(args.data_dir + "/*.jpg"))])
    flat_t = train.reshape(len(train), -1)
    dists = []
    nns = []
    for s in x01:
        d = np.linalg.norm(flat_t - s.reshape(1, -1), axis=1)
        i = int(np.argmin(d))
        nns.append(train[i])
        dists.append(float(d[i]) / np.sqrt(flat_t.shape[1]))
    panel = np.concatenate([x01, np.stack(nns)])
    save_image_grid(panel, args.out, nrow=args.n)
    import json
    print(json.dumps({"rms_dist_nn": [round(d, 4) for d in dists],
                      "mean": round(float(np.mean(dists)), 4),
                      "out": args.out}))

if __name__ == "__main__":
    main()
