"""Dropout mask-generation ablation at the 64px train step's real workload.

Round-3 follow-up to scripts/profile64.py: the r2 attribution showed dropout
cost ~45 ms/step with threefry (fwd+bwd) and ~6-8 ms with the rbg stream;
the round-3 "packed" (8-bit) path measured ~8 ms SLOWER than plain rbg
bernoulli in a same-session step A/B.  This script times the mask variants
head-to-head at the exact per-step mask workload (22 ResBlock sites, batch
128: 5x 64^2x128 + 5x 32^2x256 + 5x 16^2x256 + 7x 8^2x256 = 560M draws),
in-graph amortized so the tunnel dispatch floor divides away.

Variants:
  none            apply-only control (x * 1.1 summed) — floor
  bern_threefry   jax.random.bernoulli, threefry2x32 key (r1 default)
  bern_rbg        jax.random.bernoulli, rbg key        (r2 default)
  u32cmp_rbg      uint32 bits + integer compare (no float convert)
  packed_cur      ops.dropout packed path (bitcast trailing 4 + reshape)
  packed_sublane  8 bits/elem via shift/mask unpack along W (lane-friendly)
  u8bits_rbg      jax.random.bits(..., uint8) direct

Usage: python scripts/profile_dropout.py [--steps 4] [--repeats 8]

Measured (v5e, 2026-08-17, mask cost over the 1.2 ms apply-only floor):
  bern_threefry 11.7 | bern_rbg 5.7 | u32cmp_rbg 6.1 | packed_cur 0.92 |
  packed_sublane 1.26 | u8bits_rbg 0.90 | u8bits_threefry ~12.4  (ms)
Conclusions: (1) float-uniform conversion + fp compare dominate bernoulli,
not bit generation; (2) under rbg, direct uint8 draws are as cheap as
word-packed ones with none of the relayout risk; (3) cheap uint8 bits are
an rbg-only property — threefry pays a full word per element either way.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# (shape, sites) — the 64px attention U-Net's dropout sites at batch 128:
# enc 2 + dec 3 ResBlocks at levels 0-2, enc 2 + dec 3 + mid 2 at level 3.
B = 128
SITES = [
    ((B, 64, 64, 128), 5),
    ((B, 32, 32, 256), 5),
    ((B, 16, 16, 256), 5),
    ((B, 8, 8, 256), 7),
]
RATE = 0.1


def sync(x):
    return float(jax.device_get(x))


def mask_bern(key, shape):
    return jax.random.bernoulli(key, 1.0 - RATE, shape)


def mask_u32cmp(key, shape):
    t32 = np.uint32(round(RATE * (2.0**32)))
    bits = jax.random.bits(key, shape, jnp.uint32)
    return bits >= t32


def mask_packed_cur(key, shape):
    from ddpm_diffusion_model_tpu.ops.dropout import _uint8_bits

    t = np.uint8(round(RATE * 256))
    return _uint8_bits(key, shape) >= t


def mask_packed_sublane(key, shape):
    """8 bits/element: one uint32 word per 4 elements along W, unpacked by
    shift/mask so the lane (C) axis never changes — the (W//4, 4) -> W merge
    is a sublane-major reshape, which is layout-free on TPU."""
    b, h, w, c = shape
    assert w % 4 == 0
    t = np.uint32(round(RATE * 256))
    words = jax.random.bits(key, (b, h, w // 4, 1, c), jnp.uint32)
    shifts = jnp.arange(4, dtype=jnp.uint32).reshape(1, 1, 1, 4, 1) * 8
    bytes_ = (words >> shifts) & jnp.uint32(0xFF)  # (b,h,w//4,4,c)
    return (bytes_ >= t).reshape(shape)


def mask_u8bits(key, shape):
    t = np.uint8(round(RATE * 256))
    return jax.random.bits(key, shape, jnp.uint8) >= t


VARIANTS = {
    "none": None,
    "bern_threefry": ("threefry2x32", mask_bern),
    "bern_rbg": ("rbg", mask_bern),
    "u32cmp_rbg": ("rbg", mask_u32cmp),
    "packed_cur": ("rbg", mask_packed_cur),
    "packed_sublane": ("rbg", mask_packed_sublane),
    "u8bits_rbg": ("rbg", mask_u8bits),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--only", type=str, default=None,
                    help="comma list of variant names")
    args = ap.parse_args()

    from ddpm_diffusion_model_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    print(f"backend={jax.default_backend()} batch={B} "
          f"workload={sum(np.prod(s) * n for s, n in SITES)/1e6:.0f}M draws",
          flush=True)

    xs = [jnp.full(s, 0.5, jnp.bfloat16) for s, _ in SITES]
    scale = 1.0 / (1.0 - RATE)

    names = (args.only.split(",") if args.only else list(VARIANTS))
    results = {}
    for name in names:
        spec = VARIANTS[name]

        def body(carry):
            key, acc = carry
            key = jax.random.fold_in(key, 1)
            i = 0
            for x, (shape, n_sites) in zip(xs, SITES):
                for _ in range(n_sites):
                    i += 1
                    if spec is None:
                        y = x * jnp.bfloat16(scale)
                    else:
                        k = jax.random.fold_in(key, i)
                        keep = spec[1](k, shape)
                        y = jnp.where(keep, x * jnp.bfloat16(scale),
                                      jnp.zeros((), x.dtype))
                    acc = acc + jnp.sum(y.astype(jnp.float32))
            return key, acc

        @jax.jit
        def run(key, acc):
            def step(c, _):
                return body(c), None
            (key, acc), _ = jax.lax.scan(step, (key, acc), None,
                                         length=args.repeats)
            return key, acc

        key0 = jax.random.key(7, impl=(spec[0] if spec else "threefry2x32"))
        acc0 = jnp.float32(0)
        for _ in range(2):
            out = run(key0, acc0)
        sync(out[1])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = run(key0, acc0)
        sync(out[1])
        ms = (time.perf_counter() - t0) / args.steps / args.repeats * 1e3
        results[name] = ms
        print(f"{name:16s} {ms:8.2f} ms / step-workload", flush=True)

    if "none" in results:
        floor = results["none"]
        print("---- mask cost over apply-only floor ----", flush=True)
        for name, ms in results.items():
            if name != "none":
                print(f"{name:16s} {ms - floor:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
