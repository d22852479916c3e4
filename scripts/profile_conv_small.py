"""Conv3x3 A/B at the U-Net's DEEP-level shapes: XLA conv vs shifted-matmul.

The 64px roofline (docs/BENCH.md) shows per-level MXU efficiency collapsing
as the spatial map shrinks: conv3x3 fwd at 8x8x256 runs at ~6% of peak and
16x16x256 at ~22% — XLA tiles convs spatially, and at 8x8 the 64 output
positions cannot fill the 128-lane systolic tiles.  This measures an
alternative formulation that flattens batch*positions into the matmul M
dimension: SAME-pad the input once, then accumulate 9 shifted
[B*H*W, C] @ [C, Co] matmuls (one per kernel tap).  M = 128*64 = 8192 at
L3 — full MXU tiles regardless of spatial size.  Plain JAX, so autodiff
and fusion come free; if it wins, it ships as a dispatch in the model's
conv path, no Pallas needed.

Usage: python scripts/profile_conv_small.py [--repeats 20]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def conv_xla(x, w):
    # exactly what flax nn.Conv emits for bf16 params/inputs (MXU still
    # accumulates fp32 internally); preferred_element_type is omitted — its
    # transpose rule rejects the bf16/fp32 cotangent mix under autodiff
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_shifted(x, w):
    """SAME conv3x3 as 9 batch-flattened matmuls accumulated in fp32."""
    b, h, wd, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b * h * wd, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, wd, c))
            acc += jnp.dot(win.reshape(b * h * wd, c), w[dy, dx],
                           preferred_element_type=jnp.float32)
    return acc.reshape(b, h, wd, co).astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=20)
    args = ap.parse_args()
    from ddpm_diffusion_model_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    R = args.repeats
    print(f"backend={jax.default_backend()}", flush=True)

    def graph_ms(body, x, w):
        """Time body(x, w) -> x-like, repeated R times in one jitted scan."""
        @jax.jit
        def run(xx, ww):
            def step(c, _):
                return body(c, ww), None
            c, _ = jax.lax.scan(step, xx, None, length=R)
            return c
        for _ in range(2):
            out = run(x, w)
        sync(out)
        t0 = time.perf_counter()
        sync(run(x, w))
        return (time.perf_counter() - t0) / R * 1e3

    key = jax.random.key(0)
    shapes = [
        ("L3  8x8x256", (128, 8, 8, 256), 256),
        ("L2 16x16x256", (128, 16, 16, 256), 256),
        ("L1 32x32x256", (128, 32, 32, 256), 256),
    ]
    for name, xs, co in shapes:
        b, h, wd, c = xs
        x = jax.random.normal(key, xs, jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, c, co), jnp.bfloat16) * 0.05
        gflop = 2 * b * h * wd * c * co * 9 / 1e9

        ref = np.asarray(jax.jit(conv_xla)(x, w), np.float32)
        alt = np.asarray(jax.jit(conv_shifted)(x, w), np.float32)
        rel = np.abs(ref - alt).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 2e-2, f"{name}: shifted9 mismatch rel={rel}"

        for label, fn in (("xla_conv", conv_xla), ("shifted9", conv_shifted)):
            # body maps x -> x-like (co == c here) so the scan carries it
            ms = graph_ms(lambda xx, ww, fn=fn: fn(xx, ww) * 0.01, x, w)
            print(f"conv fwd {name} {label:10s} {ms:8.3f} ms  "
                  f"{gflop / ms:7.1f} TFLOP/s", flush=True)

        def loss_of(fn):
            def f(xx, ww):
                return jnp.sum(fn(xx, ww).astype(jnp.float32) ** 2) * 1e-6
            return f

        for label, fn in (("xla_conv", conv_xla), ("shifted9", conv_shifted)):
            g = jax.grad(loss_of(fn), argnums=(0, 1))

            def body(xx, ww):
                gx, gw = g(xx, ww)
                return ((xx - 0.0 * gx).astype(xx.dtype),
                        (ww - 0.0 * gw).astype(ww.dtype))

            @jax.jit
            def run(xx, ww):
                def step(c, _):
                    return body(*c), None
                (cx, cw), _ = jax.lax.scan(step, (xx, ww), None, length=R)
                return cx

            for _ in range(2):
                out = run(x, w)
            sync(out)
            t0 = time.perf_counter()
            sync(run(x, w))
            ms = (time.perf_counter() - t0) / R * 1e3
            print(f"conv f+b {name} {label:10s} {ms:8.3f} ms  "
                  f"{3 * gflop / ms:7.1f} TFLOP/s", flush=True)
    print("RC=0")


if __name__ == "__main__":
    main()
