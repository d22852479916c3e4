"""Attention A/B at the 64px train step's REAL shapes (batch 128).

profile64.py's anchors attribute ~24 ms/step to AttnBlocks (5x 3.49 ms at
16^2 + 6x 1.03 ms at 8^2 fwd+bwd) — ~11% MFU for the isolated block.  This
measures where it goes: Pallas flash vs XLA SDPA at the real (B,h,N,d),
fwd and fwd+bwd, and the whole AttnBlock per impl — including whether the
nested ``jax.jit`` inside ``multi_head_attention`` (a potential fusion
barrier inside the model trace) costs anything.

Usage: python scripts/profile_attn.py [--steps 4] [--repeats 10]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B = 128


def sync(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=10)
    args = ap.parse_args()

    from ddpm_diffusion_model_tpu.models.blocks import AttnBlock
    from ddpm_diffusion_model_tpu.ops.attention import (
        attention_xla, multi_head_attention,
    )
    from ddpm_diffusion_model_tpu.ops.flash_attention import flash_attention
    from ddpm_diffusion_model_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    R = args.repeats
    print(f"backend={jax.default_backend()} batch={B}", flush=True)

    def graph_repeat_ms(body, x0, steps=None):
        @jax.jit
        def run(x):
            def step(c, _):
                return body(c), None
            c, _ = jax.lax.scan(step, x, None, length=R)
            return c

        for _ in range(2):
            out = run(x0)
        sync(out)
        t0 = time.perf_counter()
        n = steps or args.steps
        for _ in range(n):
            out = run(x0)
        sync(out)
        return (time.perf_counter() - t0) / n / R * 1e3

    # ---- raw attention op at the real shapes
    for n_tok in (256, 64):
        shape = (B, 4, n_tok, 64)
        q = jax.random.normal(jax.random.key(0), shape).astype(jnp.bfloat16)
        flops_fwd = 2 * 2 * B * 4 * n_tok * n_tok * 64  # qk^T + pv

        for name, fn in [
            ("xla_direct", lambda t: attention_xla(t, t, t)),
            ("pallas", lambda t: flash_attention(t, t, t)),
            ("mha_nested_jit", lambda t: multi_head_attention(t, t, t, "xla")),
        ]:
            def body(x, fn=fn):
                y = fn(x)
                return x + 1e-6 * y  # data dependence, O(1) magnitude

            ms = graph_repeat_ms(body, q)
            print(f"attn fwd  N={n_tok:4d} {name:16s} {ms:7.3f} ms  "
                  f"{flops_fwd/ms/1e9:6.1f} TFLOP/s", flush=True)

        for name, fn in [
            ("xla_direct", lambda t: attention_xla(t, t, t)),
            ("pallas", lambda t: flash_attention(t, t, t)),
        ]:
            def body(x, fn=fn):
                def loss(xx):
                    return jnp.sum(fn(xx).astype(jnp.float32) ** 2)
                g = jax.grad(loss)(x)
                return x + 1e-6 * g.astype(x.dtype)

            ms = graph_repeat_ms(body, q)
            print(f"attn f+b  N={n_tok:4d} {name:16s} {ms:7.3f} ms  "
                  f"{3*flops_fwd/ms/1e9:6.1f} TFLOP/s", flush=True)

    # ---- whole AttnBlock (GN + qkv/proj Dense + residual) per impl
    for res, ch in ((16, 256), (8, 256)):
        x0 = jax.random.normal(
            jax.random.key(1), (B, res, res, ch)).astype(jnp.bfloat16)
        for impl in ("auto", "xla", "pallas"):
            blk = AttnBlock(num_heads=4, head_dim=64, dtype=jnp.bfloat16,
                            attn_impl=impl)
            p = blk.init(jax.random.key(0), x0)

            def body(x, blk=blk, p=p):
                def loss(xx):
                    return jnp.mean(blk.apply(p, xx).astype(jnp.float32) ** 2)
                g = jax.grad(loss)(x)
                return x - 1e-3 * g.astype(x.dtype)

            ms = graph_repeat_ms(body, x0)
            print(f"AttnBlock f+b {res}x{res} impl={impl:7s} {ms:7.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
