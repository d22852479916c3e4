"""Attributed step breakdown for the CelebA-64 attention train config.

Round-2 follow-up to scripts/profile256.py: the 64px headline config runs at
52% MFU while the 256px config reaches 72%.  This measures WHERE the other
48% goes, by ablation (each component as its own jitted program at its real
shape, batch 128, bf16), with tunnel-safe syncs (host fetches).

Components timed:
  - full train step (batch 128, accum 1)      <- the 151 ms baseline
  - fwd-only loss, train mode (dropout on)    <- the step's real forward
  - fwd-only loss, eval mode  (dropout off)   <- isolates dropout mask cost
  - bare model fwd (no loss machinery)
  - optimizer tail (AdamW update + EMA at the real 31M tree)
  - per-level ResBlock fwd+bwd + conv anchors
  - AttnBlock fwd+bwd at 16^2 and 8^2
  - RNG mask generation: threefry vs rbg at dropout-mask sizes

Usage: python scripts/profile64.py [--steps 10]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaves = [l for l in jax.tree.leaves(x)
              if not jnp.issubdtype(getattr(l, "dtype", None), jax.dtypes.prng_key)]
    return float(jax.device_get(jnp.sum(leaves[0])))


def timeit(fn, *args, steps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--skip-blocks", action="store_true")
    args = ap.parse_args()

    from ddpm_diffusion_model_tpu.models import UNetDenoiser, unet_64x64_config
    from ddpm_diffusion_model_tpu.models.blocks import AttnBlock, ResBlock
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.training import (
        TrainConfig, init_train_state, make_optimizer, make_train_step,
    )
    from ddpm_diffusion_model_tpu.training.step import make_loss_fn
    from ddpm_diffusion_model_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    B = args.batch
    print(f"backend={jax.default_backend()} batch={B}", flush=True)

    rows = []

    def report(name, ms, note=""):
        rows.append((name, ms, note))
        print(f"{name:40s} {ms:9.2f} ms  {note}", flush=True)

    # ---- full step + forward variants
    mcfg = unet_64x64_config()
    model = UNetDenoiser(mcfg, dtype=jnp.bfloat16, remat=False)
    sched = make_schedule(DiffusionConfig(T=1000, img_size=64))
    tcfg = TrainConfig(base_lr=2e-4, warmup_steps=1000, grad_accum_steps=1,
                       ema_decay=0.9997)
    params = model.init(jax.random.key(0), jnp.ones((1, 64, 64, 3)),
                        jnp.zeros((1,)))
    tx = make_optimizer(tcfg)
    state, _ = init_train_state(params, tcfg, tx=tx)
    step = make_train_step(model, sched, tx, tcfg)
    batch = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, 64, 64, 3)).astype(np.float32)
        * 0.5
    )

    # full step (can't reuse donated state in timeit; rebind each call)
    st = state
    for _ in range(3):
        st, m = step(st, batch)
    sync(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        st, m = step(st, batch)
    sync(m["loss"])
    full_ms = (time.perf_counter() - t0) / args.steps * 1e3
    report("FULL train step (accum 1)", full_ms, f"{B / (full_ms / 1e3):7.1f} imgs/s")
    params = st.params

    # fwd-only loss, train mode (dropout active, fresh t/noise).
    # NB: thread the rbg dropout stream like the real step does
    # (TrainConfig.dropout_rng_impl="rbg") — with the default threefry
    # stream this row charges uint8 mask bits at a full threefry word per
    # element (~12 ms extra) that the shipped step never pays.
    loss_fn = jax.jit(make_loss_fn(model, sched, dropout_rng_impl="rbg"))
    ms_train = timeit(lambda: loss_fn(params, batch, jax.random.key(1)),
                      steps=args.steps)
    report("fwd loss, train mode (dropout on)", ms_train)

    # fwd-only loss, eval mode: same machinery, deterministic model
    def eval_loss(p, x, key):
        from ddpm_diffusion_model_tpu.ops.diffusion import (
            loss_simple, sample_timesteps,
        )
        kt, kn = jax.random.split(key)
        t = sample_timesteps(kt, x.shape[0], sched.T)
        noise = jax.random.normal(kn, x.shape, dtype=jnp.float32)
        return loss_simple(
            sched, lambda xt, tt: model.apply(p, xt, tt, deterministic=True),
            x, t, noise)

    eval_loss_j = jax.jit(eval_loss)
    ms_eval = timeit(lambda: eval_loss_j(params, batch, jax.random.key(1)),
                     steps=args.steps)
    report("fwd loss, eval mode (dropout off)", ms_eval,
           f"dropout fwd cost ~{ms_train - ms_eval:.1f} ms")

    # fwd+bwd, train vs eval mode — dropout cost in the real step.
    # NB: the grads MUST flow into the returned scalar or XLA dead-code
    # eliminates the entire backward pass (a flaw the first version of this
    # script — and profile256.py's block rows — had).
    def grad_sum(g):
        return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(g))

    def fwdbwd(p, x, key, det):
        from ddpm_diffusion_model_tpu.training.step import _dropout_key

        def lf(pp):
            from ddpm_diffusion_model_tpu.ops.diffusion import (
                loss_simple, sample_timesteps,
            )
            kt, kn, kd = jax.random.split(key, 3)
            kd = _dropout_key(kd, "rbg")  # match the real step's stream
            t = sample_timesteps(kt, x.shape[0], sched.T)
            noise = jax.random.normal(kn, x.shape, dtype=jnp.float32)
            if det:
                eps = lambda xt, tt: model.apply(pp, xt, tt, deterministic=True)
            else:
                eps = lambda xt, tt: model.apply(
                    pp, xt, tt, deterministic=False, rngs={"dropout": kd})
            return loss_simple(sched, eps, x, t, noise)
        l, g = jax.value_and_grad(lf)(p)
        return l + grad_sum(g)  # 0.0* would invite algebraic-simplifier DCE

    fb_train = jax.jit(lambda p, x, k: fwdbwd(p, x, k, False))
    fb_eval = jax.jit(lambda p, x, k: fwdbwd(p, x, k, True))
    ms_fbt = timeit(lambda: fb_train(params, batch, jax.random.key(1)),
                    steps=args.steps)
    report("fwd+bwd, train mode", ms_fbt)
    ms_fbe = timeit(lambda: fb_eval(params, batch, jax.random.key(1)),
                    steps=args.steps)
    report("fwd+bwd, eval mode", ms_fbe,
           f"dropout total cost ~{ms_fbt - ms_fbe:.1f} ms")

    # ------------------------------------------------------------------
    # Component rows: repeated IN-GRAPH (lax.scan threading the output into
    # the next input) so the ~3-5 ms tunnel dispatch floor amortizes away.
    # ------------------------------------------------------------------
    R = 10  # in-graph repeats

    def graph_repeat_ms(make_body, carry, steps=4):
        """time one jit that runs make_body R times with data dependence."""

        @jax.jit
        def run(carry):
            def body(c, _):
                return make_body(c), None
            c, _ = jax.lax.scan(body, carry, None, length=R)
            return c

        for _ in range(2):
            out = run(carry)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = run(carry)
        sync(out)
        return (time.perf_counter() - t0) / steps / R * 1e3

    # optimizer tail at the real tree (tree-structured, as in the train step)
    import optax

    ema = jax.tree.map(jnp.copy, params)

    # the TREE baseline needs an explicitly un-flattened optimizer —
    # TrainConfig.flat_optimizer now defaults True, so reusing `tx` here
    # would silently benchmark the raveled path against itself
    tcfg_tree = TrainConfig(base_lr=2e-4, warmup_steps=1000,
                            grad_accum_steps=1, ema_decay=0.9997,
                            flat_optimizer=False)
    tx_tree = make_optimizer(tcfg_tree)
    opt_state_tree = tx_tree.init(params)

    def opt_body_tree(c):
        p, s, e = c
        g = jax.tree.map(lambda q: q * 1e-6 + 1e-4, p)
        gn = optax.global_norm(g)
        updates, s = tx_tree.update(g, s, p)
        p = optax.apply_updates(p, updates)
        e = jax.tree.map(lambda a, q: a * 0.9997 + 0.0003 * q, e, p)
        return (p, s, e)

    ms = graph_repeat_ms(opt_body_tree, (params, opt_state_tree, ema))
    report("optimizer tail, tree (clip+AdamW+EMA)", ms, "in-graph amortized")

    # same math on ONE flat fp32 vector (what a flattened optimizer would do)
    from jax.flatten_util import ravel_pytree

    flat_p, unravel = ravel_pytree(params)
    # the plain chain applied to one flat leaf (NOT the flatten-wrapped tx,
    # which would ravel the already-flat vector again)
    flat_opt = tx_tree.init(flat_p)

    def opt_body_flat(c):
        p, s, e = c
        g = p * 1e-6 + 1e-4
        gn = jnp.sqrt(jnp.vdot(g, g))
        updates, s = tx_tree.update(g, s, p)
        p = optax.apply_updates(p, updates)
        e = e * 0.9997 + 0.0003 * p
        return (p, s, e)

    ms = graph_repeat_ms(opt_body_flat, (flat_p, flat_opt, flat_p))
    report("optimizer tail, FLAT vector", ms, "in-graph amortized")

    # flat vector with bf16 first moment (TrainConfig.moment_dtype): -25%
    # of the optimizer-state HBM traffic; is the tail bandwidth-bound?
    tcfg_bf = TrainConfig(base_lr=2e-4, warmup_steps=1000, grad_accum_steps=1,
                          ema_decay=0.9997, flat_optimizer=False,
                          moment_dtype="bfloat16")
    tx_bf = make_optimizer(tcfg_bf)
    opt_bf = tx_bf.init(flat_p)

    def opt_body_flat_bf(c):
        p, s, e = c
        g = p * 1e-6 + 1e-4
        updates, s = tx_bf.update(g, s, p)
        p = optax.apply_updates(p, updates)
        e = e * 0.9997 + 0.0003 * p
        return (p, s, e)

    ms = graph_repeat_ms(opt_body_flat_bf, (flat_p, opt_bf, flat_p))
    report("optimizer tail, FLAT + bf16 mu", ms, "in-graph amortized")

    # unravel cost (flat -> tree, the extra step a flat optimizer pays)
    def unravel_body(c):
        tree = unravel(c)
        return ravel_pytree(tree)[0]

    ms = graph_repeat_ms(unravel_body, flat_p)
    report("ravel+unravel round trip", ms, "in-graph amortized")

    # ---- RNG mask generation cost: threefry vs rbg at dropout sizes
    n_mask = B * 64 * 64 * 128  # the L0 activation size
    for impl in ("threefry2x32", "rbg"):
        key0 = jax.random.key(7, impl=impl)

        def rng_body(c):
            key, acc = c
            key = jax.random.fold_in(key, 1)
            m = jax.random.bernoulli(key, 0.9, (n_mask,))
            return (key, acc + jnp.sum(m.astype(jnp.float32)))

        ms = graph_repeat_ms(rng_body, (key0, jnp.float32(0)))
        report(f"bernoulli {n_mask/1e6:.0f}M ({impl})", ms, "in-graph amortized")

    if not args.skip_blocks:
        # ---- per-level blocks: 64px attn U-Net levels
        LEVELS = [
            ("L0 64x64x128", (B, 64, 64, 128), 128, False),
            ("L1 32x32x256", (B, 32, 32, 256), 256, False),
            ("L2 16x16x256", (B, 16, 16, 256), 256, True),
            ("L3   8x8x256", (B, 8, 8, 256), 256, True),
        ]
        t_emb = jnp.ones((B, 512), jnp.float32)
        for name, shape, ch, has_attn in LEVELS:
            x0 = jax.random.normal(jax.random.key(1), shape).astype(jnp.bfloat16)
            w = (jax.random.normal(jax.random.key(2), (3, 3, ch, ch))
                 * (1.0 / (3 * ch))).astype(jnp.bfloat16)

            def conv_body(x):
                return jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)

            ms = graph_repeat_ms(conv_body, x0)
            gflop = 2 * np.prod(shape) * 9 * ch / 1e9
            report(f"conv3x3 fwd {name}", ms,
                   f"{gflop / ms:7.1f} TFLOP/s ({gflop:.0f} GFLOP)")

            blk = ResBlock(out_ch=ch, dtype=jnp.bfloat16, dropout=0.1,
                           deterministic=True)
            bp = blk.init(jax.random.key(0), x0, t_emb)

            def rb_body(x):
                def loss(p, xx):
                    return jnp.mean(blk.apply(p, xx, t_emb).astype(jnp.float32) ** 2)
                l, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(bp, x)
                # keep both grads alive; x stays O(1) so repeats don't blow up
                return (x - 1e-3 * gx.astype(x.dtype)
                        + (1e-20 * grad_sum(gp)).astype(x.dtype))

            ms = graph_repeat_ms(rb_body, x0)
            report(f"ResBlock fwd+bwd {name}", ms)

            if has_attn:
                attn = AttnBlock(num_heads=4, head_dim=64, dtype=jnp.bfloat16)
                pa = attn.init(jax.random.key(0), x0)

                def attn_body(x):
                    def loss(pp, xx):
                        return jnp.mean(attn.apply(pp, xx).astype(jnp.float32) ** 2)
                    l, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(pa, x)
                    return (x - 1e-3 * gx.astype(x.dtype)
                            + (1e-20 * grad_sum(gp)).astype(x.dtype))

                ms = graph_repeat_ms(attn_body, x0)
                report(f"AttnBlock fwd+bwd {name}", ms)

    print("---- summary ----")
    for name, ms, note in rows:
        print(f"{name:40s} {ms:9.2f} ms  {note}")


if __name__ == "__main__":
    main()
