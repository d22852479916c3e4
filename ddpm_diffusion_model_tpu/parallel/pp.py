"""Pipeline parallelism (GPipe-style) for the DiT family.

The reference has no parallelism at all, and for the convolutional U-Net
this framework documents PP as out of scope (docs/PARITY.md §2.6: no
uniform layer structure worth staging at 30-70M params).  The DiT family
changes that: its ``depth`` identical blocks are ALREADY stacked along a
leading layer axis by ``nn.scan`` — the canonical shape for a TPU pipeline.
This module stages those blocks over a ``pp`` mesh axis:

- the stacked block params shard stage-major over ``pp`` via ``shard_map``
  (``in_specs=P("pp")`` on the layer axis — S stages hold depth/S
  consecutive blocks each);
- the batch splits into M microbatches; each tick every stage runs its
  local blocks on its current microbatch, then rotates activations to the
  next stage with ``lax.ppermute`` (one ICI hop — the standard TPU
  pipeline transport);
- the schedule is the classic GPipe fill/drain: M + S - 1 ticks, bubble
  fraction (S-1)/(M+S-1);
- **the backward schedule is derived by AD**: differentiating through the
  ``scan``-of-ticks + ``ppermute`` forward yields the reverse pipeline
  (transposed permutes) automatically — no hand-written backward pass.

Scope/limits (deliberate, asserted): deterministic forward only (dropout
would need per-tick rng plumbing through the pipeline — refuse rather than
silently decorrelate), ``scan_blocks=True`` params (the stacked layout IS
the pipeline layout), non-ring attention inside stages (one shard_map at a
time).  Inputs are broadcast to every stage for program uniformity — the
right trade at demo scale; a production variant would feed stage 0 only.

Reference: zero parallelism anywhere in /root/reference (SURVEY.md §2.6);
pipeline pattern per the public scaling-book recipe (scan + ppermute +
collective-matmul-style overlap left to XLA).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.dit import DiTBlock, DiTConfig, _posemb_2d_sincos
from ..models.embeddings import sinusoidal_time_embedding

__all__ = ["pipeline_blocks", "dit_apply_pipelined", "PipelinedDiT"]


def pipeline_blocks(block_fn, stacked_params: Any, tokens: jnp.ndarray,
                    c: jnp.ndarray, mesh: Mesh, axis: str = "pp",
                    microbatches: Optional[int] = None,
                    data_axis: Optional[str] = None) -> jnp.ndarray:
    """Run ``tokens`` through the stacked layers, pipelined over ``axis``.

    ``block_fn(layer_params, tokens_mb, c_mb) -> tokens_mb`` applies ONE
    layer.  ``stacked_params`` leaves have a leading layer axis L divisible
    by the stage count S; ``tokens`` is (B, N, H) with B divisible by the
    microbatch count M (default S).  Returns (B, N, H), replicated.

    With ``data_axis`` (DP x PP on a 2-D mesh): the microbatch dim shards
    over ``data_axis`` — each data slice runs its own pipeline over the
    same stage-sharded params, with zero cross-slice communication.
    """
    S = int(mesh.shape[axis])
    L = int(jax.tree.leaves(stacked_params)[0].shape[0])
    if L % S:
        raise ValueError(f"depth {L} not divisible by {S} pipeline stages")
    B, N, H = tokens.shape
    M = int(microbatches) if microbatches else S
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mb = B // M
    D = int(mesh.shape[data_axis]) if data_axis else 1
    if mb % D:
        raise ValueError(
            f"microbatch size {mb} not divisible by mesh axis "
            f"{data_axis!r} ({D})")
    xs = tokens.reshape(M, mb, N, H)
    cs = c.reshape(M, mb, c.shape[-1])

    def per_stage(p_local, xs, cs):
        s = jax.lax.axis_index(axis)
        T = M + S - 1

        def stage_compute(tok, cc):
            def layer(tok, lp):
                return block_fn(lp, tok, cc), None

            out, _ = jax.lax.scan(layer, tok, p_local)
            return out

        def tick(carry, tt):
            buf, ys = carry
            m = tt - s  # microbatch this stage works on this tick
            valid = (m >= 0) & (m < M)
            mi = jnp.clip(m, 0, M - 1)
            # stage 0 ingests fresh microbatches; later stages consume the
            # activation rotated in from the previous stage last tick
            inp = jnp.where(s == 0, xs[mi], buf)
            out = stage_compute(inp, cs[mi])
            out = jnp.where(valid, out, buf)  # hold garbage stable in bubbles
            # the last stage banks its completed microbatch
            take = valid & (s == S - 1)
            ys = ys.at[mi].set(jnp.where(take, out, ys[mi]))
            nxt = jax.lax.ppermute(
                out, axis, [(i, (i + 1) % S) for i in range(S)])
            return (nxt, ys), None

        mb_local = xs.shape[1]  # mb/D under a data_axis, mb otherwise
        init = (jnp.zeros((mb_local, N, H), tokens.dtype),
                jnp.zeros((M, mb_local, N, H), tokens.dtype))
        (_, ys), _ = jax.lax.scan(tick, init, jnp.arange(T))
        # only the last stage holds real outputs — psum-broadcast them
        ys = jax.lax.psum(
            jnp.where(s == S - 1, ys, jnp.zeros_like(ys)), axis)
        return ys

    from jax import shard_map  # jax>=0.8 home (was jax.experimental)

    mb_spec = P(None, data_axis) if data_axis else P()
    out = shard_map(
        per_stage, mesh=mesh,
        in_specs=(P(axis), mb_spec, mb_spec),
        out_specs=mb_spec,
        check_vma=False,  # the psum-select breaks shard_map's rep inference
    )(stacked_params, xs, cs)
    return out.reshape(B, N, H)


def _ln(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """fp32 LayerNorm, no affine — mirrors the module's nn.LayerNorm."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _dense(tree: Any, name: str, x: jnp.ndarray, dtype) -> jnp.ndarray:
    k = tree[name]
    return x.astype(dtype) @ k["kernel"].astype(dtype) + k["bias"].astype(dtype)


def dit_apply_pipelined(model, params: Any, x: jnp.ndarray, t: jnp.ndarray,
                        mesh: Mesh = None, axis: str = "pp",
                        microbatches: Optional[int] = None,
                        data_axis: Optional[str] = None,
                        y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``model.apply(params, x, t)`` with the transformer blocks pipelined.

    Embed and head run replicated (they are <2% of the FLOPs); the depth
    blocks run through :func:`pipeline_blocks`.  Equality with the plain
    forward is pinned by ``tests/test_dit_pipeline.py``.
    """
    cfg: DiTConfig = model.config
    if cfg.dropout:
        raise ValueError("pipelined apply is deterministic — dropout>0 "
                         "configs must sample/evaluate with dropout off")
    if getattr(cfg, "num_experts", 0):
        raise ValueError("pipeline stages assume the dense-MLP block; "
                         "MoE configs parallelize over the 'expert' axis "
                         "instead (parallel/ep.py) — PP x EP staging is "
                         "not supported")
    if not model.scan_blocks:
        raise ValueError("pipeline needs scan_blocks=True (stacked params)")
    if model.attn_impl == "ring":
        raise ValueError("ring attention cannot nest inside the pipeline's "
                         "shard_map — use xla/pallas attention per stage")
    tree = params["params"] if "params" in params else params
    p = cfg.patch_size
    B, Hi, Wi, C = x.shape
    hp, wp = Hi // p, Wi // p
    in_dtype = x.dtype

    # ---- embed (mirrors DiTDenoiser.__call__'s patchify + conditioning;
    # the equality test keeps this mirror honest) ----
    tok = x.astype(model.dtype).reshape(B, hp, p, wp, p, C)
    tok = tok.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp * wp, p * p * C)
    tok = _dense(tree, "patch_embed", tok, model.dtype)
    pos = jnp.asarray(_posemb_2d_sincos(hp, wp, cfg.hidden_size))
    tok = tok + pos.astype(model.dtype)[None]
    c = sinusoidal_time_embedding(t, cfg.time_embed_dim)
    c = _dense(tree, "t_fc1", c, jnp.float32)
    c = _dense(tree, "t_fc2", jax.nn.silu(c), jnp.float32)
    if getattr(cfg, "num_classes", 0):
        if y is None:
            y = jnp.full((B,), cfg.num_classes, jnp.int32)
        c = c + tree["class_emb"]["embedding"].astype(jnp.float32)[
            jnp.asarray(y, jnp.int32)]
    elif y is not None:
        raise ValueError("labels passed to an unconditional model")

    # ---- pipelined blocks ----
    block = DiTBlock(
        hidden_size=cfg.hidden_size, num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio, dropout=0.0, deterministic=True,
        attn_impl=model.attn_impl, dtype=model.dtype,
        param_dtype=model.param_dtype)

    def block_fn(layer_p, tok_mb, c_mb):
        return block.apply({"params": layer_p}, tok_mb, c_mb)[0]

    tok = pipeline_blocks(block_fn, tree["blocks"], tok, c, mesh,
                          axis=axis, microbatches=microbatches,
                          data_axis=data_axis)

    # ---- head (mirrors the module's final adaLN + zero-init projection) --
    mods = _dense(tree, "final_ada", jax.nn.silu(c), jnp.float32)
    shift, scale = [m[:, None, :] for m in jnp.split(mods, 2, axis=-1)]
    h = (_ln(tok) * (1.0 + scale) + shift).astype(model.dtype)
    out = _dense(tree, "final_proj", h, jnp.float32)
    out = out.reshape(B, hp, wp, p, p, cfg.in_channels)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hi, Wi, cfg.in_channels)
    return out.astype(in_dtype)


class PipelinedDiT:
    """Model-shim exposing the ``UNetDenoiser``-style ``.apply`` contract
    with the blocks pipelined — so the STANDARD train step
    (``training.step.make_train_step``) and samplers run pipeline-parallel
    without modification:

        step = make_train_step(PipelinedDiT(model, mesh), sched, tx, cfg)

    The backward pipeline comes from AD (module docstring); the optimizer
    update runs replicated on the full param tree (the stage-sharding is a
    shard_map-interior view — params enter and leave as one array).
    Requires ``dropout == 0`` (the pipeline carries no per-tick rng); the
    constructor enforces it so the train step's ``deterministic=False``
    call is a no-op distinction.
    """

    def __init__(self, model, mesh: Mesh, axis: str = "pp",
                 microbatches: Optional[int] = None,
                 data_axis: Optional[str] = None):
        if model.config.dropout:
            raise ValueError("PipelinedDiT requires dropout == 0 — the "
                             "pipeline carries no per-tick rng stream")
        self.model = model
        self.config = model.config
        self.dtype = model.dtype
        self.mesh = mesh
        self.axis = axis
        self.microbatches = microbatches
        self.data_axis = data_axis

    def apply(self, params, x, t, y=None, *, deterministic: bool = True,
              rngs=None, **kw):
        del deterministic, rngs  # dropout==0: train and eval coincide
        if kw:
            raise TypeError(f"unsupported apply options: {sorted(kw)}")
        return dit_apply_pipelined(
            self.model, params, x, t, self.mesh, axis=self.axis,
            microbatches=self.microbatches, data_axis=self.data_axis, y=y)

    def init(self, *a, **k):
        return self.model.init(*a, **k)
