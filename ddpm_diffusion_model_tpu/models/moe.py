"""Mixture-of-Experts FFN (switch-style top-1 routing) for the DiT family.

Beyond-reference: the reference has exactly one dense denoiser and no MoE
(SURVEY.md §2.6 lists EP as absent).  This layer replaces the DiT block's
dense MLP with E expert MLPs behind a learned router, which is what makes
**expert parallelism** (``parallel/ep.py``) a real, testable strategy row
instead of a documented gap.

TPU-first design choices:

- **Static shapes everywhere.**  Routing uses the Switch Transformer
  capacity recipe (Fedus et al. 2021, arXiv:2101.03961): each sequence
  dispatches at most ``C = ceil(N/E * capacity_factor)`` tokens per expert
  via a one-hot dispatch tensor ``(B, N, E, C)``; overflow tokens are
  dropped (their block output is 0 — the residual stream carries them).
  No gather/scatter with data-dependent shapes, so the whole layer jits to
  fixed MXU work.
- **Dispatch/return as einsums.**  ``x_e = einsum('bnec,bnh->ebch')`` and
  back — XLA turns these one-hot contractions into the dispatch layout
  change; under an active :func:`~..parallel.ep.expert_parallel_mesh` the
  expert-major intermediates are sharding-constrained on the ``expert``
  axis and GSPMD inserts the all-to-alls (GShard pattern).
- **Expert FFNs as one batched matmul.**  Stacked weights ``(E, H, F)`` /
  ``(E, F, H)`` contract in a single ``egh,ehf->egf`` einsum — E experts on
  the MXU at once, no Python loop over experts.
- **fp32 router, bf16 experts.**  Router logits/probabilities and the
  combine weights are fp32 (routing decisions and the gate gradient are
  precision-sensitive); expert matmuls run in the model compute dtype.

The auxiliary load-balance loss (``E * sum_e f_e * P_e``, Switch eq. 4)
is returned alongside the output; ``DiTBlock`` threads it through the
``nn.scan`` ys-output so the train step can add
``moe_aux_weight * mean(aux)`` without any mutable-collection plumbing
(model ``init``/checkpoints stay pure params).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["MoEMlp"]


def _expert_init(scale: float = 1.0):
    """LeCun-normal over (in, out) with the leading expert dim treated as a
    batch axis — per-expert fan-in matches the dense MLP's initializer."""
    return jax.nn.initializers.variance_scaling(
        scale, "fan_in", "truncated_normal", in_axis=-2, out_axis=-1,
        batch_axis=(0,))


class MoEMlp(nn.Module):
    """Top-1 (switch) mixture-of-experts MLP over ``(B, N, H)`` tokens.

    Returns ``(y, aux)``: ``y`` is the gated expert output (same shape/dtype
    as the input; dropped tokens get 0), ``aux`` the scalar fp32 load-balance
    loss for this layer.
    """

    hidden_size: int
    mlp_dim: int
    num_experts: int
    capacity_factor: float = 1.25
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        # trace-time ambient EP context, like AttnBlock's tp import
        from ..parallel.ep import shard_experts

        B, N, H = x.shape
        E = self.num_experts
        F = self.mlp_dim
        if E < 2:
            raise ValueError(f"MoE needs >= 2 experts, got {E}")
        C = max(1, -(-int(N * self.capacity_factor) // E))  # ceil

        # ---- router (fp32) ----
        logits = nn.Dense(E, dtype=jnp.float32, param_dtype=self.param_dtype,
                          name="router")(x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)           # (B, N, E)
        gate = jnp.max(probs, axis=-1)                    # (B, N)
        idx = jnp.argmax(probs, axis=-1)                  # (B, N)

        # position of each token in its expert's queue, per sequence
        # (mask BEFORE the -1 shift: non-selected experts must contribute 0)
        eo = jax.nn.one_hot(idx, E, dtype=jnp.float32)    # (B, N, E)
        pos = (jnp.cumsum(eo, axis=1) - 1.0) * eo         # (B, N, E)
        pos_tok = jnp.sum(pos, axis=-1).astype(jnp.int32)  # (B, N)
        # one_hot maps positions >= C to the zero row — overflow drops out
        slot = jax.nn.one_hot(pos_tok, C, dtype=jnp.float32)  # (B, N, C)
        dispatch = eo[:, :, :, None] * slot[:, :, None, :]    # (B, N, E, C)
        combine = dispatch * gate[:, :, None, None]            # fp32

        # ---- dispatch -> expert FFN -> return ----
        xe = jnp.einsum("bnec,bnh->ebch", dispatch.astype(self.dtype),
                        x.astype(self.dtype))
        xe = shard_experts(xe.reshape(E, B * C, H))        # (E, G, H)
        wi = self.param("wi", _expert_init(), (E, H, F), self.param_dtype)
        bi = self.param("bi", nn.initializers.zeros, (E, F), self.param_dtype)
        wo = self.param("wo", _expert_init(), (E, F, H), self.param_dtype)
        bo = self.param("bo", nn.initializers.zeros, (E, H), self.param_dtype)
        h = jnp.einsum("egh,ehf->egf", xe, wi.astype(self.dtype))
        h = nn.gelu(h + bi.astype(self.dtype)[:, None, :], approximate=True)
        h = shard_experts(h)
        ye = jnp.einsum("egf,efh->egh", h, wo.astype(self.dtype))
        ye = shard_experts(ye + bo.astype(self.dtype)[:, None, :])
        # combine in fp32: gate precision matters for the router gradient
        y = jnp.einsum("ebch,bnec->bnh", ye.reshape(E, B, C, H).astype(
            jnp.float32), combine)

        # ---- Switch load-balance loss: E * sum_e f_e * P_e ----
        f = jnp.mean(eo, axis=(0, 1))                     # dispatch fraction
        p = jnp.mean(probs, axis=(0, 1))                  # mean router prob
        aux = jnp.asarray(E, jnp.float32) * jnp.sum(f * p)
        return y.astype(x.dtype), aux
