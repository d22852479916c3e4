"""Exponential moving average of parameters — pytree-native.

TPU-native redesign of the reference's index-aligned tensor-list EMA
(``src/training_loops/ema.py:3-41``): the shadow is simply a params-shaped
pytree carried inside the train state, updated with one fused ``tree.map``
lerp inside the jitted train step.  ``copy_to``'s state-dict surgery
(``ema.py:26-31``) dissolves — samplers take ``ema_params`` directly.

The health-check / repair machinery (``ema.py:46-100``) is preserved with
identical semantics: length mismatch, non-finite shadow, ~zero norms, and
relative drift ||m - e|| / ||m|| > rel_tol all mark the EMA invalid.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "ema_init",
    "ema_update",
    "ema_health",
    "ema_reinit_from_params",
]

Params = Any


def ema_init(params: Params) -> Params:
    """Shadow starts as a copy of the params (``ema.py:9-13``).

    A REAL copy — the train step donates the whole state, and aliased
    params/ema buffers would be donated twice."""
    return jax.tree.map(lambda p: jnp.array(p, copy=True), params)


def ema_update(ema_params: Params, params: Params, decay,
               flat: bool = False) -> Params:
    """shadow <- decay * shadow + (1 - decay) * params (``ema.py:15-23``).

    ``decay`` may be a traced scalar (it lives in the train state so it can
    be overridden at resume without recompiling).

    ``flat=True`` runs ONE lerp over raveled vectors instead of ~300 leaf
    kernels (the same dispatch-tail motivation as ``flat_optimizer``,
    docs/BENCH.md "optimizer tail").  Bit-exact: the lerp is elementwise,
    raveling only reorders memory.  Only valid when every leaf is floating
    (true for every model family here — params are fp32 by convention).
    """
    d = jnp.asarray(decay, dtype=jnp.float32)
    if flat:
        from jax.flatten_util import ravel_pytree

        flat_e, unravel = ravel_pytree(ema_params)
        flat_p, _ = ravel_pytree(params)
        out = d * flat_e.astype(jnp.float32) + (1.0 - d) * flat_p.astype(
            jnp.float32)
        return unravel(out.astype(flat_e.dtype))
    return jax.tree.map(
        lambda e, p: (d * e.astype(jnp.float32)
                      + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
        ema_params,
        params,
    )


def _global_norm(tree: Params) -> jnp.ndarray:
    leaves = [jnp.sum(jnp.square(l.astype(jnp.float32))) for l in jax.tree.leaves(tree)]
    return jnp.sqrt(sum(leaves)) if leaves else jnp.asarray(0.0)


def ema_health(
    ema_params: Params, params: Params, rel_tol: float = 5.0
) -> Tuple[bool, str, float]:
    """(ok, reason, rel_diff) with the reference's exact failure taxonomy
    (``ema.py:46-83``): len_mismatch | nan_or_inf_in_ema | ema_zero_norm |
    model_zero_norm | large_rel_diff | ok."""
    e_leaves = jax.tree.leaves(ema_params)
    m_leaves = jax.tree.leaves(params)
    if len(e_leaves) != len(m_leaves) or any(
        e.shape != m.shape for e, m in zip(e_leaves, m_leaves)
    ):
        return False, "len_mismatch", float("inf")

    finite = all(bool(jnp.all(jnp.isfinite(l))) for l in e_leaves)
    if not finite:
        return False, "nan_or_inf_in_ema", float("inf")

    e_norm = float(_global_norm(ema_params))
    m_norm = float(_global_norm(params))
    if e_norm < 1e-12:
        return False, "ema_zero_norm", float("inf")
    if m_norm < 1e-12:
        return False, "model_zero_norm", float("inf")

    diff = jax.tree.map(
        lambda m, e: m.astype(jnp.float32) - e.astype(jnp.float32), params, ema_params
    )
    rel = float(_global_norm(diff)) / (m_norm + 1e-8)
    if rel > rel_tol:
        return False, "large_rel_diff", rel
    return True, "ok", rel


def ema_reinit_from_params(params: Params) -> Params:
    """Repair: restart the shadow from the current params (``ema.py:88-94``).
    Copies for the same donation-aliasing reason as :func:`ema_init`."""
    return jax.tree.map(lambda p: jnp.array(p, copy=True), params)
