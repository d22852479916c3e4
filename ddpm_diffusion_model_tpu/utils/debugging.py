"""Numerical-debugging escape hatches.

The reference has no sanitizers (SURVEY.md §5: single-threaded, no native
code); its closest analogue is scattered finiteness asserts.  The TPU build's
equivalents: ``jax_debug_nans`` (fail fast at the op that produced a NaN) and
a pytree finiteness check usable inside or outside jit.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["nan_debugging", "enable_nan_debugging", "tree_all_finite", "assert_tree_finite"]


@contextlib.contextmanager
def nan_debugging():
    """Context manager: re-run any op producing NaN in eager mode and raise
    at the exact primitive (``jax_debug_nans``)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def enable_nan_debugging(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", bool(on))


def tree_all_finite(tree: Any) -> jnp.ndarray:
    """Traced scalar bool: every leaf finite (usable inside jit)."""
    leaves = [jnp.all(jnp.isfinite(l)) for l in jax.tree.leaves(tree)]
    out = jnp.asarray(True)
    for l in leaves:
        out = jnp.logical_and(out, l)
    return out


def assert_tree_finite(tree: Any, name: str = "tree") -> None:
    """Host-side hard check (blocks); for tests and debugging sessions."""
    bad = [
        jax.tree_util.keystr(path)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        if not bool(jnp.all(jnp.isfinite(leaf)))
    ]
    if bad:
        raise AssertionError(f"non-finite leaves in {name}: {bad[:10]}")
