"""Utility tests: model summary tables, NaN debugging helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.utils import (
    assert_tree_finite,
    model_summary,
    nan_debugging,
    param_table,
    tree_all_finite,
)


def _params():
    return {
        "dense": {"kernel": jnp.ones((4, 8)), "bias": jnp.zeros((8,))},
        "out": {"kernel": jnp.ones((8, 2))},
    }


def test_param_table_and_summary():
    rows = param_table(_params())
    assert len(rows) == 3
    total = sum(r[2] for r in rows)
    assert total == 4 * 8 + 8 + 8 * 2
    s = model_summary(_params())
    assert f"{total:,d}" in s
    assert "dense/kernel" in s


def test_tree_all_finite():
    assert bool(tree_all_finite(_params()))
    bad = _params()
    bad["dense"]["bias"] = bad["dense"]["bias"].at[0].set(jnp.inf)
    assert not bool(tree_all_finite(bad))


def test_assert_tree_finite():
    assert_tree_finite(_params())
    bad = _params()
    bad["out"]["kernel"] = bad["out"]["kernel"].at[0, 0].set(jnp.nan)
    with pytest.raises(AssertionError, match="out"):
        assert_tree_finite(bad, "p")


def test_nan_debugging_context():
    prev = jax.config.jax_debug_nans
    with nan_debugging():
        assert jax.config.jax_debug_nans is True
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.asarray(-1.0)) * 1.0
    assert jax.config.jax_debug_nans == prev
