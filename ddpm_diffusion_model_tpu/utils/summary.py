"""Model summaries — the reference archives a printed module tree
(``arquitectures/UNetDenoiser arquitecture CelebA256.txt``); here the
equivalent is a parameter table derived from the params pytree."""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import numpy as np

__all__ = ["param_table", "model_summary"]


def param_table(params: Any) -> List[Tuple[str, Tuple[int, ...], int]]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rows = []
    for path, leaf in flat:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        shape = tuple(int(s) for s in leaf.shape)
        rows.append((name, shape, int(np.prod(shape)) if shape else 1))
    return rows


def model_summary(params: Any, max_rows: int = 0) -> str:
    rows = param_table(params)
    total = sum(r[2] for r in rows)
    lines = [f"{'parameter':60s} {'shape':>24s} {'count':>12s}", "─" * 98]
    shown = rows if not max_rows else rows[:max_rows]
    for name, shape, count in shown:
        lines.append(f"{name:60s} {str(shape):>24s} {count:12,d}")
    if max_rows and len(rows) > max_rows:
        lines.append(f"... ({len(rows) - max_rows} more)")
    lines.append("─" * 98)
    lines.append(f"{'total':60s} {'':>24s} {total:12,d}")
    return "\n".join(lines)
