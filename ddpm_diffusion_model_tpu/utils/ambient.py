"""Trace-time ambient (mesh, axis) declaration stacks.

Model code runs under ``jit``/``pjit`` and cannot receive a ``Mesh`` as a
traced argument; the parallelism contexts (TP head sharding in
``parallel/tp.py``, CP ring attention in ``ops/ring_attention.py``) instead
declare their mesh + axis on a small Python stack that layer code reads at
TRACE time.  This is that stack, shared so the two contexts cannot drift.
"""

from __future__ import annotations

from typing import Optional, Tuple

from jax.sharding import Mesh

__all__ = ["AmbientMeshStack"]


class _Entry:
    def __init__(self, stack: list, pair):
        self._stack, self.pair = stack, pair

    def __enter__(self):
        self._stack.append(self.pair)
        return self

    def __exit__(self, *exc):
        self._stack.pop()
        return False


class AmbientMeshStack:
    """A named stack of (mesh, axis) declarations.

    ``stack(mesh, axis)`` returns a context manager that pushes the pair for
    its ``with`` block (re-entrant: inner declarations shadow outer ones);
    ``stack.current()`` reads the innermost pair or None.  The axis name is
    validated against the mesh at declaration time."""

    def __init__(self, kind: str):
        self.kind = kind
        self._stack: list = []

    def __call__(self, mesh: Mesh, axis: str) -> _Entry:
        if axis not in mesh.axis_names:
            raise ValueError(
                f"mesh has no axis {axis!r} for {self.kind}: {mesh.axis_names}"
            )
        return _Entry(self._stack, (mesh, axis))

    def current(self) -> Optional[Tuple[Mesh, str]]:
        return self._stack[-1] if self._stack else None
