"""The generated example notebooks (scripts/make_notebooks.py) are valid,
self-consistent, and reference only real API symbols.

The executed forms are committed under examples/notebooks/; these tests
guard the GENERATOR (the single source of truth) without paying notebook
execution time in the suite.  Counterpart of the reference's notebook entry
points (``/root/reference/full_notebooks/*.ipynb``).
"""

import importlib.util
import os
import sys

import pytest

nbformat = pytest.importorskip("nbformat")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_builder():
    path = os.path.join(REPO, "scripts", "make_notebooks.py")
    spec = importlib.util.spec_from_file_location("make_notebooks", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_notebooks_build_and_validate():
    mod = _load_builder()
    assert set(mod.NOTEBOOKS) == {
        "ddpm_celeba64_attention.ipynb",
        "ddpm_celebahq256.ipynb",
        "ddpm_celeba64_low.ipynb",
    }
    for name, build in mod.NOTEBOOKS.items():
        nb = build()
        nbformat.validate(nb)  # raises on schema violations
        kinds = [c.cell_type for c in nb.cells]
        assert kinds[0] == "markdown", name
        assert "code" in kinds, name
        src = "\n".join(c.source for c in nb.cells if c.cell_type == "code")
        assert "QUICK" in src
        assert "ddpm_diffusion_model_tpu" in src


def test_notebook_code_cells_compile():
    """Every code cell is syntactically valid Python (catches builder
    template typos without executing anything)."""
    mod = _load_builder()
    for name, build in mod.NOTEBOOKS.items():
        for i, cell in enumerate(build().cells):
            if cell.cell_type == "code":
                compile(cell.source, f"{name}[cell {i}]", "exec")


def test_notebook_api_symbols_exist():
    """Imported names in the notebook sources resolve against the package
    (guards against API drift breaking the committed notebooks)."""
    import ast

    mod = _load_builder()
    for name, build in mod.NOTEBOOKS.items():
        src = "\n".join(c.source for c in build().cells
                        if c.cell_type == "code")
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module and \
                    node.module.startswith("ddpm_diffusion_model_tpu"):
                pkg = importlib.import_module(node.module)
                for alias in node.names:
                    assert hasattr(pkg, alias.name), (
                        f"{name}: {node.module}.{alias.name} does not exist")


def test_committed_notebooks_executed_and_clean():
    """The committed .ipynb files carry outputs (they are the executed
    forms) and none of those outputs is an error."""
    out_dir = os.path.join(REPO, "examples", "notebooks")
    found = [f for f in sorted(os.listdir(out_dir)) if f.endswith(".ipynb")]
    assert found, "no committed notebooks"
    for f in found:
        nb = nbformat.read(os.path.join(out_dir, f), as_version=4)
        outputs = [o for c in nb.cells for o in c.get("outputs", [])]
        assert outputs, f"{f}: committed without outputs"
        errs = [o for o in outputs if o.get("output_type") == "error"]
        assert not errs, f"{f}: {errs[0].get('ename')}"
