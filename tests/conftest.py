"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors SURVEY.md §4's implication: tests must run without TPU hardware, and
multi-device (DP/FSDP) paths are validated on a virtual CPU mesh via
``--xla_force_host_platform_device_count=8``.

This environment's ``sitecustomize`` registers a TPU PJRT plugin (gated on
``PALLAS_AXON_POOL_IPS``) and imports jax at interpreter startup — too early
for any in-process fix.  So at session start we re-exec the interpreter once
with a sanitized environment; the re-exec'd process boots straight onto the
8-device CPU backend.  Global capture must be suspended around the exec or
the child inherits pytest's redirected fds and its output vanishes.
"""

import os
import sys

_GUARD = "_DDPM_TPU_TESTS_REEXECED"


def _needs_cpu_sandbox() -> bool:
    if os.environ.get(_GUARD):
        return False
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS")) or (
        os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu")
    )


def pytest_sessionstart(session):
    if not _needs_cpu_sandbox():
        return
    capman = session.config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    env = dict(os.environ)
    env[_GUARD] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disables the TPU plugin registration
    env.pop("TPU_WORKER_HOSTNAMES", None)  # plugin residue (sitecustomize
    #                                        setdefault) — not a real cluster
    env["JAX_PLATFORMS"] = "cpu"
    # no persistent compile cache inside the suite: CLI e2e tests call
    # main() in-process and would otherwise enable it globally; large-entry
    # (de)serialization under suite memory pressure segfaults zstd on this
    # host (utils/compilation_cache.py honors the sentinel)
    env["DDPM_TPU_CACHE_DIR"] = "off"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


if not _needs_cpu_sandbox():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["DDPM_TPU_CACHE_DIR"] = "off"  # see pytest_sessionstart
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# repo root importable regardless of pytest invocation dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Drop jit-compiled executables at every module boundary.

    The suite compiles ~500 programs into ONE process; the CPU backend
    keeps every executable's JIT code resident for the life of its jitted
    fn, and past a threshold a later large compile segfaults inside XLA
    (observed repeatedly at the same test with 120 GB of free RAM — it is
    executable accumulation, not memory pressure, and not the persistent
    cache: the crash site moved read -> write -> raw compile as those were
    eliminated).  Clearing per module bounds the live set; cross-module
    recompiles are the (correct, modest) cost."""
    yield
    import jax

    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: >=20s on the 1-core reference host (tests/slow_tests.txt); "
        "deselected by default via addopts, run the FULL suite with: "
        "python -m pytest tests/ -q -m ''")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: tests listed in tests/slow_tests.txt get the ``slow``
    marker (default addopts deselect them -> ~24 min fast tier on this
    host; ``-m ''`` runs everything, ~67 min).  The manifest is generated
    from measured call durations, so re-tiering after a perf change is:

        python -m pytest tests/ -q -m '' --durations=0 > /tmp/suite.log
        grep -E '^[0-9.]+s call' /tmp/suite.log | \
          awk '$1+0>=20 {print $3}' | sort > tests/slow_tests.txt
    """
    manifest = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    if not os.path.exists(manifest):
        return
    with open(manifest) as f:
        slow_ids = {ln.strip() for ln in f if ln.strip()}
    marker = pytest.mark.slow
    for item in items:
        # nodeid is repo-relative (tests/test_x.py::test_y[param])
        base = item.nodeid.split("[", 1)[0]
        if item.nodeid in slow_ids or base in slow_ids:
            item.add_marker(marker)
