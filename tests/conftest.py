"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors SURVEY.md §4's implication: tests must run without TPU hardware, and
multi-device (DP) paths are validated on a virtual CPU mesh via
``--xla_force_host_platform_device_count=8``.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# repo root importable regardless of pytest invocation dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
