"""Ring (context-parallel) attention on the virtual 8-device mesh: numerics
must match single-device attention exactly up to float tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_diffusion_model_tpu.ops.attention import attention_xla
from ddpm_diffusion_model_tpu.ops.ring_attention import ring_attention_sharded
from ddpm_diffusion_model_tpu.parallel import make_mesh

K = jax.random.key


@pytest.mark.parametrize("shape", [
    (2, 2, 256, 32),   # 32 tokens per device over 8 devices
    (1, 4, 1024, 64),  # 128 per device
])
def test_ring_matches_full_attention(shape):
    k1, k2, k3 = jax.random.split(K(0), 3)
    q = jax.random.normal(k1, shape)
    k = jax.random.normal(k2, shape)
    v = jax.random.normal(k3, shape)

    mesh = make_mesh()
    out = ring_attention_sharded(q, k, v, mesh)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_ring_on_two_way_axis():
    # ring over a 2-device axis of a 2-D mesh
    mesh = make_mesh((4, 2), ("data", "cp"))
    shape = (1, 2, 64, 16)
    k1, k2, k3 = jax.random.split(K(1), 3)
    q = jax.random.normal(k1, shape)
    k = jax.random.normal(k2, shape)
    v = jax.random.normal(k3, shape)
    out = ring_attention_sharded(q, k, v, mesh, axis="cp")
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_ring_bf16_io():
    mesh = make_mesh()
    shape = (1, 2, 128, 32)
    k1, k2, k3 = jax.random.split(K(2), 3)
    q = jax.random.normal(k1, shape, jnp.bfloat16)
    k = jax.random.normal(k2, shape, jnp.bfloat16)
    v = jax.random.normal(k3, shape, jnp.bfloat16)
    out = ring_attention_sharded(q, k, v, mesh)
    assert out.dtype == jnp.bfloat16
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )
