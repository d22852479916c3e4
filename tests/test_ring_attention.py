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


# ---------------------------------------------------------------------------
# backward (custom VJP): dQ local, dK/dV travel the ring home
# ---------------------------------------------------------------------------

def test_ring_grads_match_xla():
    shape = (2, 2, 256, 32)
    k1, k2, k3, k4 = jax.random.split(K(3), 4)
    q = jax.random.normal(k1, shape)
    k = jax.random.normal(k2, shape)
    v = jax.random.normal(k3, shape)
    w = jax.random.normal(k4, shape)  # random cotangent direction

    mesh = make_mesh()

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention_sharded(q, k, v, mesh) * w)

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v) * w)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
            err_msg=f"d{name} mismatch",
        )


def test_ring_grads_bf16_tolerance():
    """Mesh-sharded forward+backward matches single-device numerics to bf16
    tolerance (VERDICT round-1 item 2 'done' criterion)."""
    shape = (1, 2, 128, 32)
    k1, k2, k3 = jax.random.split(K(4), 3)
    q = jax.random.normal(k1, shape, jnp.bfloat16)
    k = jax.random.normal(k2, shape, jnp.bfloat16)
    v = jax.random.normal(k3, shape, jnp.bfloat16)
    mesh = make_mesh()

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention_sharded(q, k, v, mesh).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_xla(q, k, v).astype(jnp.float32) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=5e-2
        )


# ---------------------------------------------------------------------------
# integration: attn_impl="ring" reachable from AttnBlock / UNetDenoiser
# ---------------------------------------------------------------------------

def test_attn_block_ring_impl_matches_xla():
    from ddpm_diffusion_model_tpu.models.blocks import AttnBlock
    from ddpm_diffusion_model_tpu.ops.ring_attention import context_parallel_mesh

    mesh = make_mesh((2, 4), ("data", "cp"))
    x = jax.random.normal(K(5), (2, 8, 8, 16), jnp.float32)  # N=64, 16/dev

    ref_blk = AttnBlock(num_heads=2, head_dim=8, dtype=jnp.float32, attn_impl="xla")
    ring_blk = AttnBlock(num_heads=2, head_dim=8, dtype=jnp.float32, attn_impl="ring")
    params = ref_blk.init(K(6), x)

    y_ref = ref_blk.apply(params, x)
    with context_parallel_mesh(mesh, "cp"):
        y_ring = jax.jit(ring_blk.apply)(params, x)
    np.testing.assert_allclose(np.asarray(y_ring), np.asarray(y_ref),
                               atol=3e-5, rtol=3e-5)

    # gradients through the block (params + input)
    def loss(blk):
        def fn(p, xx):
            return jnp.sum(blk.apply(p, xx) ** 2)
        return fn

    g_ref = jax.grad(loss(ref_blk), argnums=(0, 1))(params, x)
    with context_parallel_mesh(mesh, "cp"):
        g_ring = jax.jit(jax.grad(loss(ring_blk), argnums=(0, 1)))(params, x)
    for a, b in zip(jax.tree.leaves(g_ring), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_ring_impl_requires_context():
    from ddpm_diffusion_model_tpu.models.blocks import AttnBlock
    from ddpm_diffusion_model_tpu.ops.ring_attention import ring_attention_auto

    x = jax.random.normal(K(7), (1, 2, 64, 8))
    with pytest.raises(RuntimeError, match="context_parallel_mesh"):
        ring_attention_auto(x, x, x)

    blk = AttnBlock(num_heads=2, head_dim=8, dtype=jnp.float32, attn_impl="ring")
    with pytest.raises(RuntimeError, match="context_parallel_mesh"):
        blk.init(K(8), jnp.ones((1, 8, 8, 16)))


def test_ring_impl_rejects_attention_dropout():
    """attn-weight dropout materializes N^2 probs — combining it with
    ring/CP attention must refuse rather than silently go dense."""
    from ddpm_diffusion_model_tpu.models.blocks import AttnBlock

    blk = AttnBlock(num_heads=2, head_dim=8, dtype=jnp.float32,
                    attn_impl="ring", p_drop=0.1, deterministic=False)
    with pytest.raises(ValueError, match="ring"):
        blk.init({"params": K(8), "dropout": K(9)}, jnp.ones((1, 8, 8, 16)))


def test_ring_impl_indivisible_sequence_raises():
    from ddpm_diffusion_model_tpu.ops.ring_attention import (
        context_parallel_mesh,
        ring_attention_auto,
    )

    mesh = make_mesh()  # 8 devices
    x = jax.random.normal(K(9), (1, 2, 12, 8))  # 12 % 8 != 0
    with context_parallel_mesh(mesh, "data"):
        with pytest.raises(ValueError, match="not divisible"):
            ring_attention_auto(x, x, x)
