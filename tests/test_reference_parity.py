"""LIVE numerical parity against the reference implementation.

These tests import the actual PyTorch reference (mounted read-only at
/root/reference) and compare its outputs element-by-element with this
framework's — the strongest possible parity evidence, no golden files.
Every randomness source (noise, timesteps) is passed explicitly to both
sides so the comparisons are deterministic.  Skipped cleanly when the
reference checkout is absent (standalone installs).

Covers: schedule tables (linear + cosine), q_sample, loss_simple,
predict_x0 (plain clamp + the quirky dynamic threshold), posterior moments,
the DDPM ancestral step, the DDIM step (eta = 0 and 0.7), and the
sinusoidal time embedding.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")),
    reason="reference checkout not mounted",
)

from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
from ddpm_diffusion_model_tpu.ops.diffusion import (
    ddim_step,
    loss_simple,
    p_sample_step,
    posterior_mean_variance,
    predict_x0,
    q_sample,
)

T = 100
SHAPE = (4, 3, 8, 8)  # torch is NCHW; ours is NHWC — transposed per test


@pytest.fixture(scope="module")
def ref():
    """The reference Diffusion module (linear schedule) + torch."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    from src.model.difussion_class import Diffusion

    return torch, Diffusion


def _pair(torch, seed=0, shape=SHAPE):
    """Matching (torch NCHW, jax NHWC) tensors from one numpy draw."""
    rng = np.random.default_rng(seed)
    a = rng.normal(size=shape).astype(np.float32)
    return torch.from_numpy(a), jnp.asarray(np.transpose(a, (0, 2, 3, 1)))


def _t_pair(torch, seed=1, n=SHAPE[0], high=T):
    tv = np.random.default_rng(seed).integers(1, high, size=(n,)).astype(np.int64)
    return torch.from_numpy(tv), jnp.asarray(tv.astype(np.int32))


def _to_nhwc(x_torch):
    return np.transpose(x_torch.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("schedule", ["linear", "cosine"])
def test_schedule_tables_match_reference(ref, schedule):
    torch, Diffusion = ref
    d = Diffusion(T=T, schedule=schedule, img_size=8)
    s = make_schedule(DiffusionConfig(T=T, schedule=schedule, img_size=8))
    for name in [
        "betas", "alphas", "alphas_cumprod", "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod", "alphas_cumprod_prev",
        "posterior_variance", "posterior_log_variance",
        "posterior_mean_coef1", "posterior_mean_coef2",
    ]:
        theirs = getattr(d, name).numpy()
        ours = np.asarray(getattr(s, name))
        # atol 1e-5: fp32 cumprod/derived-table accumulation order differs
        # between torch and XLA (observed max |diff| ~5e-6 on cosine coefs)
        np.testing.assert_allclose(
            ours, theirs, rtol=1e-5, atol=1e-5,
            err_msg=f"{schedule}/{name}")


def test_q_sample_matches_reference(ref):
    torch, Diffusion = ref
    d = Diffusion(T=T, img_size=8)
    s = make_schedule(DiffusionConfig(T=T, img_size=8))
    x0_t, x0_j = _pair(torch, 0)
    eps_t, eps_j = _pair(torch, 1)
    t_t, t_j = _t_pair(torch)
    theirs = d.q_sample(x0_t, t_t, eps=eps_t)
    ours = q_sample(s, x0_j, t_j, eps_j)
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(theirs),
                               rtol=1e-5, atol=1e-6)


def test_loss_simple_matches_reference(ref):
    torch, Diffusion = ref
    d = Diffusion(T=T, img_size=8)
    s = make_schedule(DiffusionConfig(T=T, img_size=8))
    x0_t, x0_j = _pair(torch, 0)
    eps_t, eps_j = _pair(torch, 1)
    t_t, t_j = _t_pair(torch)
    w = np.linspace(0.5, 2.0, SHAPE[0]).astype(np.float32)

    # the same linear "model" on both sides: eps_hat = 0.9 x_t + 0.1
    theirs = d.loss_simple(lambda x, t: 0.9 * x + 0.1, x0_t, t_t,
                           noise=eps_t, weight=torch.from_numpy(w))
    ours = loss_simple(s, lambda x, t: 0.9 * x + 0.1, x0_j, t_j, eps_j,
                       weight=jnp.asarray(w))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


@pytest.mark.parametrize("dyn", [None, 0.9])
def test_predict_x0_matches_reference(ref, dyn):
    torch, Diffusion = ref
    d = Diffusion(T=T, img_size=8, dynamic_threshold=dyn)
    s = make_schedule(DiffusionConfig(T=T, img_size=8, dynamic_threshold=dyn))
    x_t, x_j = _pair(torch, 2)
    e_t, e_j = _pair(torch, 3)
    t_t, t_j = _t_pair(torch)
    theirs = d.predict_x0(x_t * 3.0, e_t, t_t)  # *3 exercises the threshold
    ours = predict_x0(s, x_j * 3.0, e_j, t_j)
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(theirs),
                               rtol=1e-5, atol=1e-6)


def test_posterior_moments_match_reference(ref):
    torch, Diffusion = ref
    d = Diffusion(T=T, img_size=8)
    s = make_schedule(DiffusionConfig(T=T, img_size=8))
    x_t, x_j = _pair(torch, 4)
    x0_t, x0_j = _pair(torch, 5)
    t_t, t_j = _t_pair(torch)
    m_t, v_t, lv_t = d.posterior_mean_variance(x_t, x0_t, t_t)
    m_j, v_j, lv_j = posterior_mean_variance(s, x_j, x0_j, t_j)
    np.testing.assert_allclose(np.asarray(m_j), _to_nhwc(m_t), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_j), _to_nhwc(v_t), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lv_j), _to_nhwc(lv_t), rtol=1e-5, atol=1e-5)


def test_p_sample_step_matches_reference(ref):
    torch, Diffusion = ref
    d = Diffusion(T=T, img_size=8)
    s = make_schedule(DiffusionConfig(T=T, img_size=8))
    x_t, x_j = _pair(torch, 6)
    z_t, z_j = _pair(torch, 7)
    # include t=0 to exercise the nonzero mask
    tv = np.array([0, 1, 37, T - 1], dtype=np.int64)
    t_t, t_j = torch.from_numpy(tv), jnp.asarray(tv.astype(np.int32))

    # NCHW-side model vs NHWC-side model: same affine map commutes with
    # the layout transpose, so both sides see "the same" predictor
    theirs = d.p_sample_step(lambda x, t: 0.5 * x - 0.05, x_t, t_t, noise=z_t)
    ours = p_sample_step(s, lambda x, t: 0.5 * x - 0.05, x_j, t_j, z_j)
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(theirs),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("eta", [0.0, 0.7])
def test_ddim_step_matches_reference(ref, eta):
    torch, Diffusion = ref
    d = Diffusion(T=T, img_size=8)
    s = make_schedule(DiffusionConfig(T=T, img_size=8))
    x_t, x_j = _pair(torch, 8)
    z_t, z_j = _pair(torch, 9)
    tv = np.array([99, 60, 30, 10], dtype=np.int64)
    tp = np.array([60, 30, 10, 0], dtype=np.int64)
    theirs = d.p_sample_step_ddim(
        lambda x, t: 0.5 * x - 0.05, x_t,
        torch.from_numpy(tv), torch.from_numpy(tp), eta=eta, noise=z_t)
    ours = ddim_step(
        s, lambda x, t: 0.5 * x - 0.05, x_j,
        jnp.asarray(tv.astype(np.int32)), jnp.asarray(tp.astype(np.int32)),
        z_j, eta=eta)
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(theirs),
                               rtol=1e-5, atol=1e-6)


def test_sinusoidal_embedding_matches_reference(ref):
    torch, _ = ref
    from src.model.attention import SinusoidalPosEmb

    from ddpm_diffusion_model_tpu.models.embeddings import (
        sinusoidal_time_embedding,
    )

    tv = np.array([0, 1, 5, 500, 999], dtype=np.int64)
    for dim in (64, 512, 33):  # incl. odd-dim zero-pad branch
        theirs = SinusoidalPosEmb(dim)(torch.from_numpy(tv)).numpy()
        ours = np.asarray(
            sinusoidal_time_embedding(jnp.asarray(tv.astype(np.int32)), dim))
        # atol 1e-4: sin/cos of large args (t=999) — torch and XLA use
        # different range-reduction, fp32 ulp-level divergence
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-4,
                                   err_msg=f"dim={dim}")


def _tiny_model_pair(ref):
    """Matching tiny U-Nets: (torch model in eval mode, flax model, flax
    params template)."""
    import jax

    from src.model.unet_backbone import UNetDenoiser as RefUNet

    from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser

    kw = dict(in_channels=3, base_channels=8, channel_mults=(1, 2),
              num_res_blocks=1, time_embed_dim=16, dropout=0.0,
              num_heads=1, head_dim=8, img_resolution=16)
    ref_m = RefUNet(attn_resolutions={8}, **kw)
    ref_m.eval()
    ours_m = UNetDenoiser(UNetConfig(attn_resolutions=(8,), **kw),
                          dtype=jnp.float32)
    params = ours_m.init(jax.random.key(0), jnp.ones((1, 16, 16, 3)),
                         jnp.zeros((1,)))
    return ref_m, ours_m, params


def _torch_weights_to_flax(ref_m, params, tensors=None):
    """Map torch parameters (by name) onto the matching flax leaves,
    returning a new params['params'] tree.  ``tensors`` optionally overrides
    the values (dict name -> numpy, e.g. an EMA shadow); shapes/layouts are
    converted (conv OIHW->HWIO, 1x1 conv->Dense, Linear transpose).  Asserts
    every flax leaf is written exactly once."""
    import flax
    import jax

    # tree.map rebuilds the dict containers: unfreeze() of a plain dict
    # returns the SAME object, and this function mutates nodes in place
    tree = jax.tree.map(lambda x: x, flax.core.unfreeze(params)["params"])

    def _inner(rest):
        # drop torch Sequential indices (time_proj.1 -> time_proj)
        return [c for c in rest if not c.isdigit()]

    def flax_path(name):
        p = name.split(".")
        if p[0] == "time_mlp":           # time_mlp.net.{0,2}.{weight,bias}
            return ["time_mlp", {"0": "fc1", "2": "fc2"}[p[2]], p[3]]
        if p[0] in ("in_conv", "out_conv", "out_norm"):
            return [p[0], p[1]]
        if p[0] == "downs":
            L, what = int(p[1]), p[2]
            if what == "down":           # downs.L.down.conv.weight
                return [f"down{L}_down", "conv", p[4]]
            j = int(p[3])                # downs.L.blocks.j.<rest>
            blocks = list(ref_m.downs[L].blocks)
            kind = type(blocks[j]).__name__
            nth = sum(1 for b in blocks[:j] if type(b).__name__ == kind)
            tag = "res" if kind == "ResBlock" else "attn"
            return [f"down{L}_{tag}{nth}"] + _inner(p[4:])
        if p[0] == "mid":                # mid.{0,1,2}.<rest>
            j = int(p[1])
            kinds = [type(b).__name__ for b in ref_m.mid]
            if kinds[j] == "AttnBlock":
                return ["mid_attn"] + _inner(p[2:])
            nth = sum(1 for k in kinds[:j] if k == "ResBlock")
            return [f"mid_res{nth}"] + _inner(p[2:])
        if p[0] == "ups":
            L = int(p[1])
            if p[2] == "up":             # ups.L.up.conv.weight
                return [f"up{L}_up", "conv", p[4]]
            return [f"up{L}_res{int(p[3])}"] + _inner(p[4:])
        raise AssertionError(f"unmapped torch param {name}")

    consumed = set()
    for name, pt in ref_m.named_parameters():
        path = flax_path(name)
        # norm 'weight' is flax 'scale'; conv/linear 'weight' is 'kernel'
        node = tree
        for k in path[:-1]:
            node = node[k]
        leaf_name = path[-1]
        if leaf_name == "weight":
            leaf_name = "scale" if "scale" in node else "kernel"
        w = (tensors[name] if tensors is not None
             else pt.detach().numpy())
        dst = node[leaf_name]
        if w.ndim == 4 and dst.ndim == 4:        # conv OIHW -> HWIO
            w = np.transpose(w, (2, 3, 1, 0))
        elif w.ndim == 4 and dst.ndim == 2:      # 1x1 conv -> Dense (I, O)
            w = w[:, :, 0, 0].T
        elif w.ndim == 2:                        # Linear (O, I) -> (I, O)
            w = w.T
        assert w.shape == dst.shape, f"{name}: {w.shape} vs {dst.shape}"
        # copy=True: torch .numpy() shares storage and jnp.asarray on CPU is
        # zero-copy — without it, untransposed leaves (biases) would alias
        # the live torch tensors and mutate under in-place model updates
        node[leaf_name] = jnp.asarray(np.array(w, copy=True))
        consumed.add("/".join(path[:-1]) + "/" + leaf_name)

    n_flax = len(jax.tree.leaves(tree))
    assert len(consumed) == n_flax, (
        f"mapped {len(consumed)} torch params onto {n_flax} flax leaves")
    return tree


def test_unet_forward_matches_reference_with_matched_weights(ref):
    """THE topology proof: load one set of weights into BOTH U-Nets (theirs
    torch NCHW, ours Flax NHWC) and compare eps predictions end to end.
    Covers in/out convs, ResBlocks (incl. channel-change skip), interleaved
    encoder attention, bottleneck, decoder concat-ResBlocks, upsample, and
    the time-embedding MLP."""
    torch, _ = ref
    ref_m, ours_m, params = _tiny_model_pair(ref)
    tree = _torch_weights_to_flax(ref_m, params)

    # ---- identical inputs, both layouts ----
    x_t, x_j = _pair(torch, 11, (2, 3, 16, 16))
    tv = np.array([7, 93], dtype=np.int64)
    with torch.no_grad():
        theirs = ref_m(x_t, torch.from_numpy(tv))
    ours = ours_m.apply({"params": tree}, x_j,
                        jnp.asarray(tv.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours), _to_nhwc(theirs),
                               rtol=1e-4, atol=1e-4)


def test_ema_update_matches_reference(ref):
    """The EMA shadow after perturb+update agrees between the reference's
    list-of-tensors EMA (ema.py:3-41) and our pytree lerp (training/ema.py),
    compared through the weight mapping."""
    import jax

    from ddpm_diffusion_model_tpu.training.ema import ema_update

    torch, _ = ref
    from src.training_loops.ema import EMA as RefEMA

    ref_m, _ours_m, params = _tiny_model_pair(ref)
    w0 = _torch_weights_to_flax(ref_m, params)          # shadow init = w0

    decay = 0.9
    ref_ema = RefEMA(ref_m, decay=decay)

    # perturb the torch params deterministically, then EMA-update
    rng = np.random.default_rng(42)
    with torch.no_grad():
        for _name, p in ref_m.named_parameters():
            p.add_(torch.from_numpy(
                rng.normal(size=tuple(p.shape)).astype(np.float32) * 0.1))
    ref_ema.update(ref_m)

    # same perturbed params on our side (via the mapping), same update
    w1 = _torch_weights_to_flax(ref_m, params)
    ours_shadow = ema_update(w0, w1, decay)

    # the reference shadow, mapped into flax layout for comparison
    shadow_by_name = {
        name: s.numpy()
        for (name, _p), s in zip(ref_m.named_parameters(), ref_ema.shadow)
    }
    theirs_shadow = _torch_weights_to_flax(ref_m, params,
                                           tensors=shadow_by_name)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(ours_shadow)[0],
        jax.tree_util.tree_flatten_with_path(theirs_shadow)[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(pa))
