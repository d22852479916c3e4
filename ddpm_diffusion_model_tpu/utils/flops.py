"""Analytic FLOP accounting for the U-Net — the basis of honest MFU numbers.

XLA's ``compiled.cost_analysis()["flops"]`` counts a ``lax.scan`` body ONCE,
so a grad-accumulation step under-reports by the accumulation factor (this
is exactly how round 1 arrived at a wrong "18% MFU at 256px" figure).  This
module counts matmul/conv FLOPs from the architecture itself, mirroring
``models/unet.py``'s level plan, so throughput numbers can be converted to
model-FLOPs-utilization against a chip's peak.

Conventions: 1 multiply-add = 2 FLOPs; backward ~= 2x forward (standard
dgrad+wgrad accounting); elementwise/normalization FLOPs are ignored (they
are bandwidth, not MXU work).
"""

from __future__ import annotations

from ..models.unet import UNetConfig

__all__ = ["unet_fwd_flops", "train_step_flops", "sampling_flops", "PEAK_TFLOPS"]

# bf16 peak of the chips this framework targets (per chip)
PEAK_TFLOPS = {
    "tpu v5e": 197.0,
    "tpu v4": 275.0,
    "a100": 312.0,  # the reference's CelebHQ hardware (BASELINE.md row 4)
}


def _conv(res: int, k: int, cin: int, cout: int, batch: int) -> int:
    return 2 * batch * res * res * k * k * cin * cout


def _resblock(res: int, cin: int, cout: int, time_dim: int, batch: int) -> int:
    f = _conv(res, 3, cin, cout, batch) + _conv(res, 3, cout, cout, batch)
    f += 2 * batch * time_dim * cout  # time-bias Dense
    if cin != cout:
        f += _conv(res, 1, cin, cout, batch)  # skip 1x1
    return f


def _attn(res: int, ch: int, heads: int, head_dim: int, batch: int) -> int:
    n = res * res
    inner = heads * head_dim
    qkv = 2 * batch * n * ch * 3 * inner
    proj = 2 * batch * n * inner * ch
    scores = 2 * batch * heads * n * n * head_dim  # QK^T
    out = 2 * batch * heads * n * n * head_dim     # PV
    return qkv + proj + scores + out


def unet_fwd_flops(cfg: UNetConfig, batch: int) -> int:
    """Forward matmul/conv FLOPs of one UNetDenoiser apply, mirroring the
    exact topology of ``models/unet.py:__call__`` (one skip per level,
    concat-ResBlock decoder, no decoder attention)."""
    levels, bottleneck_res = cfg.level_plan()
    td = cfg.time_embed_dim
    f = 2 * batch * td * td * 2  # TimeMLP (two Dense td->td)
    f += _conv(cfg.img_resolution, 3, cfg.in_channels, cfg.base_channels, batch)

    # encoder
    ch = cfg.base_channels
    for level in levels:
        res, out_ch = level["resolution"], level["out_ch"]
        for _ in range(cfg.num_res_blocks):
            f += _resblock(res, ch, out_ch, td, batch)
            ch = out_ch
            if level["use_attn"]:
                f += _attn(res, ch, cfg.num_heads, cfg.head_dim, batch)
        if level["downsample"]:
            f += _conv(res // 2, 3, ch, ch, batch)  # stride-2: output res/2

    # bottleneck
    mid_ch = levels[-1]["out_ch"]
    f += _resblock(bottleneck_res, ch, mid_ch, td, batch)
    if bottleneck_res in set(cfg.attn_resolutions):
        f += _attn(bottleneck_res, mid_ch, cfg.num_heads, cfg.head_dim, batch)
    f += _resblock(bottleneck_res, mid_ch, mid_ch, td, batch)

    # decoder (reversed levels)
    ch = mid_ch
    for li, level in enumerate(reversed(levels)):
        res, out_ch = level["resolution"], level["out_ch"]
        if li > 0:
            f += _conv(res, 3, ch, ch, batch)  # upsample conv at target res
        skip_ch = out_ch  # one skip per level, saved at the level's width
        f += _resblock(res, ch + skip_ch, out_ch, td, batch)
        ch = out_ch
        for _ in range(cfg.num_res_blocks):
            f += _resblock(res, ch, out_ch, td, batch)

    # head
    f += _conv(cfg.img_resolution, 3, ch, cfg.in_channels, batch)
    return int(f)


def dit_fwd_flops(cfg, batch: int) -> int:
    """Analytic matmul FLOPs of one DiT forward (models/dit.py).

    Per block: qkv (6NH^2) + attention (4N^2·H across heads) + proj (2NH^2)
    + MLP (4rNH^2) + adaLN head (12H^2); plus patchify/unpatchify denses and
    the conditioning MLP.  Everything else is elementwise/norm noise."""
    N, H, L = cfg.seq_len, cfg.hidden_size, cfg.depth
    r = cfg.mlp_ratio
    pc = cfg.patch_size * cfg.patch_size * cfg.in_channels
    E = getattr(cfg, "num_experts", 0)
    if E:
        # switch MoE (models/moe.py): router + E*C executed expert slots
        # (capacity padding IS executed MXU work) + dispatch/combine einsums
        C = max(1, -(-int(N * cfg.capacity_factor) // E))
        mlp = 2 * N * H * E + 4 * r * H * H * E * C + 4 * N * E * C * H
    else:
        mlp = 4 * r * N * H * H
    per_block = 8 * N * H * H + mlp + 4 * N * N * H + 12 * H * H
    f = 2 * N * pc * H                      # patchify
    f += 2 * (cfg.time_embed_dim * H + H * H)  # conditioning MLP
    f += L * per_block
    f += 4 * H * H + 2 * N * H * pc         # final adaLN + projection
    return int(batch * f)


def fwd_flops(cfg, batch: int) -> int:
    """Family dispatch: analytic forward FLOPs for any denoiser config."""
    if isinstance(cfg, UNetConfig):
        return unet_fwd_flops(cfg, batch)
    return dit_fwd_flops(cfg, batch)


def train_step_flops(cfg, batch: int) -> int:
    """fwd + bwd (~2x fwd) for one optimizer step over ``batch`` images
    (grad accumulation does not change the total — it only splits it)."""
    return 3 * fwd_flops(cfg, batch)


def sampling_flops(cfg, batch: int, steps: int) -> int:
    """Reverse-process cost: one forward per timestep."""
    return steps * fwd_flops(cfg, batch)


def mfu(flops: int, seconds: float, peak_tflops: float = PEAK_TFLOPS["tpu v5e"]) -> float:
    """Model-FLOPs utilization in [0, 1]."""
    return (flops / seconds) / (peak_tflops * 1e12)
