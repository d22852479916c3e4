"""torch -> flax checkpoint migration (the reference-user on-ramp).

The reference saves ``{"model": state_dict, "optimizer": ..., "scaler": ...,
"ema": {"decay", "shadow": [tensor, ...]}, "step", "extra"}`` via
``torch.save`` (``/root/reference/src/training_loops/chekpoints.py:4-25``).
This module converts such a file — or a bare ``state_dict`` — into this
framework's Orbax ``TrainState`` checkpoint so a model trained with the
reference can be sampled/evaluated/fine-tuned here without retraining.

The name mapping is derived purely from :class:`UNetConfig` (no torch model
object needed): the reference's module registration order
(``unet_backbone.py:68-165``) is reconstructed from the level plan, so
``downs.L.blocks.j`` indices resolve to ``down{L}_res{n}`` / ``down{L}_attn{n}``
exactly as the live-model mapper in ``tests/test_reference_parity.py`` does.

Layout conversions (torch NCHW modules -> our NHWC flax modules):
- conv ``weight`` OIHW -> HWIO kernels
- the attention 1x1 convs (``qkv``/``proj``) -> Dense kernels ``(I, O)``
- ``nn.Linear`` ``(O, I)`` -> Dense ``(I, O)``
- GroupNorm ``weight`` -> ``scale``

Optimizer state is NOT imported (torch Adam moments have no meaning to
optax's layouts — flat or tree); the import writes a fresh ``tx.init`` and
records the reference's ``step`` so LR warmup resumes past the ramp.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "torch_name_to_flax_path",
    "state_dict_to_flax",
    "ema_shadow_to_flax",
    "load_reference_checkpoint",
    "import_torch_checkpoint",
    "reference_param_entries",
    "flax_to_state_dict",
    "export_torch_checkpoint",
]

# GroupNorm module names across the architecture: their torch "weight" is a
# flax "scale"; every other "weight" is a conv/dense "kernel".
_NORM_NAMES = {"norm", "norm1", "norm2", "out_norm"}


def _encoder_block_tag(config, level: int, j: int) -> str:
    """``downs.{level}.blocks.{j}`` -> ``down{level}_res{n}`` or
    ``down{level}_attn{n}``.  The reference appends, per resblock, an
    AttnBlock when the level's resolution is in ``attn_resolutions``
    (``unet_backbone.py:110-117``), so the kind sequence is
    [Res, Attn]*n or [Res]*n."""
    levels, _ = config.level_plan()
    if levels[level]["use_attn"]:
        kind = "res" if j % 2 == 0 else "attn"
        return f"down{level}_{kind}{j // 2}"
    return f"down{level}_res{j}"


def torch_name_to_flax_path(name: str, config) -> List[str]:
    """Map a reference ``state_dict`` key to the flax params-tree path
    (sans the trailing weight/scale/kernel resolution — see
    :func:`state_dict_to_flax`).  Raises ``KeyError`` for unknown names so
    callers fail loudly on architecture mismatch."""
    p = name.split(".")

    def inner(rest: Sequence[str]) -> List[str]:
        # drop torch Sequential indices: time_proj.1.weight -> time_proj.weight
        return [c for c in rest if not c.isdigit()]

    if p[0] == "time_mlp":  # time_mlp.net.{0,2}.{weight,bias} -> fc1/fc2
        try:
            return ["time_mlp", {"0": "fc1", "2": "fc2"}[p[2]], p[3]]
        except KeyError:
            raise KeyError(f"unmapped torch param {name!r}") from None
    if p[0] in ("in_conv", "out_conv", "out_norm"):
        return [p[0], p[1]]
    if p[0] == "downs":
        level = int(p[1])
        if p[2] == "down":  # downs.L.down.conv.weight
            return [f"down{level}_down", "conv", p[4]]
        return [_encoder_block_tag(config, level, int(p[3]))] + inner(p[4:])
    if p[0] == "mid":  # mid.{0,1,2}: Res, (Attn|Identity), Res
        j = int(p[1])
        tag = {0: "mid_res0", 1: "mid_attn", 2: "mid_res1"}[j]
        return [tag] + inner(p[2:])
    if p[0] == "ups":
        level = int(p[1])
        if p[2] == "up":  # ups.L.up.conv.weight (L=0 is Identity: no params)
            return [f"up{level}_up", "conv", p[4]]
        return [f"up{level}_res{int(p[3])}"] + inner(p[4:])
    raise KeyError(f"unmapped torch param {name!r}")


def _convert_leaf(name: str, w: np.ndarray, dst: jnp.ndarray) -> np.ndarray:
    """torch layout -> flax layout, validated against the destination."""
    if w.ndim == 4 and dst.ndim == 4:        # conv OIHW -> HWIO
        w = np.transpose(w, (2, 3, 1, 0))
    elif w.ndim == 4 and dst.ndim == 2:      # 1x1 conv -> Dense (I, O)
        w = w[:, :, 0, 0].T
    elif w.ndim == 2 and dst.ndim == 2:      # Linear (O, I) -> (I, O)
        w = w.T
    if w.shape != tuple(dst.shape):
        raise ValueError(
            f"{name}: torch shape {w.shape} does not map onto flax "
            f"{tuple(dst.shape)} — config/architecture mismatch")
    return np.asarray(w, dtype=dst.dtype)


def state_dict_to_flax(sd: Dict[str, np.ndarray], config,
                       params_template: Any) -> Any:
    """Build a params tree shaped like ``params_template['params']`` from a
    reference ``state_dict`` (values as numpy arrays or torch tensors).

    Every flax leaf must be written exactly once and every torch entry must
    be consumed — a bidirectional completeness check, so silent partial
    imports are impossible."""
    import flax

    has_collection = "params" in params_template
    template = params_template["params"] if has_collection else params_template
    # tree.map rebuilds every dict container -> safe to mutate nodes below
    tree = jax.tree.map(lambda x: x, flax.core.unfreeze(template))

    consumed = set()
    for name, w in sd.items():
        if hasattr(w, "detach"):  # torch tensor
            w = w.detach().cpu().numpy()
        w = np.asarray(w)
        path = torch_name_to_flax_path(name, config)
        node = tree
        for k in path[:-1]:
            if k not in node:
                raise KeyError(
                    f"{name}: flax module {'/'.join(path[:-1])!r} absent — "
                    "config/architecture mismatch")
            node = node[k]
        leaf = path[-1]
        if leaf == "weight":
            leaf = "scale" if path[-2] in _NORM_NAMES or "scale" in node \
                else "kernel"
        node[leaf] = jnp.asarray(_convert_leaf(name, w, node[leaf]))
        consumed.add("/".join(path[:-1]) + "/" + leaf)

    n_leaves = len(jax.tree.leaves(tree))
    if len(consumed) != n_leaves:
        raise ValueError(
            f"mapped {len(consumed)} torch params onto {n_leaves} flax "
            "leaves — incomplete import (architecture mismatch)")
    return {"params": tree} if has_collection else tree


def ema_shadow_to_flax(shadow: List[Any], sd_keys: Sequence[str], config,
                       params_template: Any) -> Any:
    """The reference EMA stores ``shadow`` as a bare list in
    ``model.parameters()`` order (``ema.py:3-41``) — the same registration
    order as ``state_dict`` keys (this model has no buffers).  Zip them into
    a named dict and reuse the state_dict mapper."""
    if len(shadow) != len(sd_keys):
        raise ValueError(
            f"EMA shadow has {len(shadow)} entries but the model has "
            f"{len(sd_keys)} parameters")
    named = {k: s for k, s in zip(sd_keys, shadow) if s is not None}
    if len(named) != len(sd_keys):
        raise ValueError("EMA shadow contains None entries (frozen params) — "
                         "unsupported for this architecture")
    return state_dict_to_flax(named, config, params_template)


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """``torch.load`` a reference checkpoint file on CPU.  Returns the raw
    dict; also tolerates a bare ``state_dict`` file (wrapped as
    ``{"model": sd}``)."""
    import torch

    try:
        state = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # older torch pickles (e.g. saved GradScaler objects) need the
        # full unpickler; the file is user-supplied and user-trusted
        state = torch.load(path, map_location="cpu", weights_only=False)
    if "model" not in state:  # bare state_dict
        state = {"model": state}
    return state


def import_torch_checkpoint(
    ckpt_path: str,
    exp,
    out_dir: str,
    *,
    require_ema: bool = False,
) -> Tuple[str, Dict[str, Any]]:
    """Convert a reference checkpoint into an Orbax TrainState checkpoint.

    - ``params``/``ema_params`` from ``state["model"]`` / ``state["ema"]``
      (EMA falls back to a params copy when absent, mirroring fresh-EMA
      init; pass ``require_ema=True`` to fail instead).
    - ``step`` from ``state["step"]`` so warmup does not restart.
    - ``opt_state`` is a fresh ``tx.init`` (see module docstring).
    - ``meta.json`` records the experiment config, so every ``--ckpt``
      command resolves the right architecture automatically.

    Returns ``(checkpoint_path, info)``.
    """
    from ..models import UNetConfig, UNetDenoiser
    from ..training import TrainState, init_train_state, make_optimizer
    from ..training.checkpoint import save_checkpoint

    if not isinstance(exp.model, UNetConfig):
        raise TypeError(
            "torch interop maps the reference's U-Net architecture only — "
            f"got a {type(exp.model).__name__} experiment")
    state_t = load_reference_checkpoint(ckpt_path)
    sd = state_t["model"]

    model = UNetDenoiser(exp.model, dtype=jnp.bfloat16)
    # shapes/dtypes only — no device compute, no compile (31M-param inits
    # through the TPU tunnel would cost minutes for nothing)
    template = jax.eval_shape(
        model.init,
        jax.random.key(0),
        jnp.ones((1, exp.img_size, exp.img_size, exp.model.in_channels)),
        jnp.zeros((1,)),
    )
    params = state_dict_to_flax(sd, exp.model, template)

    ema_info = state_t.get("ema") or {}
    if ema_info.get("shadow") is not None:
        ema_params = ema_shadow_to_flax(
            ema_info["shadow"], list(sd.keys()), exp.model, template)
        ema_decay = float(ema_info.get("decay", exp.train.ema_decay))
    elif require_ema:
        raise ValueError(f"{ckpt_path} has no EMA shadow")
    else:
        ema_params = jax.tree.map(jnp.array, params)
        ema_decay = exp.train.ema_decay

    step = int(state_t.get("step", 0) or 0)
    tx = make_optimizer(exp.train)
    fresh, _ = init_train_state(params, exp.train, tx=tx)
    opt_state = fresh.opt_state
    if step > 0:
        # the fresh optimizer's LR-schedule clock starts at 0, which would
        # re-run the warmup ramp on a checkpoint already past it (while the
        # metrics' lr column — driven by state.step — reports full LR)
        from ..training.checkpoint import _fast_forward_schedule_counts

        opt_state = _fast_forward_schedule_counts(opt_state, step)
    state = TrainState(
        step=jnp.asarray(step, jnp.int32),
        params=params,
        opt_state=opt_state,
        ema_params=ema_params,
        ema_decay=jnp.asarray(ema_decay, jnp.float32),
        rng=fresh.rng,
    )

    extra = dict(state_t.get("extra") or {})
    epoch = int(extra.get("epoch", 0) or 0)
    os.makedirs(os.path.dirname(out_dir) or ".", exist_ok=True)
    path = save_checkpoint(
        out_dir, state, epoch=epoch,
        extra={"imported_from": os.path.abspath(ckpt_path),
               "global_step": step, **extra},
        configs={"experiment": exp.to_dict()},
    )
    info = {
        "params": sum(int(p.size) for p in jax.tree.leaves(params)),
        "step": step, "epoch": epoch,
        # must mirror the import decision above: a {'shadow': None} entry
        # fell back to a params copy and must not report as imported EMA
        "ema": ema_info.get("shadow") is not None,
        "ema_decay": ema_decay,
    }
    return path, info


# --------------------------------------------------------------------------
# flax -> torch (the off-ramp): export a TrainState back into the exact
# reference checkpoint format, so a model trained/fine-tuned here loads into
# the reference's ``load_ckpt`` (chekpoints.py:16-25) without modification.
# --------------------------------------------------------------------------


def _res_entries(prefix: str, tag: str, module: Dict[str, Any]):
    """Ordered (torch_key, flax_path) pairs of one ResBlock, in the
    reference's registration order (``unet_backbone.py:20-35``: norm1,
    conv1, time_proj[Sequential -> .1], norm2, conv2, skip-if-present)."""
    out = [
        (f"{prefix}.norm1.weight", (tag, "norm1", "scale")),
        (f"{prefix}.norm1.bias", (tag, "norm1", "bias")),
        (f"{prefix}.conv1.weight", (tag, "conv1", "kernel")),
        (f"{prefix}.conv1.bias", (tag, "conv1", "bias")),
        (f"{prefix}.time_proj.1.weight", (tag, "time_proj", "kernel")),
        (f"{prefix}.time_proj.1.bias", (tag, "time_proj", "bias")),
        (f"{prefix}.norm2.weight", (tag, "norm2", "scale")),
        (f"{prefix}.norm2.bias", (tag, "norm2", "bias")),
        (f"{prefix}.conv2.weight", (tag, "conv2", "kernel")),
        (f"{prefix}.conv2.bias", (tag, "conv2", "bias")),
    ]
    if "skip" in module:  # 1x1 conv iff in_ch != out_ch (else nn.Identity)
        out += [
            (f"{prefix}.skip.weight", (tag, "skip", "kernel")),
            (f"{prefix}.skip.bias", (tag, "skip", "bias")),
        ]
    return out


def _attn_entries(prefix: str, tag: str):
    """AttnBlock order (``attention.py:52-54``): norm, qkv (bias=False),
    proj."""
    return [
        (f"{prefix}.norm.weight", (tag, "norm", "scale")),
        (f"{prefix}.norm.bias", (tag, "norm", "bias")),
        (f"{prefix}.qkv.weight", (tag, "qkv", "kernel")),
        (f"{prefix}.proj.weight", (tag, "proj", "kernel")),
        (f"{prefix}.proj.bias", (tag, "proj", "bias")),
    ]


def reference_param_entries(config, tree: Dict[str, Any]
                            ) -> List[Tuple[str, Tuple[str, ...]]]:
    """Every reference ``state_dict`` key paired with its flax params-tree
    path, in the reference model's REGISTRATION order — which is also
    ``model.parameters()`` order, i.e. the EMA shadow-list order
    (``ema.py:10-13``; this model has no buffers).

    ``tree`` is the (unfrozen) flax params mapping; it resolves the
    data-dependent bits of the topology (skip convs, presence of mid
    attention) that the registration walk cannot see from ``config`` alone.
    """
    entries: List[Tuple[str, Tuple[str, ...]]] = []
    # top-of-model modules (unet_backbone.py:93-100): time_pos_emb has no
    # params; time_mlp is Sequential(Linear, SiLU, Linear) -> net.{0,2}
    for t_name, f_name in (("net.0", "fc1"), ("net.2", "fc2")):
        entries += [
            (f"time_mlp.{t_name}.weight", ("time_mlp", f_name, "kernel")),
            (f"time_mlp.{t_name}.bias", ("time_mlp", f_name, "bias")),
        ]
    entries += [
        ("in_conv.weight", ("in_conv", "kernel")),
        ("in_conv.bias", ("in_conv", "bias")),
        ("out_norm.weight", ("out_norm", "scale")),
        ("out_norm.bias", ("out_norm", "bias")),
        ("out_conv.weight", ("out_conv", "kernel")),
        ("out_conv.bias", ("out_conv", "bias")),
    ]
    levels, _ = config.level_plan()
    # encoder (unet_backbone.py:104-126): per level, [Res(,Attn)]*n + down
    for L, lv in enumerate(levels):
        j = 0
        for n in range(config.num_res_blocks):
            tag = f"down{L}_res{n}"
            entries += _res_entries(f"downs.{L}.blocks.{j}", tag, tree[tag])
            j += 1
            if lv["use_attn"]:
                entries += _attn_entries(f"downs.{L}.blocks.{j}",
                                         f"down{L}_attn{n}")
                j += 1
        if lv["downsample"]:
            entries += [
                (f"downs.{L}.down.conv.weight", (f"down{L}_down", "conv", "kernel")),
                (f"downs.{L}.down.conv.bias", (f"down{L}_down", "conv", "bias")),
            ]
    # bottleneck (unet_backbone.py:132-135): Res, Attn-or-Identity, Res
    entries += _res_entries("mid.0", "mid_res0", tree["mid_res0"])
    if "mid_attn" in tree:
        entries += _attn_entries("mid.1", "mid_attn")
    entries += _res_entries("mid.2", "mid_res1", tree["mid_res1"])
    # decoder (unet_backbone.py:138-158): per level, 1+n ResBlocks, then
    # up (Identity at level 0)
    for L in range(len(levels)):
        for n in range(config.num_res_blocks + 1):
            tag = f"up{L}_res{n}"
            entries += _res_entries(f"ups.{L}.blocks.{n}", tag, tree[tag])
        if f"up{L}_up" in tree:
            entries += [
                (f"ups.{L}.up.conv.weight", (f"up{L}_up", "conv", "kernel")),
                (f"ups.{L}.up.conv.bias", (f"up{L}_up", "conv", "bias")),
            ]
    return entries


def _deconvert_leaf(w: np.ndarray, torch_key: str) -> np.ndarray:
    """flax layout -> torch layout (exact inverse of :func:`_convert_leaf`).
    Always returns a fresh contiguous WRITABLE array — jax-backed numpy
    views are read-only, which ``torch.from_numpy`` warns about and the
    reference's in-place EMA updates would trip over."""
    w = np.asarray(w, dtype=np.float32)
    if w.ndim == 4:                      # conv HWIO -> OIHW
        w = np.transpose(w, (3, 2, 0, 1))
    elif w.ndim == 2:
        leaf = torch_key.rsplit(".", 2)[-2]
        if leaf in ("qkv", "proj"):      # Dense (I, O) -> 1x1 conv OI11
            w = w.T[:, :, None, None]
        else:
            w = w.T                      # Dense (I, O) -> Linear (O, I)
    return np.array(w)  # force copy + writable + contiguous


def flax_to_state_dict(params: Any, config) -> Dict[str, np.ndarray]:
    """Render a flax params tree as a reference-ordered ``state_dict`` of
    float32 numpy arrays.  Bidirectional completeness is enforced: the
    registration walk must consume every flax leaf exactly once."""
    tree = params["params"] if "params" in params else params
    entries = reference_param_entries(config, tree)
    sd: Dict[str, np.ndarray] = {}
    for torch_key, path in entries:
        node = tree
        for k in path[:-1]:
            if k not in node:
                raise KeyError(
                    f"{torch_key}: flax module {'/'.join(path[:-1])!r} absent "
                    "— config/architecture mismatch")
            node = node[k]
        if path[-1] not in node:
            raise KeyError(f"{torch_key}: flax leaf {'/'.join(path)!r} absent")
        sd[torch_key] = _deconvert_leaf(np.asarray(node[path[-1]]), torch_key)
    n_leaves = len(jax.tree.leaves(tree))
    if len(sd) != n_leaves:
        raise ValueError(
            f"exported {len(sd)} torch params from {n_leaves} flax leaves — "
            "incomplete export (architecture mismatch)")
    return sd


def export_torch_checkpoint(state, exp, out_path: str) -> Tuple[str, Dict[str, Any]]:
    """Write a TrainState as a reference-format torch checkpoint.

    The file matches ``save_ckpt``'s layout (``chekpoints.py:4-13``) minus
    the optimizer/scaler entries (optax moments have no torch meaning;
    ``load_ckpt:16-25`` treats both as optional): ``model`` from raw params,
    ``ema`` as ``{"decay", "shadow": [tensor, ...]}`` with the shadow list
    in ``model.parameters()`` order from the EMA tree, plus ``step`` and
    ``extra``.  The reference can resume sampling/fine-tuning from it
    directly; :func:`import_torch_checkpoint` round-trips it bitwise.
    """
    import torch

    from ..models import UNetConfig

    if not isinstance(exp.model, UNetConfig):
        raise TypeError(
            "torch interop maps the reference's U-Net architecture only — "
            f"got a {type(exp.model).__name__} experiment")
    sd = flax_to_state_dict(state.params, exp.model)
    ema_sd = flax_to_state_dict(state.ema_params, exp.model)
    payload = {
        "model": {k: torch.from_numpy(v) for k, v in sd.items()},
        "ema": {
            "decay": float(np.asarray(state.ema_decay)),
            "shadow": [torch.from_numpy(ema_sd[k]) for k in sd],
        },
        "step": int(np.asarray(state.step)),
        "extra": {"exported_from": "ddpm_diffusion_model_tpu",
                  "experiment": exp.to_dict()},
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    torch.save(payload, out_path)
    info = {
        "params": sum(int(v.size) for v in sd.values()),
        "step": payload["step"],
        "ema": True,
    }
    return out_path, info
