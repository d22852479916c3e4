"""Thin CLI over the five reference entry points.

The reference's "CLI" is its notebooks (SURVEY.md §1: "no CLI layer");
here the same workflows are commands:

    python -m ddpm_diffusion_model_tpu.cli train --preset celeba64_low --data synthetic
    python -m ddpm_diffusion_model_tpu.cli sample-ddpm --ckpt ck/run_last --n 36
    python -m ddpm_diffusion_model_tpu.cli sample-ddim --ckpt ck/run_last --steps 50
    python -m ddpm_diffusion_model_tpu.cli strip --ckpt ck/run_last --sampler ddim
    python -m ddpm_diffusion_model_tpu.cli info --preset celebahq256
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _build(exp):
    import jax

    from .utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from .models import build_denoiser
    from .ops import make_schedule

    model = build_denoiser(exp.model, dtype=jnp.bfloat16, remat=exp.remat)
    sched = make_schedule(exp.diffusion)
    return model, sched


def _load_state(ckpt, exp):
    import jax
    import jax.numpy as jnp

    from .training import init_train_state, load_checkpoint, make_optimizer

    model, sched = _build(exp)
    cond_ch = int(getattr(exp.model, "cond_channels", 0) or 0)
    init_kw = ({"x_cond": jnp.ones((1, exp.img_size, exp.img_size, cond_ch))}
               if cond_ch else {})
    params = model.init(
        jax.random.key(exp.seed),
        jnp.ones((1, exp.img_size, exp.img_size, exp.model.in_channels)),
        jnp.zeros((1,)),
        **init_kw,
    )
    tx = make_optimizer(exp.train)
    template, _ = init_train_state(params, exp.train, tx=tx)
    state, meta = load_checkpoint(ckpt, template)
    return model, sched, state, meta


def _exp_from_args(args):
    from .utils.config import ExperimentConfig, get_preset

    if getattr(args, "config", None):
        with open(args.config) as f:
            return ExperimentConfig.from_json(f.read())
    exp = get_preset(args.preset)
    if getattr(args, "ckpt", None):
        from .training.checkpoint import read_meta

        meta = read_meta(args.ckpt) or {}
        if meta.get("configs", {}).get("experiment"):
            return ExperimentConfig.from_dict(
                meta["configs"]["experiment"], legacy=True)
    return exp


def _synthetic_array(exp, n, seed):
    rng = np.random.default_rng(seed)
    arr = rng.normal(size=(n, exp.img_size, exp.img_size, 3)).astype(np.float32)
    return np.clip(arr * 0.4, -1, 1)


def _eval_set_size(args, exp):
    """Held-out set size for the procedural sources: ~1/8 of the train set,
    rounded to whole batches (>= one full batch — a smaller set would yield
    zero batches under drop_last and a partial batch would mint an extra
    XLA compile)."""
    return max(args.synthetic_size // 8 // exp.batch_size, 1) * exp.batch_size


def _make_loader(args, exp, with_eval=False, mesh=None):
    """Train loader for ``--data``, plus (when ``with_eval``) the validation
    loader: the official valid split for celeba, disjoint-seed held-out sets
    for the procedural sources, None where the source has no meaningful
    split (zip/hf).  Returns ``(train, eval_or_None)``."""
    from .data import (
        ArrayDataset,
        DataLoader,
        build_hf_image_loader,
        get_celeba_loader_from_zip,
        get_celeba_loaders,
    )

    nc = int(getattr(exp.model, "num_classes", 0))
    shard_corpus = bool(getattr(args, "device_cache_sharded", False))
    device_cache = bool(getattr(args, "device_cache", False)) or shard_corpus
    if nc and args.data in ("zip", "hf", "celeba"):
        sys.exit(f"error: --data {args.data} has no labels; conditional "
                 "models train on labeled sources (--data blobs assigns "
                 "class hues, --data synthetic assigns smoke labels)")
    if shard_corpus and mesh is None:
        sys.exit("--device-cache-sharded needs --mesh (the corpus shards "
                 "over the mesh's data axis)")
    cache_kw = dict(quantize=True, progress=True)
    if mesh is not None and device_cache:
        from .parallel import batch_sharding

        cache_kw["sharding"] = batch_sharding(mesh)
        cache_kw["shard_corpus"] = shard_corpus

    def _train_loader_from_array(arr, seed):
        if device_cache:
            from .data import DeviceCacheLoader

            # quantize: our pipelines produce [-1,1] images, so u8 storage
            # costs nothing real and quarters the HBM + tunnel upload
            return DeviceCacheLoader(arr, exp.batch_size, seed=seed,
                                     **cache_kw)
        return DataLoader(ArrayDataset(np.asarray(arr)), exp.batch_size,
                          seed=seed, shuffle=True)

    def _maybe_device_cache(loader):
        """Decode-per-item sources (zip/hf/celeba): decode the corpus once,
        pin it in HBM as uint8, and gather batches on device."""
        if not device_cache or loader is None:
            return loader
        from .data import DeviceCacheLoader, materialize_corpus

        arr = materialize_corpus(loader, progress=True)
        return DeviceCacheLoader(arr, exp.batch_size, seed=exp.seed,
                                 **cache_kw)

    def _smoke_labels(n):
        return (np.arange(n, dtype=np.int64) % nc) if nc else None

    if args.data == "synthetic":
        if nc:
            n = args.synthetic_size
            arr = np.asarray(_synthetic_array(exp, n, exp.seed))
            if device_cache:
                from .data import DeviceCacheLoader

                train = DeviceCacheLoader(arr, exp.batch_size, seed=exp.seed,
                                          labels=_smoke_labels(n), **cache_kw)
            else:
                train = DataLoader(ArrayDataset(arr, _smoke_labels(n)),
                                   exp.batch_size, seed=exp.seed,
                                   shuffle=True)
        else:
            train = _train_loader_from_array(
                _synthetic_array(exp, args.synthetic_size, exp.seed),
                exp.seed)
        n_eval = _eval_set_size(args, exp)
        val = DataLoader(
            ArrayDataset(_synthetic_array(exp, n_eval, exp.seed + 777),
                         _smoke_labels(n_eval)),
            exp.batch_size, shuffle=False) if with_eval else None
        return train, val
    if args.data == "blobs":
        # procedural structured faces (data/synthetic.py): learnable offline
        # stand-in for CelebA — real learning dynamics without egress
        from .data import BlobFacesDataset

        if nc and (getattr(args, "preload", False) or device_cache):
            # labeled preload: render once, keep the (img, label) pairing;
            # --device-cache pins (corpus, labels) in HBM together
            ds = BlobFacesDataset(args.synthetic_size, img_size=exp.img_size,
                                  seed=exp.seed, num_classes=nc)
            if device_cache:
                from .data import DeviceCacheLoader

                # the cache materializes the dataset and harvests its own
                # (img, label) pairing — no parallel label derivation to
                # drift out of sync with the dataset's assignment
                train = DeviceCacheLoader(ds, exp.batch_size, seed=exp.seed,
                                          **cache_kw)
            else:
                pairs = [ds[i] for i in range(len(ds))]
                train = DataLoader(
                    ArrayDataset(np.stack([p[0] for p in pairs]),
                                 np.asarray([p[1] for p in pairs],
                                            dtype=np.int32)),
                    exp.batch_size, seed=exp.seed, shuffle=True)
        elif getattr(args, "preload", False) or device_cache:
            # render the whole corpus to RAM once (~50 MB per 1k 64px
            # images): per-item python rendering (~400 imgs/s) would
            # otherwise starve a chip that trains at 1000+ imgs/s.
            # --device-cache additionally pins it in HBM (implies preload).
            from .data import blob_faces_array

            arr = blob_faces_array(args.synthetic_size,
                                   img_size=exp.img_size, seed=exp.seed)
            train = _train_loader_from_array(arr, exp.seed)
        else:
            ds = BlobFacesDataset(args.synthetic_size, img_size=exp.img_size,
                                  seed=exp.seed, num_classes=nc)
            train = DataLoader(ds, exp.batch_size, seed=exp.seed, shuffle=True)
        val = None
        if with_eval:
            if device_cache:
                from .data import DeviceCacheLoader, blob_faces_array

                # conditional runs need a LABELED eval set (the eval pass
                # feeds (x, y) through the loss); unconditional keeps the
                # cheaper vectorized renderer
                val_src = (BlobFacesDataset(_eval_set_size(args, exp),
                                            img_size=exp.img_size,
                                            seed=exp.seed + 777,
                                            num_classes=nc)
                           if nc else
                           blob_faces_array(_eval_set_size(args, exp),
                                            img_size=exp.img_size,
                                            seed=exp.seed + 777))
                val = DeviceCacheLoader(
                    val_src,
                    exp.batch_size, shuffle=False, quantize=True)
            else:
                val_ds = BlobFacesDataset(_eval_set_size(args, exp),
                                          img_size=exp.img_size,
                                          seed=exp.seed + 777, num_classes=nc)
                val = DataLoader(val_ds, exp.batch_size, shuffle=False)
        return train, val
    if args.data == "zip":
        if not args.zip_path:
            raise SystemExit("error: --data zip requires --zip-path <file.zip>")
        if not os.path.exists(args.zip_path):
            raise SystemExit(f"error: zip not found: {args.zip_path}")
        zl = get_celeba_loader_from_zip(
            args.zip_path, img_size=exp.img_size, batch_size=exp.batch_size,
            seed=exp.seed,
            crop=None if getattr(args, "no_crop", False) else 178,
        )
        vf = float(getattr(args, "val_frac", 0.0) or 0.0)
        if vf > 0.0:
            # the zip source has no official partition: hold out a seeded
            # fraction so val loss / rFID score generalization, not recall.
            # The same --val-frac/seed in distill/eval reproduces the split,
            # so students never train on evaluation faces either.
            from .data import DeviceCacheLoader, materialize_corpus

            arr = materialize_corpus(zl, progress=True)
            n_val = max(1, min(len(arr) - 1, int(round(len(arr) * vf))))
            perm = np.random.default_rng(exp.seed).permutation(len(arr))
            va_arr, tr_arr = arr[perm[:n_val]], arr[perm[n_val:]]
            print(f"[SPLIT] zip corpus {len(arr)} -> train {len(tr_arr)} / "
                  f"val {n_val} (seed {exp.seed})")
            vbs = min(exp.batch_size, n_val)
            if device_cache:
                train = DeviceCacheLoader(tr_arr, exp.batch_size,
                                          seed=exp.seed, **cache_kw)
                val = (DeviceCacheLoader(va_arr, vbs, shuffle=False,
                                         drop_last=False, quantize=True)
                       if with_eval else None)
            else:
                train = DataLoader(ArrayDataset(tr_arr), exp.batch_size,
                                   seed=exp.seed, shuffle=True)
                val = (DataLoader(ArrayDataset(va_arr), vbs, shuffle=False,
                                  drop_last=False)
                       if with_eval else None)
            return train, val
        return _maybe_device_cache(zl), None
    if args.data == "hf":
        return _maybe_device_cache(build_hf_image_loader(
            img_size=exp.img_size, batch_size=exp.batch_size, seed=exp.seed
        )), None
    if args.data == "celeba":
        train, va, _te = get_celeba_loaders(
            data_dir=args.data_dir, img_size=exp.img_size,
            batch_size=exp.batch_size, seed=exp.seed,
        )
        return _maybe_device_cache(train), va if with_eval else None
    raise ValueError(args.data)


def cmd_train(args):
    from .sampling import ddpm_sample
    from .training import train_ddpm

    exp = _exp_from_args(args)
    if getattr(args, "loss_weighting", None):
        from .utils.config import ExperimentConfig

        exp = ExperimentConfig.from_dict({
            **exp.to_dict(),
            "train": {**exp.train.to_dict(), "loss_weighting": args.loss_weighting},
        })
    model, sched = _build(exp)

    mesh = None
    if getattr(args, "mesh", "none") != "none":
        # multi-chip run: one ('data',) mesh over every visible device; the
        # loop places the state (replicated or FSDP-sharded) and XLA emits
        # the gradient collectives over ICI (training/loop.py mesh= contract)
        from .parallel import make_mesh

        mesh = make_mesh()
        print(f"[MESH] {args.mesh} over {mesh.devices.size} devices")

    sr_f = int(getattr(exp.train, "superres_factor", 0) or 0)
    lat_ctx = None
    if getattr(args, "latent_vae", None):
        # latent-diffusion training (LDM): encode the PIXEL corpus through
        # the VAE once, then the standard loop trains on latents — which
        # are just small NHWC arrays (sampling/latent.py contract)
        import dataclasses as _dc

        from .data import ArrayDataset, DataLoader
        from .sampling import check_latent_config, encode_corpus
        from .training.vae import load_vae

        if sr_f:
            sys.exit("error: --latent-vae with superres_factor is not "
                     "supported (cascade in pixel space instead)")
        vae, vstate, _vm = load_vae(args.latent_vae)
        check_latent_config(exp.model, exp.diffusion, vae.config)
        exp_px = _dc.replace(exp, img_size=vae.config.img_resolution)
        # pixel loading is one pass — never device-cache the pixel corpus
        px_cache = (args.device_cache, args.device_cache_sharded)
        args.device_cache = args.device_cache_sharded = False
        px_loader, px_eval = _make_loader(
            args, exp_px, with_eval=bool(getattr(args, "eval_every", 0)))
        args.device_cache, args.device_cache_sharded = px_cache

        def _encode_split(src, seed):
            if src is None:
                return None, None
            xs, ys = [], []
            for b in src:
                if isinstance(b, (tuple, list)):
                    xs.append(np.asarray(b[0], np.float32))
                    ys.append(np.asarray(b[1]))
                else:
                    xs.append(np.asarray(b, np.float32))
            z, s = encode_corpus(vae, vstate.params, np.concatenate(xs),
                                 scale=lat_ctx and lat_ctx[2],
                                 batch_size=exp.batch_size)
            y = np.concatenate(ys) if ys else None
            if args.device_cache or args.device_cache_sharded:
                from .data import DeviceCacheLoader

                # latents are NOT [-1,1]-bounded: quantize must stay off
                kw = {}
                if mesh is not None:
                    from .parallel import batch_sharding

                    kw = dict(sharding=batch_sharding(mesh),
                              shard_corpus=args.device_cache_sharded)
                return DeviceCacheLoader(z, exp.batch_size, seed=seed,
                                         labels=y, quantize=False, **kw), s
            return DataLoader(ArrayDataset(z, y), exp.batch_size, seed=seed,
                              shuffle=True), s

        loader, lat_scale = _encode_split(px_loader, exp.seed)
        lat_ctx = (vae, vstate.params, lat_scale)
        eval_loader, _ = _encode_split(px_eval, exp.seed + 1)
        print(f"[LATENT] corpus encoded: {vae.config.img_resolution}px -> "
              f"{vae.config.latent_resolution}^2 x "
              f"{vae.config.latent_channels} latents (scale "
              f"{lat_scale:.4f})")
    else:
        loader, eval_loader = _make_loader(
            args, exp, with_eval=bool(getattr(args, "eval_every", 0)),
            mesh=mesh)

    sr_anchor = {}

    def sample_fn(model_, params_, sched_, *, n, img_size, save_path, seed):
        if lat_ctx is not None:
            # latent run: sample latents, decode to PIXEL grids so the
            # per-epoch monitoring (and rFID below) sees images
            from .sampling import latent_sample

            vae_, vp_, s_ = lat_ctx
            nc_ = int(getattr(exp.model, "num_classes", 0))
            cls_ = (np.arange(n, dtype=np.int32) % nc_) if nc_ else None
            return latent_sample(
                model_, params_, sched_, vae_, vp_, n=n, scale=s_,
                kind="ddim", steps=min(50, sched_.T - 1), seed=seed,
                save_path=save_path, class_id=cls_)
        if sr_f:
            # SR upsampler training: the per-epoch grid upsamples a FIXED
            # low-res anchor batch (degraded from the first train batch), so
            # consecutive grids are directly comparable like the fixed-seed
            # unconditional grids (main_train_loop.py:198-200 semantics)
            from .ops.superres import degrade
            from .sampling import upsample_infer_sample

            if "low" not in sr_anchor:
                import jax
                import jax.numpy as jnp

                first = next(iter(loader))
                x = first[0] if isinstance(first, (tuple, list)) else first
                x = np.asarray(jax.device_get(x), np.float32)
                x = np.resize(x, (n, *x.shape[1:]))  # tile if batch < n
                sr_anchor["low"] = np.asarray(
                    degrade(jnp.asarray(x), sr_f))
            return upsample_infer_sample(
                model_, params_, sched_, sr_anchor["low"], n=n,
                steps=min(50, sched_.T - 1), seed=seed, out_path=save_path)
        # returns per-sample [0,1] images so the loop can score rFID.
        # Conditional runs sample a CLASS-CYCLED grid (row i gets class
        # i % K, plain conditional w=1): per-epoch grids then show every
        # class learning, and rFID compares like-for-like against the
        # labeled reference mixture.
        nc_ = int(getattr(exp.model, "num_classes", 0))
        cls_ = (np.arange(n, dtype=np.int32) % nc_) if nc_ else None
        if mesh is not None and n % mesh.shape["data"] == 0:
            # SPMD sampling: every chip denoises its slice of the grid
            from .sampling import sample_grid_sharded

            return sample_grid_sharded(
                model_, params_, sched_, mesh, kind="ddpm", n=n,
                img_size=img_size, seed=seed, save_path=save_path,
                class_id=cls_)
        return ddpm_sample(model_, params_, sched_, n, img_size, seed=seed,
                           save_path=save_path, return_grid=False,
                           class_id=cls_)

    fid_ref = None
    if args.data == "blobs" and not args.no_samples:
        # held-out reference set (disjoint seed) for per-epoch rFID scoring;
        # conditional runs render the reference from the SAME labeled
        # distribution (class-hued backgrounds) the model trains on.
        # Latent runs sample DECODED pixels, so the reference renders at the
        # VAE's pixel resolution, not the latent grid exp.img_size names.
        fid_size = (lat_ctx[0].config.img_resolution if lat_ctx is not None
                    else exp.img_size)
        nc = int(getattr(exp.model, "num_classes", 0))
        if nc:
            from .data import BlobFacesDataset

            ds = BlobFacesDataset(128, img_size=fid_size,
                                  seed=exp.seed + 999, num_classes=nc)
            fid_ref = np.stack([ds[i][0] for i in range(128)])
        else:
            from .data import blob_faces_array

            fid_ref = blob_faces_array(128, img_size=fid_size,
                                       seed=exp.seed + 999)

    if getattr(args, "eval_every", 0) and eval_loader is None:
        print(f"[EVAL] no validation split for --data {args.data};"
              " skipping eval")

    state, summary = train_ddpm(
        model, sched, loader,
        train_config=exp.train,
        epochs=args.epochs if args.epochs is not None else exp.epochs,
        max_batches=args.max_batches,
        sample_every=exp.sample_every, sample_n=exp.sample_n,
        img_size=exp.img_size,
        sample_fn=sample_fn if not args.no_samples else None,
        ckpt_dir=args.ckpt_dir, run_name=exp.run_name,
        save_every=exp.save_every, resume_path=args.resume,
        log_every=args.log_every if args.log_every is not None else exp.log_every,
        probe_timesteps=[10, 50, 200, 500] if args.probes else None,
        log_grad_norm=args.probes,
        configs_for_ckpt={
            "experiment": exp.to_dict(),
            # latent runs: scale + VAE provenance so sample-* --vae can
            # decode without the user re-deriving the normalization
            **({"latent": {"vae_ckpt": os.path.abspath(args.latent_vae),
                           "scale": float(lat_ctx[2])}}
               if lat_ctx is not None else {}),
        },
        fid_reference=fid_ref,
        fid_extractor=getattr(args, "fid_extractor", None),
        mesh=mesh, fsdp=(getattr(args, "mesh", "none") == "fsdp"),
        eval_loader=eval_loader,
        eval_every=max(getattr(args, "eval_every", 0), 1),
        eval_max_batches=getattr(args, "eval_max_batches", None),
        # resume-time overrides (reference: main_train_loop.py:69-77,97-139)
        reset_optimizer_state=getattr(args, "reset_optimizer", False),
        override_lr=getattr(args, "override_lr", None),
        override_weight_decay=getattr(args, "override_weight_decay", None),
        override_ema_decay=getattr(args, "override_ema_decay", None),
        repair_ema_on_resume={"auto": True, "force": "force"}.get(
            getattr(args, "repair_ema", None), False),
    )
    final = summary["epochs"][-1]["loss"] if summary["epochs"] else None
    out = {"final_loss": final}
    rfids = [e["rfid"] for e in summary["epochs"] if "rfid" in e]
    if rfids:
        out["rfid_first"], out["rfid_last"] = rfids[0], rfids[-1]
    print(json.dumps(out))


def cmd_train_vae(args):
    """Train the KL-VAE autoencoder stage of the latent-diffusion family
    (models/autoencoder.py, training/vae.py).  The checkpoint it writes is
    what ``train --latent-vae`` and ``sample-* --vae`` consume."""
    import dataclasses
    import types

    from .models.autoencoder import AutoEncoderConfig, AutoEncoderKL
    from .training import TrainConfig
    from .training.vae import train_vae

    acfg = AutoEncoderConfig(
        in_channels=3, base_channels=args.base_channels,
        channel_mults=tuple(int(m) for m in args.channel_mults.split(",")),
        num_res_blocks=args.num_res_blocks,
        latent_channels=args.latent_channels, img_resolution=args.img_size)
    _ = acfg.latent_resolution  # divisibility check up front
    tcfg = TrainConfig(base_lr=args.lr, warmup_steps=args.warmup,
                       grad_clip=1.0, ema_decay=args.ema_decay,
                       flat_optimizer=False)
    shim = types.SimpleNamespace(
        img_size=args.img_size, batch_size=args.batch_size, seed=args.seed,
        model=types.SimpleNamespace(num_classes=0, in_channels=3))
    loader, _ = _make_loader(args, shim)

    mesh = None
    if getattr(args, "mesh", "none") != "none":
        from .parallel import make_mesh

        mesh = make_mesh()
        print(f"[MESH] data over {mesh.devices.size} devices")

    _state, last = train_vae(
        AutoEncoderKL(acfg), loader, tcfg, epochs=args.epochs,
        kl_weight=args.kl_weight, seed=args.seed, mesh=mesh,
        log_every=args.log_every or 50, ckpt_path=args.out,
        configs={"vae": dataclasses.asdict(acfg), "train": tcfg.to_dict()})
    print(json.dumps({"out": args.out, "factor": acfg.factor,
                      "latent_resolution": acfg.latent_resolution, **last}))


def _class_vec(args, exp):
    """``--class-id`` value: None | int (whole grid) | 'all' (cycle every
    class across the grid rows) -> the ``class_id`` arg of the samplers."""
    cid = getattr(args, "class_id", None)
    if cid is None:
        if getattr(args, "guidance", 1.0) != 1.0:
            sys.exit("error: --guidance needs --class-id (what to guide "
                     "toward); use --class-id all for a class-cycled grid")
        return None
    nc = int(getattr(exp.model, "num_classes", 0))
    if not nc:
        sys.exit("error: --class-id needs a class-conditional checkpoint "
                 "(model.num_classes > 0)")
    if getattr(args, "refresh_every", 0) > 1:
        sys.exit("error: --class-id with --refresh-every (encoder-cached "
                 "sampling) is not supported")
    if cid == "all":
        return np.arange(args.n, dtype=np.int32) % nc
    k = int(cid)
    if not 0 <= k < nc:
        sys.exit(f"error: --class-id {k} out of range [0, {nc})")
    return k


def _cfg_msg(args):
    if getattr(args, "class_id", None) is None:
        return ""
    return f" (class={args.class_id}, guidance={args.guidance})"


def _maybe_latent_sample(args, exp, model, sched, state, meta, kind):
    """``--vae CKPT`` on a sample command: the checkpoint holds a LATENT
    denoiser — sample latents and decode through the VAE
    (sampling/latent.py).  The latent scale comes from the denoiser
    checkpoint's meta (written by ``train --latent-vae``) or
    ``--latent-scale``.  Returns True when handled."""
    if not getattr(args, "vae", None):
        return False
    from .sampling import latent_sample
    from .training.vae import load_vae

    vae, vstate, _vm = load_vae(args.vae)
    scale = (meta.get("configs", {}).get("latent", {}).get("scale")
             or getattr(args, "latent_scale", None))
    if not scale:
        sys.exit("error: no latent scale in the checkpoint meta — pass "
                 "--latent-scale (the value train --latent-vae printed)")
    if getattr(args, "sharded", False) or getattr(args, "sde", False):
        sys.exit("error: --vae does not compose with --sharded/--sde yet")
    latent_sample(
        model, state.ema_params if args.ema else state.params, sched,
        vae, vstate.params, n=args.n, scale=float(scale), kind=kind,
        steps=getattr(args, "steps", 50), eta=getattr(args, "eta", 0.0),
        schedule_kind=getattr(args, "schedule", "t_linear"), seed=args.seed,
        class_id=_class_vec(args, exp), guidance=args.guidance,
        save_path=args.out)
    print(f"[INFER-LATENT] grid -> {args.out} ({kind}, decoded through "
          f"{args.vae}){_cfg_msg(args)}")
    return True


def cmd_sample_ddpm(args):
    from .sampling import ddpm_infer_sample

    exp = _exp_from_args(args)
    model, sched, state, meta = _load_state(args.ckpt, exp)
    if _maybe_latent_sample(args, exp, model, sched, state, meta, "ddpm"):
        return
    cls = _class_vec(args, exp)
    if getattr(args, "sharded", False):
        from .parallel import make_mesh
        from .sampling import sample_grid_sharded

        mesh = make_mesh()
        sample_grid_sharded(
            model, state.params, sched, mesh, kind="ddpm", n=args.n,
            img_size=exp.img_size, seed=args.seed, save_path=args.out,
            ema_params=state.ema_params if args.ema else None,
            class_id=cls, guidance=args.guidance,
        )
        print(f"[INFER] grid -> {args.out} (sharded x{mesh.devices.size})"
              f"{_cfg_msg(args)}")
        return
    ddpm_infer_sample(
        model, state.params, sched, n=args.n, img_size=exp.img_size,
        ema_params=state.ema_params if args.ema else None,
        out_path=args.out, seed=args.seed, save_individual=args.individual,
        class_id=cls, guidance=args.guidance,
    )
    print(f"[INFER] grid -> {args.out}{_cfg_msg(args)}")


def cmd_sample_ddim(args):
    from .sampling import ddim_infer_sample

    exp = _exp_from_args(args)
    model, sched, state, meta = _load_state(args.ckpt, exp)
    if _maybe_latent_sample(args, exp, model, sched, state, meta, "ddim"):
        return
    cls = _class_vec(args, exp)
    if getattr(args, "sharded", False):
        from .parallel import make_mesh
        from .sampling import sample_grid_sharded

        mesh = make_mesh()
        sample_grid_sharded(
            model, state.params, sched, mesh, kind="ddim", n=args.n,
            img_size=exp.img_size, seed=args.seed, steps=args.steps,
            eta=args.eta, schedule_kind=args.schedule, save_path=args.out,
            ema_params=state.ema_params if args.ema else None,
            class_id=cls, guidance=args.guidance,
        )
        print(f"[INFER-DDIM] grid -> {args.out} (steps={args.steps},"
              f" sharded x{mesh.devices.size}){_cfg_msg(args)}")
        return
    if getattr(args, "refresh_every", 0) > 1:
        # encoder-cached fast path (sampling/fast.py): decoder-only reuse
        # steps between encoder refreshes
        from .models import UNetDenoiser

        if not isinstance(model, UNetDenoiser):
            sys.exit("--refresh-every: encoder-cached sampling is U-Net-only"
                     " (this checkpoint is a "
                     f"{type(exp.model).__name__} experiment)")
        from .sampling import ddim_sample_fast

        ddim_sample_fast(
            model, state.params, sched, n=args.n, img_size=exp.img_size,
            ema_params=state.ema_params if args.ema else None,
            save_path=args.out, seed=args.seed, steps=args.steps,
            eta=args.eta, schedule_kind=args.schedule,
            refresh_every=args.refresh_every,
        )
        print(f"[INFER-DDIM] grid -> {args.out} (steps={args.steps},"
              f" encoder-cached 1/{args.refresh_every})")
        return
    ddim_infer_sample(
        model, state.params, sched, n=args.n, img_size=exp.img_size,
        ema_params=state.ema_params if args.ema else None,
        out_path=args.out, seed=args.seed, steps=args.steps, eta=args.eta,
        schedule_kind=args.schedule, save_individual=args.individual,
        class_id=cls, guidance=args.guidance,
    )
    print(f"[INFER-DDIM] grid -> {args.out} (steps={args.steps},"
          f" eta={args.eta}){_cfg_msg(args)}")


def cmd_sample_dpmpp(args):
    from .sampling import dpmpp_infer_sample

    exp = _exp_from_args(args)
    model, sched, state, meta = _load_state(args.ckpt, exp)
    if _maybe_latent_sample(args, exp, model, sched, state, meta, "dpmpp"):
        return
    cls = _class_vec(args, exp)
    variant = "SDE" if getattr(args, "sde", False) else ""
    if getattr(args, "sharded", False):
        from .parallel import make_mesh
        from .sampling import sample_grid_sharded

        mesh = make_mesh()
        sample_grid_sharded(
            model, state.params, sched, mesh,
            kind="dpmpp_sde" if args.sde else "dpmpp", n=args.n,
            img_size=exp.img_size, seed=args.seed, steps=args.steps,
            schedule_kind=args.schedule, save_path=args.out,
            ema_params=state.ema_params if args.ema else None,
            class_id=cls, guidance=args.guidance,
        )
        print(f"[INFER-DPM++{variant}] grid -> {args.out} (steps={args.steps},"
              f" sharded x{mesh.devices.size}){_cfg_msg(args)}")
        return
    dpmpp_infer_sample(
        model, state.params, sched, n=args.n, img_size=exp.img_size,
        ema_params=state.ema_params if args.ema else None,
        out_path=args.out, seed=args.seed, steps=args.steps,
        schedule_kind=args.schedule, save_individual=args.individual,
        class_id=cls, guidance=args.guidance, sde=args.sde,
    )
    print(f"[INFER-DPM++{variant}] grid -> {args.out} (steps={args.steps})"
          f"{_cfg_msg(args)}")


def cmd_distill(args):
    """Progressive distillation: halve a checkpoint's DDIM ladder down to
    ``--to-steps`` (training/distill.py).  The output checkpoint samples
    with ``sample-ddim --schedule linear --steps <to-steps>`` (the distilled
    trajectory is exactly that ladder); a ``--guidance`` teacher bakes CFG
    into the student, so the student samples guided at single-forward cost
    (guidance=1)."""
    from .training import TrainConfig, init_train_state, make_optimizer
    from .training import consistency_distill, progressive_distill, save_checkpoint

    exp = _exp_from_args(args)
    model, sched, state, _ = _load_state(args.ckpt, exp)
    teacher = state.ema_params if args.ema else state.params

    nc = int(getattr(exp.model, "num_classes", 0))
    if args.guidance is not None and not nc:
        sys.exit("error: --guidance needs a class-conditional checkpoint "
                 "(the student distills the guided conditional sampler)")
    if sched.prediction_type == "epsilon" and args.mode == "progressive":
        print("[DISTILL] note: epsilon-prediction teacher — distillation "
              "works but v-prediction teachers distill better at few steps "
              "(Salimans & Ho 2022 §4; train with prediction_type: 'v')")

    loader, _ = _make_loader(args, exp)
    cfg = TrainConfig(
        base_lr=args.lr, warmup_steps=0, ema_decay=args.ema_decay,
        grad_clip=exp.train.grad_clip,
        flat_optimizer=exp.train.flat_optimizer,
    )
    if args.mode == "consistency":
        params, info = consistency_distill(
            model, sched, teacher, make_batches=lambda: loader,
            num_ladder_steps=args.ladder_steps, updates=args.phase_updates,
            cfg=cfg, guidance=args.guidance, distance=args.distance,
            seed=exp.seed)
    else:
        params, info = progressive_distill(
            model, sched, teacher, make_batches=lambda: loader,
            start_steps=args.start_steps, end_steps=args.to_steps,
            phase_updates=args.phase_updates, cfg=cfg,
            guidance=args.guidance, weighting=args.weighting, seed=exp.seed)

    out_state, _ = init_train_state(params, cfg, seed=exp.seed,
                                    tx=make_optimizer(cfg))
    path = save_checkpoint(
        args.out, out_state,
        extra={"distilled_steps": info["steps"],
               "distill_mode": args.mode,
               "distill_guidance": args.guidance,
               "distill_phases": info["phases"],
               # CM parameterization scalings (consistency mode): sample-cm
               # and serving must reproduce the distilled f_theta exactly
               **({"cm_sigma_data": info["sigma_data"],
                   "cm_timestep_scaling": info["timestep_scaling"]}
                  if args.mode == "consistency" else {})},
        configs={"experiment": exp.to_dict()})
    print(json.dumps({"out": path, "mode": args.mode, "steps": info["steps"],
                      "phases": info["phases"]}))
    if args.mode == "consistency":
        print(f"[DISTILL] consistency student -> {path}; sample with: "
              f"sample-cm --ckpt {args.out} --steps 1"
              + (" --class-id all" if nc else ""))
    else:
        print(f"[DISTILL] student -> {path}; sample with: sample-ddim "
              f"--ckpt {args.out} --schedule linear --steps {info['steps']}"
              + (f" --class-id all" if nc else ""))


def cmd_sample_cm(args):
    """Sample a consistency-distilled checkpoint (training/consistency.py):
    1 network forward per sample at --steps 1, or the stochastic multistep
    refinement at --steps N.  Guidance is baked in at distillation time
    (Meng et al. 2023), so --guidance is rejected here."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .training import consistency_sample_loop
    from .utils.images import save_image_grid

    if getattr(args, "vae", None):
        sys.exit("sample-cm: latent consistency checkpoints are not "
                 "supported; distill in pixel space")
    if getattr(args, "guidance", 1.0) != 1.0:
        sys.exit("sample-cm: guidance is baked into the student at distill "
                 "time (distill --mode consistency --guidance W); "
                 "sample with --class-id only")

    exp = _exp_from_args(args)
    model, sched, state, meta = _load_state(args.ckpt, exp)
    extra = (meta or {}).get("extra", {}) or {}
    mode = extra.get("distill_mode")
    if mode != "consistency":
        # a base or progressive-distilled checkpoint has no consistency
        # parameterization — f_theta would run but emit garbage silently
        sys.exit(f"sample-cm: checkpoint {args.ckpt} is not a consistency "
                 f"student (meta distill_mode={mode!r}); produce one with "
                 "distill --mode consistency, or sample this checkpoint "
                 "with sample-ddpm/sample-ddim/sample-dpmpp")
    params = state.ema_params if args.ema else state.params

    nc = int(getattr(exp.model, "num_classes", 0))
    cls = _class_vec(args, exp)
    y = None
    if nc:
        if cls is None:
            # the CD loss supervises only REAL labels in every mode (with
            # or without --guidance) — a conditional student's null-class
            # pathway is always untrained
            print("[SAMPLE-CM] warning: conditional consistency student — "
                  "unconditional (no --class-id) output rides the untrained "
                  "NULL class and may be degraded; pass --class-id K or "
                  "'all'")
            y = jnp.full((args.n,), nc, jnp.int32)  # the null (uncond) class
        elif np.ndim(cls) == 0:
            y = jnp.full((args.n,), int(cls), jnp.int32)
        else:
            y = jnp.asarray(cls, jnp.int32)

    # reproduce the f_theta parameterization the student was distilled with
    # (module defaults for pre-knob checkpoints without the extra fields)
    from .training.consistency import SIGMA_DATA, TIMESTEP_SCALING

    x = consistency_sample_loop(
        model, params, sched, (args.n, exp.img_size, exp.img_size, 3),
        jax.random.key(args.seed), steps=args.steps, y=y,
        sigma_data=float(extra.get("cm_sigma_data", SIGMA_DATA)),
        timestep_scaling=float(extra.get("cm_timestep_scaling",
                                         TIMESTEP_SCALING)))
    x01 = np.asarray((x + 1.0) * 0.5)
    save_image_grid(x01, args.out, nrow=int(args.n ** 0.5))
    print(f"[SAMPLE-CM] grid -> {args.out} (steps={args.steps}, NFE="
          f"{args.steps}){_cfg_msg(args)}")


def cmd_img2img(args):
    from .sampling import img2img_infer_sample
    from .utils.images import load_image

    exp = _exp_from_args(args)
    model, sched, state, _ = _load_state(args.ckpt, exp)
    init01 = load_image(args.init, size=exp.img_size)
    img2img_infer_sample(
        model, state.params, sched, init01 * 2.0 - 1.0, n=args.n,
        strength=args.strength, steps=args.steps, eta=args.eta,
        seed=args.seed, out_path=args.out,
        ema_params=state.ema_params if args.ema else None,
        class_id=_class_vec(args, exp), guidance=args.guidance,
    )
    print(f"[IMG2IMG] grid -> {args.out} (strength={args.strength}, "
          f"steps={args.steps}){_cfg_msg(args)}")


def cmd_inpaint(args):
    from .sampling import box_mask, inpaint_infer_sample
    from .utils.images import load_image

    # argument mistakes must fail BEFORE the expensive checkpoint load
    if (args.mask is None) == (args.box is None):
        sys.exit("inpaint: pass exactly one of --mask PNG or --box "
                 "x0,y0,x1,y1")
    exp = _exp_from_args(args)
    model, sched, state, _ = _load_state(args.ckpt, exp)
    init01 = load_image(args.init, size=exp.img_size)
    if args.mask is not None:
        # white (1) = keep, black (0) = generate
        m = load_image(args.mask, size=exp.img_size, grayscale=True)
        mask = (m >= 0.5).astype("float32")
    else:
        mask = box_mask(exp.img_size, [int(v) for v in args.box.split(",")])
    inpaint_infer_sample(
        model, state.params, sched, init01 * 2.0 - 1.0, mask, n=args.n,
        steps=args.steps, eta=args.eta, resamples=args.resamples,
        seed=args.seed, out_path=args.out,
        ema_params=state.ema_params if args.ema else None,
        class_id=_class_vec(args, exp), guidance=args.guidance,
    )
    frac = float(1.0 - mask.mean())
    print(f"[INPAINT] grid -> {args.out} (steps={args.steps}, "
          f"resamples={args.resamples}, generated={frac:.0%} of pixels)"
          f"{_cfg_msg(args)}")


def cmd_upsample(args):
    from .sampling import upsample_infer_sample
    from .utils.images import load_image

    exp = _exp_from_args(args)
    if not int(getattr(exp.model, "cond_channels", 0) or 0):
        sys.exit("error: upsample needs an image-conditional (SR) checkpoint"
                 " — train one with TrainConfig.superres_factor"
                 " (e.g. --preset sr64to256)")
    model, sched, state, _ = _load_state(args.ckpt, exp)
    low01 = load_image(args.init, size=args.low_size)
    upsample_infer_sample(
        model, state.params, sched, low01 * 2.0 - 1.0, n=args.n,
        steps=args.steps, eta=args.eta, seed=args.seed, out_path=args.out,
        ema_params=state.ema_params if args.ema else None,
        class_id=_class_vec(args, exp), guidance=args.guidance,
    )
    print(f"[UPSAMPLE] grid -> {args.out} ({low01.shape[0]}px -> "
          f"{exp.model.img_resolution}px, steps={args.steps})"
          f"{_cfg_msg(args)}")


def cmd_cascade(args):
    from .sampling import cascade_infer_sample

    base_exp = _exp_from_args(
        argparse.Namespace(config=args.base_config, preset=args.preset,
                           ckpt=args.base_ckpt))
    sr_exp = _exp_from_args(args)
    if not int(getattr(sr_exp.model, "cond_channels", 0) or 0):
        sys.exit("error: --ckpt must be an image-conditional (SR) checkpoint"
                 " (cond_channels > 0); the base model goes in --base-ckpt")
    base_model, base_sched, base_state, _ = _load_state(args.base_ckpt, base_exp)
    sr_model, sr_sched, sr_state, _ = _load_state(args.ckpt, sr_exp)
    low01, hi01 = cascade_infer_sample(
        base_model,
        base_state.ema_params if args.ema else base_state.params, base_sched,
        sr_model,
        sr_state.ema_params if args.ema else sr_state.params, sr_sched,
        n=args.n, base_steps=args.base_steps, sr_steps=args.steps,
        eta=args.eta, seed=args.seed, out_path=args.out,
        out_low_path=args.out_low,
        class_id=_class_vec(args, base_exp), guidance=args.guidance,
    )
    print(f"[CASCADE] {base_exp.model.img_resolution}px x{args.n}"
          f" (base {args.base_steps} steps) -> "
          f"{sr_exp.model.img_resolution}px grid -> {args.out}"
          f" (sr {args.steps} steps){_cfg_msg(args)}")


def cmd_strip(args):
    from .sampling import render_denoise_strip, render_denoise_strip_ddim

    exp = _exp_from_args(args)
    model, sched, state, _ = _load_state(args.ckpt, exp)
    p = state.ema_params if args.ema else state.params
    if args.sampler == "ddim":
        render_denoise_strip_ddim(
            model, p, sched, img_size=exp.img_size, out_path=args.out,
            seed=args.seed, steps=args.steps, eta=args.eta,
        )
    else:
        render_denoise_strip(
            model, p, sched, img_size=exp.img_size, out_path=args.out,
            seed=args.seed,
        )
    print(f"[DENOISE] strip -> {args.out}")


def cmd_eval(args):
    """Score a checkpoint without training: eval-mode L_simple on a held-out
    set for BOTH raw and EMA params (fixed t/noise draws — comparable across
    checkpoints), plus rFID of an EMA sample grid against the held-out
    images.  The checkpoint-selection workflow the reference lacks."""
    from .sampling import ddpm_sample
    from .training import evaluate_loss, make_eval_step
    from .utils.fid import rfid

    exp = _exp_from_args(args)
    model, sched, state, meta = _load_state(args.ckpt, exp)
    nc = int(getattr(exp.model, "num_classes", 0))
    n_eval = max(args.eval_size // exp.batch_size, 1) * exp.batch_size
    if args.data == "celeba":
        if nc:
            sys.exit("error: --data celeba has no labels; evaluate "
                     "conditional checkpoints with --data blobs/synthetic")
        from .data import get_celeba_loaders

        _tr, eval_loader, _te = get_celeba_loaders(
            data_dir=args.data_dir, img_size=exp.img_size,
            batch_size=exp.batch_size, seed=exp.seed)
    elif args.data == "blobs":
        from .data import BlobFacesDataset, DataLoader

        eval_loader = DataLoader(
            BlobFacesDataset(n_eval, img_size=exp.img_size,
                             seed=exp.seed + 777, num_classes=nc),
            exp.batch_size, shuffle=False)
    else:  # synthetic
        from .data import ArrayDataset, DataLoader

        labels = (np.arange(n_eval, dtype=np.int64) % nc) if nc else None
        eval_loader = DataLoader(
            ArrayDataset(_synthetic_array(exp, n_eval, exp.seed + 777),
                         labels),
            exp.batch_size, shuffle=False)

    eval_fn = make_eval_step(model, sched)
    out = {
        "ckpt": args.ckpt,
        "global_step": meta.get("global_step"),
        "val_loss": evaluate_loss(eval_fn, state.params, eval_loader,
                                  labeled=bool(nc)),
        "val_loss_ema": evaluate_loss(eval_fn, state.ema_params, eval_loader,
                                      labeled=bool(nc)),
    }
    if args.rfid_n:
        samples = ddpm_sample(model, state.ema_params, sched, args.rfid_n,
                              exp.img_size, seed=args.seed,
                              return_grid=False)
        # stop pulling batches once 256 reference images are in hand — for
        # --data celeba the full valid split would be ~1 GB of host RAM at
        # 64px (far more at 256px) just to keep the first 256
        chunks, have = [], 0
        for b in eval_loader:
            chunks.append(_as_eval_array(b))
            have += chunks[-1].shape[0]
            if have >= 256:
                break
        ref = np.concatenate(chunks)[:256]
        out["rfid_ema"] = rfid((ref + 1.0) / 2.0, samples)
        if getattr(args, "fid_extractor", None):
            # true FID via a mounted extractor file (utils/fid.py hook)
            from .utils.fid import fid

            out["fid_ema"] = fid((ref + 1.0) / 2.0, samples,
                                 extractor_path=args.fid_extractor)
    if args.nll or args.nll_full:
        out.update(_eval_nll(args, exp, model, sched, state, eval_loader, nc))
    print(json.dumps(out))


def _eval_nll(args, exp, model, sched, state, eval_loader, nc):
    """Variational-bound bits/dim on EMA params (ops/likelihood.py) over the
    first --nll-n held-out images; labeled loaders score the CONDITIONAL
    bound (y threaded through cfg_eps_fn at guidance 1)."""
    import jax

    from .ops.likelihood import vlb_bits_per_dim, vlb_bits_per_dim_mc
    from .sampling import cfg_eps_fn

    if int(getattr(exp.model, "cond_channels", 0) or 0):
        sys.exit("error: --nll needs a plain denoiser; SR upsampler "
                 "checkpoints model p(x_hi | x_lo), not p(x)")
    want = args.nll_n or exp.batch_size
    xs, ys = [], []
    for b in eval_loader:
        if isinstance(b, (tuple, list)):
            xs.append(np.asarray(b[0], np.float32))
            ys.append(np.asarray(b[1]))
        else:
            xs.append(np.asarray(b, np.float32))
        if sum(x.shape[0] for x in xs) >= want:
            break
    x0 = np.concatenate(xs)[:want]
    y = np.concatenate(ys)[: x0.shape[0]] if (nc and ys) else None
    eps_fn = cfg_eps_fn(model, state.ema_params, y=y, sched=sched)

    @jax.jit
    def _full(x0):
        return vlb_bits_per_dim(sched, eps_fn, x0, jax.random.key(args.seed))

    @jax.jit
    def _mc(x0):
        return vlb_bits_per_dim_mc(sched, eps_fn, x0,
                                   jax.random.key(args.seed),
                                   num_t=int(args.nll))

    bpd = np.asarray(_full(x0) if args.nll_full else _mc(x0))
    key = "nll_bpd_full" if args.nll_full else f"nll_bpd_mc{int(args.nll)}"
    return {key: float(bpd.mean()), "nll_n": int(x0.shape[0]),
            "nll_conditional": bool(y is not None)}


def _as_eval_array(batch):
    x = batch[0] if isinstance(batch, (tuple, list)) else batch
    return np.asarray(x, np.float32)


def cmd_import_torch(args):
    """Migrate a reference (pytorch) checkpoint into this framework — maps
    model + EMA weights, keeps the step clock, writes a full Orbax
    TrainState checkpoint + meta sidecar (utils/interop.py)."""
    from .utils.interop import import_torch_checkpoint

    exp = _exp_from_args(args)
    path, info = import_torch_checkpoint(
        args.torch_ckpt, exp, args.out, require_ema=args.require_ema)
    print(json.dumps({"out": path, **info}))


def cmd_export_torch(args):
    """The migration off-ramp: render an Orbax TrainState checkpoint as a
    reference-format torch file (model + EMA shadow + step; see
    utils/interop.py export_torch_checkpoint) so a model trained here loads
    straight into the reference's load_ckpt (chekpoints.py:16-25)."""
    from .utils.interop import export_torch_checkpoint

    exp = _exp_from_args(args)
    _model, _sched, state, _meta = _load_state(args.ckpt, exp)
    path, info = export_torch_checkpoint(state, exp, args.out)
    print(json.dumps({"out": path, **info}))


def cmd_info(args):
    exp = _exp_from_args(args)
    print(exp.to_json())


def main(argv=None):
    # epoch tables must land in redirected logs as they happen, not at the
    # 8 KB pipe-buffer flush (production runs tail the logfile)
    try:
        sys.stdout.reconfigure(line_buffering=True)
    except (AttributeError, ValueError):
        pass  # non-reconfigurable stream (pytest capture, notebooks)
    p = argparse.ArgumentParser(prog="ddpm-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, ckpt_required=False):
        sp.add_argument("--preset", default="celeba64_low")
        sp.add_argument("--config", help="path to ExperimentConfig JSON")
        if ckpt_required:
            sp.add_argument("--ckpt", required=True)
            sp.add_argument("--ema", action="store_true")
            sp.add_argument("--seed", type=int, default=1234)

    sp = sub.add_parser("train")
    common(sp)
    sp.add_argument("--data", default="synthetic",
                    choices=["synthetic", "blobs", "zip", "hf", "celeba"])
    sp.add_argument("--zip-path")
    sp.add_argument("--no-crop", action="store_true",
                    help="zip data: skip the 178 CelebA face crop (for "
                         "pre-cropped square corpora, e.g. CelebA-HQ zips)")
    sp.add_argument("--data-dir", default="data")
    sp.add_argument("--synthetic-size", type=int, default=512)
    sp.add_argument("--preload", action="store_true",
                    help="blobs: render the whole corpus to RAM up front "
                         "(feeds the chip at full training rate)")
    sp.add_argument("--device-cache", action="store_true",
                    help="pin the training corpus in device HBM (uint8) and "
                         "gather batches on device — removes per-step "
                         "host->device traffic (essential on slow-link "
                         "hosts; costs corpus_bytes/4 of HBM). zip/hf/"
                         "celeba decode the whole corpus once up front; "
                         "implies --preload for blobs.")
    sp.add_argument("--device-cache-sharded", action="store_true",
                    help="like --device-cache, but the corpus SHARDS over "
                         "the mesh's data axis (corpus_bytes/n_devices of "
                         "HBM per chip; cross-shard batch rows ride ICI). "
                         "Requires --mesh.")
    sp.add_argument("--epochs", type=int)
    sp.add_argument("--max-batches", type=int)
    sp.add_argument("--ckpt-dir", default="checkpoints")
    sp.add_argument("--resume")
    sp.add_argument("--log-every", type=int)
    sp.add_argument("--probes", action="store_true")
    sp.add_argument("--no-samples", action="store_true")
    sp.add_argument("--loss-weighting",
                    choices=["uniform", "snr", "p2", "min_snr_5"])
    sp.add_argument("--mesh", default="none", choices=["none", "dp", "fsdp"],
                    help="shard the run over all visible devices (DP batch "
                         "sharding; fsdp also shards params/optimizer)")
    sp.add_argument("--eval-every", type=int, default=0, metavar="N",
                    help="validation loss (raw+EMA) every N epochs (0=off)")
    sp.add_argument("--eval-max-batches", type=int)
    sp.add_argument("--val-frac", type=float, default=0.0, metavar="F",
                    help="with --data zip and --eval-every: hold out this "
                         "seeded fraction of the corpus as the validation "
                         "split (the zip source has no official partition)")
    sp.add_argument("--fid-extractor", metavar="WEIGHTS",
                    help="mounted feature-extractor file (TorchScript module "
                         "or inception_v3 state_dict): score TRUE FID next "
                         "to rFID at every sampling epoch")
    # resume-time overrides (reference parity: main_train_loop.py:69-77)
    sp.add_argument("--reset-optimizer", action="store_true",
                    help="on resume: fresh optimizer state (warmup clock "
                         "fast-forwarded)")
    sp.add_argument("--override-lr", type=float)
    sp.add_argument("--override-weight-decay", type=float)
    sp.add_argument("--override-ema-decay", type=float)
    sp.add_argument("--repair-ema", nargs="?", const="auto",
                    choices=["auto", "force"],
                    help="on resume: re-seed the EMA shadow from the model — "
                         "'auto' (default) only when the health check fails "
                         "(reference semantics), 'force' unconditionally "
                         "(recover a healthy-but-lagging shadow)")
    sp.add_argument("--latent-vae", metavar="VAE_CKPT",
                    help="latent diffusion (LDM): encode the pixel corpus "
                         "through this train-vae checkpoint and train the "
                         "denoiser on latents — the experiment config must "
                         "be latent-shaped (model.in_channels = VAE "
                         "latent_channels, img_size = VAE latent grid, "
                         "diffusion.clamp_x0 = false)")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser(
        "train-vae",
        help="train the KL-VAE autoencoder stage of the latent-diffusion "
             "family (models/autoencoder.py); its checkpoint feeds "
             "train --latent-vae and sample-* --vae")
    sp.add_argument("--out", required=True, help="checkpoint dir to write")
    sp.add_argument("--data", default="synthetic",
                    choices=["synthetic", "blobs", "zip", "hf", "celeba"])
    sp.add_argument("--zip-path")
    sp.add_argument("--no-crop", action="store_true")
    sp.add_argument("--data-dir", default="data")
    sp.add_argument("--synthetic-size", type=int, default=512)
    sp.add_argument("--preload", action="store_true")
    sp.add_argument("--img-size", type=int, default=64)
    sp.add_argument("--batch-size", type=int, default=64)
    sp.add_argument("--epochs", type=int, default=20)
    sp.add_argument("--base-channels", type=int, default=64)
    sp.add_argument("--channel-mults", default="1,2,4", metavar="M,M,...",
                    help="downsample factor = 2^(len-1); 1,2,4 -> f=4 "
                         "(64px -> 16px latents)")
    sp.add_argument("--num-res-blocks", type=int, default=2)
    sp.add_argument("--latent-channels", type=int, default=4)
    sp.add_argument("--kl-weight", type=float, default=1e-4)
    sp.add_argument("--lr", type=float, default=1e-3)
    sp.add_argument("--warmup", type=int, default=100)
    sp.add_argument("--ema-decay", type=float, default=0.999)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--log-every", type=int, default=0)
    sp.add_argument("--mesh", default="none", choices=["none", "dp"])
    sp.set_defaults(fn=cmd_train_vae)

    def cfg_args(sp):
        """class-conditional sampling knobs (conditional checkpoints only)."""
        sp.add_argument("--class-id", default=None, metavar="K|all",
                        help="class to sample (int), or 'all' to cycle every "
                             "class across the grid; needs a conditional "
                             "checkpoint (model.num_classes > 0)")
        sp.add_argument("--guidance", type=float, default=1.0, metavar="W",
                        help="classifier-free guidance scale: 1 = plain "
                             "conditional, 0 = unconditional, >1 amplifies "
                             "the class (typ. 1.5-5)")
        sp.add_argument("--vae", metavar="VAE_CKPT",
                        help="latent checkpoint (train --latent-vae): sample "
                             "latents and decode through this VAE")
        sp.add_argument("--latent-scale", type=float,
                        help="override the latent scale (normally read from "
                             "the denoiser checkpoint's meta)")

    sp = sub.add_parser("sample-ddpm")
    common(sp, ckpt_required=True)
    sp.add_argument("--n", type=int, default=36)
    sp.add_argument("--out", default="samples_ddpm.png")
    sp.add_argument("--individual", action="store_true")
    sp.add_argument("--sharded", action="store_true",
                    help="shard the batch over all devices (SPMD sampling)")
    cfg_args(sp)
    sp.set_defaults(fn=cmd_sample_ddpm)

    sp = sub.add_parser("sample-ddim")
    common(sp, ckpt_required=True)
    sp.add_argument("--n", type=int, default=36)
    sp.add_argument("--steps", type=int, default=50)
    sp.add_argument("--eta", type=float, default=0.0)
    sp.add_argument("--schedule", default="t_linear",
                    choices=["t_linear", "linear", "alpha_bar_cosine", "cosine",
                             "karras"])
    sp.add_argument("--out", default="samples_ddim.png")
    sp.add_argument("--individual", action="store_true")
    sp.add_argument("--sharded", action="store_true",
                    help="shard the batch over all devices (SPMD sampling)")
    sp.add_argument("--refresh-every", type=int, default=0, metavar="K",
                    help="encoder-cached fast DDIM: recompute encoder "
                         "features every K steps, decoder-only between "
                         "(0/1 = full model every step)")
    cfg_args(sp)
    sp.set_defaults(fn=cmd_sample_ddim)

    sp = sub.add_parser(
        "sample-dpmpp",
        help="DPM-Solver++(2M) grid: DDIM-50 quality in ~20 steps "
             "(sampling/solvers.py, beyond the reference's sampler pair)")
    common(sp, ckpt_required=True)
    sp.add_argument("--n", type=int, default=36)
    sp.add_argument("--steps", type=int, default=20)
    sp.add_argument("--schedule", default="t_linear",
                    choices=["t_linear", "linear", "alpha_bar_cosine", "cosine",
                             "karras"])
    sp.add_argument("--out", default="samples_dpmpp.png")
    sp.add_argument("--individual", action="store_true")
    sp.add_argument("--sharded", action="store_true",
                    help="shard the batch over all devices (SPMD sampling)")
    sp.add_argument("--sde", action="store_true",
                    help="stochastic SDE-DPM-Solver++(2M): fresh noise each "
                         "step (re-injects what a coarse ladder "
                         "under-resolves, like DDIM eta>0)")
    cfg_args(sp)
    sp.set_defaults(fn=cmd_sample_dpmpp)

    sp = sub.add_parser(
        "distill",
        help="progressive distillation (Salimans & Ho 2022): halve a "
             "checkpoint's DDIM ladder down to --to-steps; optionally bake "
             "CFG in (training/distill.py, beyond the reference)")
    common(sp, ckpt_required=True)
    sp.add_argument("--out", required=True,
                    help="output checkpoint directory for the student")
    sp.add_argument("--data", default="blobs",
                    choices=["synthetic", "blobs", "zip", "hf", "celeba"])
    sp.add_argument("--zip-path")
    sp.add_argument("--no-crop", action="store_true")
    sp.add_argument("--data-dir", default="data")
    sp.add_argument("--synthetic-size", type=int, default=512)
    sp.add_argument("--preload", action="store_true")
    sp.add_argument("--device-cache", action="store_true")
    sp.add_argument("--val-frac", type=float, default=0.0, metavar="F",
                    help="with --data zip: exclude the same seeded held-out "
                         "fraction the train run held out, so the student "
                         "never sees evaluation faces")
    sp.add_argument("--start-steps", type=int, default=64,
                    help="the teacher's DDIM step count (the first student "
                         "learns start-steps/2)")
    sp.add_argument("--to-steps", type=int, default=4,
                    help="stop when the student reaches this many steps")
    sp.add_argument("--phase-updates", type=int, default=400,
                    help="optimizer updates per halving phase")
    sp.add_argument("--lr", type=float, default=1e-4,
                    help="distillation LR (no warmup; lower than training)")
    sp.add_argument("--ema-decay", type=float, default=0.999,
                    help="student EMA (the EMA student seeds the next phase)")
    sp.add_argument("--guidance", type=float, default=None, metavar="W",
                    help="bake CFG at this scale into the student "
                         "(conditional checkpoints; student then samples "
                         "guided at guidance=1 cost)")
    sp.add_argument("--weighting", default="truncated_snr",
                    choices=["truncated_snr", "snr", "uniform"])
    sp.add_argument("--mode", default="progressive",
                    choices=["progressive", "consistency"],
                    help="progressive = ladder halving (Salimans & Ho); "
                         "consistency = one-phase consistency distillation "
                         "(Song et al. 2023) — student samples at ANY NFE "
                         "via sample-cm")
    sp.add_argument("--ladder-steps", type=int, default=32,
                    help="[consistency] teacher ladder segments N (the CD "
                         "pairing grid; NOT the student's sampling steps)")
    sp.add_argument("--distance", default="pseudo_huber",
                    choices=["pseudo_huber", "l2"],
                    help="[consistency] CD distance (pseudo-Huber: Song & "
                         "Dhariwal 2023)")
    sp.set_defaults(fn=cmd_distill)

    sp = sub.add_parser(
        "sample-cm",
        help="sample a consistency-distilled checkpoint at 1..N forwards "
             "(training/consistency.py, beyond the reference)")
    common(sp, ckpt_required=True)
    sp.add_argument("--n", type=int, default=16)
    sp.add_argument("--steps", type=int, default=2,
                    help="network forwards per sample (1 = single-step)")
    sp.add_argument("--out", default="samples_cm.png")
    cfg_args(sp)
    sp.set_defaults(fn=cmd_sample_cm)

    sp = sub.add_parser(
        "img2img",
        help="SDEdit: noise a real image to strength*T and denoise it back "
             "(sampling/editing.py, beyond the reference)")
    common(sp, ckpt_required=True)
    sp.add_argument("--init", required=True,
                    help="input image (center-cropped + resized to the "
                         "model resolution)")
    sp.add_argument("--n", type=int, default=9,
                    help="variations to draw (grid rows get independent "
                         "noise)")
    sp.add_argument("--strength", type=float, default=0.6,
                    help="(0,1]: fraction of the ladder to run — small = "
                         "faithful edit, 1.0 = near-from-scratch")
    sp.add_argument("--steps", type=int, default=50,
                    help="FULL-ladder step count before truncation")
    sp.add_argument("--eta", type=float, default=0.0)
    sp.add_argument("--out", default="samples_img2img.png")
    cfg_args(sp)
    sp.set_defaults(fn=cmd_img2img)

    sp = sub.add_parser(
        "inpaint",
        help="regenerate a masked region of a real image (RePaint-style "
             "replace + optional resampling; mask=white kept exactly)")
    common(sp, ckpt_required=True)
    sp.add_argument("--init", required=True, help="input image")
    sp.add_argument("--mask",
                    help="grayscale PNG: white = keep, black = generate")
    sp.add_argument("--box", metavar="x0,y0,x1,y1",
                    help="generate inside this pixel box instead of a mask "
                         "file")
    sp.add_argument("--n", type=int, default=9)
    sp.add_argument("--steps", type=int, default=50)
    sp.add_argument("--eta", type=float, default=0.0)
    sp.add_argument("--resamples", type=int, default=1,
                    help="RePaint harmonization repeats per step (1 = plain "
                         "replace method)")
    sp.add_argument("--out", default="samples_inpaint.png")
    cfg_args(sp)
    sp.set_defaults(fn=cmd_inpaint)

    sp = sub.add_parser(
        "upsample",
        help="super-resolve a low-res image with an SR upsampler checkpoint "
             "(SR3/cascaded diffusion — sampling/superres.py, beyond the "
             "reference)")
    common(sp, ckpt_required=True)
    sp.add_argument("--init", required=True,
                    help="low-resolution input image (kept at its native "
                         "size unless --low-size crops/resizes it first)")
    sp.add_argument("--low-size", type=int, default=None,
                    help="center-crop + resize the input to this size "
                         "before conditioning (e.g. 64)")
    sp.add_argument("--n", type=int, default=4,
                    help="variations to draw (independent noise per row)")
    sp.add_argument("--steps", type=int, default=50)
    sp.add_argument("--eta", type=float, default=0.0)
    sp.add_argument("--out", default="samples_upsampled.png")
    cfg_args(sp)
    sp.set_defaults(fn=cmd_upsample)

    sp = sub.add_parser(
        "cascade",
        help="two-stage generation: sample a base checkpoint, then "
             "super-resolve every sample with an SR upsampler checkpoint")
    common(sp, ckpt_required=True)
    sp.add_argument("--base-ckpt", required=True,
                    help="the low-resolution base model checkpoint "
                         "(--ckpt is the SR upsampler)")
    sp.add_argument("--base-config",
                    help="ExperimentConfig JSON for the base model "
                         "(default: the base checkpoint's meta sidecar)")
    sp.add_argument("--n", type=int, default=4)
    sp.add_argument("--base-steps", type=int, default=50,
                    help="DDIM steps for the base stage")
    sp.add_argument("--steps", type=int, default=50,
                    help="DDIM steps for the SR stage")
    sp.add_argument("--eta", type=float, default=0.0)
    sp.add_argument("--out", default="samples_cascade.png")
    sp.add_argument("--out-low", default=None,
                    help="also save the base-stage grid here")
    cfg_args(sp)
    sp.set_defaults(fn=cmd_cascade)

    sp = sub.add_parser("strip")
    common(sp, ckpt_required=True)
    sp.add_argument("--sampler", default="ddim", choices=["ddpm", "ddim"])
    sp.add_argument("--steps", type=int, default=50)
    sp.add_argument("--eta", type=float, default=0.0)
    sp.add_argument("--out", default="denoise_strip.png")
    sp.set_defaults(fn=cmd_strip)

    sp = sub.add_parser("eval")
    common(sp, ckpt_required=True)
    sp.add_argument("--data", default="blobs",
                    choices=["synthetic", "blobs", "celeba"])
    sp.add_argument("--data-dir", default="data")
    sp.add_argument("--eval-size", type=int, default=512,
                    help="held-out set size for the procedural sources")
    sp.add_argument("--rfid-n", type=int, default=36, metavar="N",
                    help="EMA sample count for rFID (0 = skip sampling)")
    sp.add_argument("--fid-extractor", metavar="WEIGHTS",
                    help="mounted feature-extractor file (TorchScript module "
                         "or inception_v3 state_dict) — scores TRUE FID in "
                         "addition to rFID (utils/fid.py offline hook)")
    sp.add_argument("--nll", type=int, default=0, metavar="NUM_T",
                    help="variational-bound bits/dim on EMA params from "
                         "NUM_T Monte-Carlo timestep draws per image "
                         "(ops/likelihood.py); 0 = skip")
    sp.add_argument("--nll-full", action="store_true",
                    help="exact bound: all T terms per image (one model "
                         "eval per t — the cost of a full ancestral pass)")
    sp.add_argument("--nll-n", type=int, default=0, metavar="N",
                    help="images to score (0 = one eval batch)")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser(
        "import-torch",
        help="convert a reference torch checkpoint (chekpoints.py format or "
             "bare state_dict) into an Orbax checkpoint")
    common(sp)
    sp.add_argument("--torch-ckpt", required=True,
                    help="path to the torch .pt/.pth file")
    sp.add_argument("--out", required=True,
                    help="output checkpoint directory")
    sp.add_argument("--require-ema", action="store_true",
                    help="fail if the file has no EMA shadow (default: fall "
                         "back to raw weights)")
    sp.set_defaults(fn=cmd_import_torch)

    sp = sub.add_parser(
        "export-torch",
        help="convert an Orbax checkpoint into a reference-format torch "
             "checkpoint (model + EMA shadow + step) loadable by the "
             "reference's load_ckpt")
    common(sp)
    sp.add_argument("--ckpt", required=True,
                    help="Orbax checkpoint directory to export")
    sp.add_argument("--out", required=True,
                    help="output .pt file path")
    sp.set_defaults(fn=cmd_export_torch)

    sp = sub.add_parser("info")
    common(sp)
    sp.add_argument("--ckpt")
    sp.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
