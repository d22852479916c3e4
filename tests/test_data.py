"""Data-layer tests — transforms ([-1,1] range, crop/resize shapes), folder
dataset with corrupt-image tolerance, zip extraction, seeded subsets,
loader shuffling/determinism/drop_last, device prefetch.
Coverage mirrors ``testing/test_data_loading.py`` without network access
(synthetic PNG fixtures; HF path is import-gated)."""

import os
import zipfile

import numpy as np
import pytest

from ddpm_diffusion_model_tpu.data import (
    ArrayDataset,
    DataLoader,
    ImageFolderDataset,
    SubsetDataset,
    create_subset_dataloader,
    denormalize,
    device_prefetch,
    ensure_extracted,
    get_celeba_loader_from_zip,
    make_celeba_transform,
)


@pytest.fixture(scope="module")
def img_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for sub in ("a", "b"):
        os.makedirs(root / sub, exist_ok=True)
        for i in range(6):
            arr = (rng.random((178, 218, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(root / sub / f"{sub}{i}.jpg")
    # one corrupt file
    with open(root / "a" / "broken.png", "wb") as f:
        f.write(b"not a real png")
    return str(root)


def test_transform_range_and_shape(img_root):
    from PIL import Image

    t = make_celeba_transform(img_size=64, crop=178)
    img = Image.open(os.path.join(img_root, "a", "a0.jpg"))
    out = t(img)
    assert out.shape == (64, 64, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0
    # mid-gray maps to ~0
    gray = Image.new("RGB", (200, 200), (128, 128, 128))
    np.testing.assert_allclose(t(gray).mean(), 0.0039, atol=0.01)


@pytest.mark.parametrize("size", [32, 64, 128])
def test_transform_size_sweep(img_root, size):
    from PIL import Image

    t = make_celeba_transform(img_size=size, crop=178, initial_resize=178)
    out = t(Image.open(os.path.join(img_root, "b", "b1.jpg")))
    assert out.shape == (size, size, 3)


def test_denormalize():
    x = np.array([-1.0, 0.0, 1.0, 2.0])
    np.testing.assert_allclose(denormalize(x), [0.0, 0.5, 1.0, 1.0])


def test_folder_dataset_corrupt_next(img_root):
    ds = ImageFolderDataset(img_root, make_celeba_transform(32), on_corrupt="next")
    assert len(ds) == 13  # 12 good + 1 broken
    # find broken index and ensure it yields a valid neighbor image
    broken_idx = next(i for i, p in enumerate(ds.paths) if "broken" in p)
    x, y = ds[broken_idx]
    assert x.shape == (32, 32, 3) and np.isfinite(x).all()


def test_folder_dataset_corrupt_zeros(img_root):
    ds = ImageFolderDataset(
        img_root, make_celeba_transform(32), on_corrupt="zeros", img_size=32
    )
    broken_idx = next(i for i, p in enumerate(ds.paths) if "broken" in p)
    x, _ = ds[broken_idx]
    np.testing.assert_array_equal(x, 0.0)


def test_zip_loader_end_to_end(img_root, tmp_path):
    zp = str(tmp_path / "celeba.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        for dp, _dn, files in os.walk(img_root):
            for fn in files:
                if fn.endswith(".jpg"):
                    full = os.path.join(dp, fn)
                    zf.write(full, os.path.relpath(full, img_root))
    loader = get_celeba_loader_from_zip(
        zp, extract_dir=str(tmp_path / "ex"), img_size=32, batch_size=4,
        num_workers=2,
    )
    x, y = next(iter(loader))
    assert x.shape == (4, 32, 32, 3)
    assert x.min() >= -1 and x.max() <= 1
    # idempotent extraction
    ensure_extracted(zp, str(tmp_path / "ex"))


def test_materialize_corpus_bridges_zip_to_device_cache(img_root, tmp_path):
    """materialize_corpus decodes a decode-per-item source into one array
    (matching an unshuffled pass) so zip/hf corpora can ride the device
    cache (CLI --device-cache on real data)."""
    from ddpm_diffusion_model_tpu.data import (
        DeviceCacheLoader,
        materialize_corpus,
    )

    zp = str(tmp_path / "celeba.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        for dp, _dn, files in os.walk(img_root):
            for fn in files:
                if fn.endswith(".jpg"):
                    full = os.path.join(dp, fn)
                    zf.write(full, os.path.relpath(full, img_root))
    loader = get_celeba_loader_from_zip(
        zp, extract_dir=str(tmp_path / "ex"), img_size=32, batch_size=4,
        num_workers=2,
    )
    arr = materialize_corpus(loader, batch_size=3, num_workers=2)
    assert arr.shape == (len(loader.dataset), 32, 32, 3)
    assert arr.dtype == np.float32

    manual = np.concatenate([
        loader.dataset[i][0][None] for i in range(len(loader.dataset))])
    np.testing.assert_allclose(arr, manual, atol=1e-6)

    dev = DeviceCacheLoader(arr, 4, shuffle=False, quantize=True)
    x, _ = next(iter(dev))
    np.testing.assert_allclose(np.asarray(x), arr[:4], atol=1.01 / 255)


def test_subset_seeded_and_capped():
    data = np.arange(50, dtype=np.float32).reshape(50, 1, 1, 1)
    ds = ArrayDataset(np.broadcast_to(data, (50, 4, 4, 3)).copy())
    s1 = SubsetDataset(ds, max_samples=10, seed=1)
    s2 = SubsetDataset(ds, max_samples=10, seed=1)
    s3 = SubsetDataset(ds, max_samples=10, seed=2)
    assert len(s1) == 10
    np.testing.assert_array_equal(s1.indices, s2.indices)
    assert not np.array_equal(s1.indices, s3.indices)
    assert len(set(s1.indices.tolist())) == 10  # no replacement


def test_loader_batching_shuffle_determinism():
    n = 37
    arr = np.arange(n, dtype=np.float32).reshape(n, 1, 1, 1)
    ds = ArrayDataset(np.broadcast_to(arr, (n, 2, 2, 3)).copy())

    dl = DataLoader(ds, 8, shuffle=True, seed=5, num_workers=2)
    assert len(dl) == 4  # drop_last
    ep0 = np.concatenate([x[..., 0, 0, 0] for x, _ in dl])
    ep1 = np.concatenate([x[..., 0, 0, 0] for x, _ in dl])
    assert not np.array_equal(ep0, ep1)  # reshuffled across epochs

    dl2 = DataLoader(ds, 8, shuffle=True, seed=5, num_workers=2)
    ep0b = np.concatenate([x[..., 0, 0, 0] for x, _ in dl2])
    np.testing.assert_array_equal(ep0, ep0b)  # same seed -> same order

    dl3 = DataLoader(ds, 8, shuffle=False, drop_last=False, num_workers=2)
    all_vals = np.concatenate([x[..., 0, 0, 0] for x, _ in dl3])
    np.testing.assert_array_equal(all_vals, np.arange(n, dtype=np.float32))
    assert len(dl3) == 5


def test_device_cache_loader_matches_dataloader():
    """DeviceCacheLoader is a drop-in for DataLoader on an array corpus:
    identical per-epoch shuffle orders, device-resident batches."""
    import jax

    from ddpm_diffusion_model_tpu.data import DeviceCacheLoader

    n = 37
    arr = np.random.default_rng(7).random((n, 2, 2, 3)).astype(np.float32)

    host = DataLoader(ArrayDataset(arr), 8, shuffle=True, seed=5,
                      num_workers=2)
    dev = DeviceCacheLoader(arr, 8, shuffle=True, seed=5)
    assert len(host) == len(dev) == 4
    for (hx, _), (dx, _) in zip(host, dev):
        assert isinstance(dx, jax.Array)
        np.testing.assert_array_equal(hx, np.asarray(dx))
    # epoch 1 differs from epoch 0 but still matches the host loader
    for (hx, _), (dx, _) in zip(host, dev):
        np.testing.assert_array_equal(hx, np.asarray(dx))

    # set_epoch pins the stream (resume semantics)
    dev.set_epoch(0)
    first = np.asarray(next(iter(dev))[0])
    dev.set_epoch(0)
    np.testing.assert_array_equal(first, np.asarray(next(iter(dev))[0]))

    # drop_last=False keeps the 5-image remainder batch
    tail = DeviceCacheLoader(arr, 8, shuffle=False, drop_last=False)
    batches = list(tail)
    assert len(batches) == 5 and batches[-1][0].shape[0] == 5
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(b) for b, _ in batches]), arr)

    # dataset-protocol input materializes identically
    ds_backed = DeviceCacheLoader(ArrayDataset(arr), 8, shuffle=False)
    np.testing.assert_array_equal(
        np.asarray(next(iter(ds_backed))[0]), arr[:8])

    # quantize=True: u8 storage, on-device dequantize within 1/255 of fp32
    # — and EXACT for pixels that came from u8 in the first place
    q = DeviceCacheLoader(arr * 2 - 1, 8, shuffle=False, quantize=True)
    got = np.asarray(next(iter(q))[0])
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, arr[:8] * 2 - 1, atol=1.01 / 255)
    u8 = np.arange(24 * 4, dtype=np.uint8).reshape(2, 4, 4, 3)
    exact = u8.astype(np.float32) / 127.5 - 1.0
    q2 = DeviceCacheLoader(exact, 2, shuffle=False, quantize=True)
    # u8-sourced pixels round-trip the quantization (to device/host float
    # op-ordering ulps)
    np.testing.assert_allclose(np.asarray(next(iter(q2))[0]), exact,
                               atol=1e-6)


def test_chunked_upload_multi_chunk_equals_whole():
    """_chunked_upload slices GB-scale corpora into ~chunk_bytes pieces and
    reassembles on device; a chunk size forcing many slices must reproduce
    the array exactly (incl. a non-divisible tail)."""
    from ddpm_diffusion_model_tpu.data.loader import _chunked_upload

    rng = np.random.default_rng(9)
    arr = rng.random((13, 4, 4, 3)).astype(np.float32)
    per_item = int(np.prod(arr.shape[1:])) * arr.dtype.itemsize
    out = _chunked_upload(arr, None, chunk_bytes=3 * per_item)  # 5 chunks
    np.testing.assert_array_equal(np.asarray(out), arr)
    one = _chunked_upload(arr, None)  # single-put fast path
    np.testing.assert_array_equal(np.asarray(one), arr)


def test_device_cache_loader_sharded_gather():
    """With a mesh sharding, gathered batches come out batch-sharded over
    the data axis (ready for a pjit train step with no relayout)."""
    import jax
    from ddpm_diffusion_model_tpu.data import DeviceCacheLoader
    from ddpm_diffusion_model_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh()
    shd = batch_sharding(mesh)
    rng = np.random.default_rng(3)
    arr = rng.random((32, 4, 4, 3)).astype(np.float32) * 2 - 1
    dl = DeviceCacheLoader(arr, 16, shuffle=False, sharding=shd,
                           quantize=True)
    x, _ = next(iter(dl))
    assert x.sharding.is_equivalent_to(shd, x.ndim)
    np.testing.assert_allclose(np.asarray(x), arr[:16], atol=1.01 / 255)


def test_device_cache_train_epoch_equivalence():
    """A train epoch fed from the device cache matches one fed from the
    host loader bit-for-bit (same shuffle stream, same step math)."""
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.data import DeviceCacheLoader
    from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.training import TrainConfig
    from ddpm_diffusion_model_tpu.training.loop import train_one_epoch
    from ddpm_diffusion_model_tpu.training.state import init_train_state
    from ddpm_diffusion_model_tpu.training.step import make_train_step

    cfg = UNetConfig(in_channels=3, base_channels=8, channel_mults=(1, 2),
                     num_res_blocks=1, attn_resolutions=(4,),
                     time_embed_dim=16, num_heads=2, head_dim=4,
                     img_resolution=8)
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    sched = make_schedule(DiffusionConfig(T=50, img_size=8))
    tc = TrainConfig(base_lr=1e-3, warmup_steps=2)
    arr = np.random.default_rng(3).random((24, 8, 8, 3)).astype(np.float32)

    import jax

    params = model.init(jax.random.key(0), jnp.ones((1, 8, 8, 3)),
                        jnp.zeros((1,)))
    losses = {}
    for name, loader in (
        ("host", DataLoader(ArrayDataset(arr), 8, shuffle=True, seed=5,
                            num_workers=1)),
        ("dev", DeviceCacheLoader(arr, 8, shuffle=True, seed=5)),
    ):
        state, tx = init_train_state(params, tc)
        step = make_train_step(model, sched, tx, tc)
        state, avg_loss, nb, ni = train_one_epoch(step, state, loader)
        assert (nb, ni) == (3, 24)
        losses[name] = avg_loss
    assert losses["host"] == losses["dev"]


def test_create_subset_dataloader_from_array():
    arr = np.random.default_rng(0).random((40, 4, 4, 3)).astype(np.float32)
    dl = create_subset_dataloader(arr, batch_size=4, max_samples=12, seed=3,
                                  num_workers=2)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0][0].shape == (4, 4, 4, 3)


def test_device_prefetch():
    import jax

    arr = np.random.default_rng(1).random((16, 2, 2, 3)).astype(np.float32)
    dl = DataLoader(ArrayDataset(arr), 4, shuffle=False, num_workers=1)
    out = list(device_prefetch(iter(dl), size=2))
    assert len(out) == 4
    assert isinstance(out[0][0], jax.Array)


def test_celeba_official_partition_split(tmp_path):
    """Offline CelebA splits follow list_eval_partition.txt when present
    (the file torchvision's split= consumes, load_data_from_torch.py:13-31)
    and fall back to index counts when absent."""
    from PIL import Image

    from ddpm_diffusion_model_tpu.data.celeba import (
        _celeba_offline_loaders,
        _read_eval_partition,
    )
    from ddpm_diffusion_model_tpu.data.transforms import make_celeba_transform

    celeba_dir = tmp_path / "celeba"
    root = celeba_dir / "img_align_celeba"
    os.makedirs(root)
    rng = np.random.default_rng(0)
    names = [f"{i:06d}.jpg" for i in range(1, 11)]
    for nm in names:
        arr = (rng.random((218, 178, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / nm)
    # official format: "000001.jpg 0" — 6 train / 2 valid / 2 test
    parts = [0] * 6 + [1] * 2 + [2] * 2
    with open(celeba_dir / "list_eval_partition.txt", "w") as f:
        for nm, p in zip(names, parts):
            f.write(f"{nm} {p}\n")

    mapping = _read_eval_partition(str(celeba_dir))
    assert mapping["000001.jpg"] == 0 and mapping["000009.jpg"] == 2

    transform = make_celeba_transform(img_size=16, crop=178)
    tr, va, te = _celeba_offline_loaders(
        str(tmp_path), str(root), transform, 16, 2, 0, 0
    )
    assert len(tr.dataset) == 6 and len(va.dataset) == 2 and len(te.dataset) == 2
    x, _y = next(iter(tr))
    assert x.shape == (2, 16, 16, 3)

    # remove the partition file -> index-count fallback still works
    os.remove(celeba_dir / "list_eval_partition.txt")
    tr2, va2, te2 = _celeba_offline_loaders(
        str(tmp_path), str(root), transform, 16, 2, 0, 0
    )
    assert len(tr2.dataset) + len(va2.dataset) + len(te2.dataset) == 10


def test_zip_loader_hq_no_crop(tmp_path):
    """crop=None zip loading for pre-cropped square corpora (CelebA-HQ
    zips): the chain is a plain resize — no 178 face crop that would cut
    into 256px images."""
    from PIL import Image

    root = tmp_path / "hq"
    root.mkdir()
    rng = np.random.default_rng(0)
    # distinctive corner pixel: a 178-crop of a 256px image would lose it
    for i in range(4):
        arr = (rng.random((256, 256, 3)) * 255).astype(np.uint8)
        arr[:8, :8] = 255
        Image.fromarray(arr).save(root / f"{i}.png")
    zp = str(tmp_path / "hq.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        for fn in os.listdir(root):
            zf.write(os.path.join(root, fn), fn)
    loader = get_celeba_loader_from_zip(
        zp, extract_dir=str(tmp_path / "ex"), img_size=128, batch_size=4,
        num_workers=1, crop=None,
    )
    x, _ = next(iter(loader))
    assert x.shape == (4, 128, 128, 3)
    # the white corner survives (and maps to +1 after normalize)
    assert float(x[:, :3, :3].mean()) > 0.95


def test_device_cache_sharded_corpus():
    """shard_corpus=True: each device stores corpus/D rows, yet gathered
    batches (which cross shard boundaries under shuffle) equal the
    replicated loader's bit-for-bit."""
    import jax

    from ddpm_diffusion_model_tpu.data import DeviceCacheLoader
    from ddpm_diffusion_model_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh()
    shd = batch_sharding(mesh)
    D = mesh.shape["data"]
    rng = np.random.default_rng(4)
    # 36 % 8 != 0 -> exercises the wrap-pad
    arr = rng.random((36, 4, 4, 3)).astype(np.float32) * 2 - 1

    rep = DeviceCacheLoader(arr, 8, shuffle=True, seed=9, sharding=shd)
    sh = DeviceCacheLoader(arr, 8, shuffle=True, seed=9, sharding=shd,
                           shard_corpus=True)
    # each device holds only its slice (padded N / D rows)
    padded = 36 + (-36) % D
    shard_rows = {s.data.shape[0] for s in sh.corpus.addressable_shards}
    assert shard_rows == {padded // D}
    for (a, _), (b, _) in zip(rep, sh):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert b.sharding.is_equivalent_to(shd, b.ndim)

    # quantize composes
    q = DeviceCacheLoader(arr, 8, shuffle=False, sharding=shd,
                          quantize=True, shard_corpus=True)
    x, _ = next(iter(q))
    np.testing.assert_allclose(np.asarray(x), arr[:8], atol=1.01 / 255)

    with pytest.raises(ValueError, match="needs a batch"):
        DeviceCacheLoader(arr, 8, shard_corpus=True)


def test_device_cache_labeled():
    """labels= pins a label vector in HBM next to the corpus: batches come
    back as (x, y) device arrays with the SAME gather order, a labeled
    dataset's labels are harvested automatically, and the sharded corpus
    pads/shards its labels consistently."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from ddpm_diffusion_model_tpu.data import (
        BlobFacesDataset, DataLoader, DeviceCacheLoader)
    from ddpm_diffusion_model_tpu.parallel import batch_sharding, make_mesh

    rng = np.random.default_rng(0)
    arr = rng.normal(size=(24, 8, 8, 3)).astype(np.float32) * 0.4
    labels = (np.arange(24) % 5).astype(np.int64)

    dev = DeviceCacheLoader(arr, 8, shuffle=True, seed=3, labels=labels)
    host = DataLoader(ArrayDataset(arr, labels), 8, shuffle=True, seed=3)
    for (xd, yd), (xh, yh) in zip(dev, host):
        assert isinstance(xd, jax.Array) and isinstance(yd, jax.Array)
        np.testing.assert_array_equal(np.asarray(yd), yh)
        np.testing.assert_allclose(np.asarray(xd), xh, atol=1e-6)

    # labeled dataset (num_classes) harvests labels automatically
    ds = BlobFacesDataset(8, img_size=8, seed=0, num_classes=4)
    auto = DeviceCacheLoader(ds, 4, shuffle=False)
    _, y0 = next(iter(auto))
    np.testing.assert_array_equal(np.asarray(y0), [0, 1, 2, 3])

    # sharded corpus: wrap-padded labels, batches equal the replicated path
    mesh = make_mesh()
    shd = batch_sharding(mesh)
    sharded = DeviceCacheLoader(arr[:20], 8, shuffle=False, sharding=shd,
                                shard_corpus=True,
                                labels=labels[:20])
    plain = DeviceCacheLoader(arr[:20], 8, shuffle=False,
                              labels=labels[:20])
    for (xs, ys), (xp, yp) in zip(sharded, plain):
        np.testing.assert_array_equal(np.asarray(ys), np.asarray(yp))
        np.testing.assert_allclose(np.asarray(xs), np.asarray(xp), atol=1e-6)

    with pytest.raises(ValueError, match="labels"):
        DeviceCacheLoader(arr, 8, labels=labels[:5])


def test_device_cache_labeled_trains_conditional():
    """End to end: a conditional model trains from the labeled HBM cache
    (the slow-host path for CFG training) — zero host batches per step."""
    import jax.numpy as jnp

    from ddpm_diffusion_model_tpu.data import BlobFacesDataset, DeviceCacheLoader
    from ddpm_diffusion_model_tpu.models import UNetConfig, UNetDenoiser
    from ddpm_diffusion_model_tpu.ops import DiffusionConfig, make_schedule
    from ddpm_diffusion_model_tpu.training import (
        TrainConfig, init_train_state, make_optimizer, make_train_step,
        train_one_epoch)
    import jax

    cfg = UNetConfig(base_channels=8, channel_mults=(1, 2), num_res_blocks=1,
                     attn_resolutions=(), time_embed_dim=16, num_heads=1,
                     head_dim=8, img_resolution=8, num_classes=4)
    model = UNetDenoiser(cfg, dtype=jnp.float32)
    sched = make_schedule(DiffusionConfig(T=20, img_size=8))
    params = model.init(jax.random.key(0), jnp.ones((1, 8, 8, 3)),
                        jnp.zeros((1,)))
    tcfg = TrainConfig(base_lr=1e-3, warmup_steps=2)
    tx = make_optimizer(tcfg)
    state, _ = init_train_state(params, tcfg, tx=tx)
    step = make_train_step(model, sched, tx, tcfg)
    loader = DeviceCacheLoader(BlobFacesDataset(16, img_size=8, seed=0,
                                                num_classes=4),
                               8, seed=0, quantize=True)
    state, avg_loss, n_batches, _ = train_one_epoch(
        step, state, loader, labeled=True)
    assert n_batches == 2 and np.isfinite(avg_loss)


def test_zip_loader_accepts_directory_root(img_root, tmp_path):
    """A DIRECTORY --zip-path is used as the corpus root directly — it must
    NOT be shadowed by a stale sentinel in the default extract_dir (the r4
    natface regression: the run silently trained on the wrong corpus)."""
    # a decoy extract_dir that already carries a sentinel + an image
    decoy = tmp_path / "decoy"
    (decoy / "celeba").mkdir(parents=True)
    from PIL import Image as _Image

    _Image.new("RGB", (40, 40), (255, 0, 0)).save(
        str(decoy / "celeba" / "decoy.jpg"))
    (decoy / ".extraction_complete").write_text("x")

    loader = get_celeba_loader_from_zip(
        str(img_root), extract_dir=str(decoy), img_size=32, batch_size=4,
        num_workers=2, crop=None,
    )
    assert len(loader.dataset) == len(
        [f for _r, _d, fs in os.walk(img_root) for f in fs
         if f.endswith((".jpg", ".png"))])  # incl. the corrupt-png entry
    x, _y = next(iter(loader))
    assert x.shape == (4, 32, 32, 3)
