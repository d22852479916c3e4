"""Native C++ image pipeline tests: availability (toolchain present in CI),
PIL parity on JPEG/PNG, corrupt-input handling, threaded decode, and
ImageFolderDataset integration."""

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from ddpm_diffusion_model_tpu.native import (
    decode_image_bytes,
    decode_image_file,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no native toolchain / image libs"
)


@pytest.fixture(scope="module")
def jpg_png(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("nimg")
    rng = np.random.default_rng(7)
    arr = (rng.random((218, 178, 3)) * 255).astype(np.uint8)
    jp = str(root / "a.jpg")
    pp = str(root / "a.png")
    Image.fromarray(arr).save(jp, quality=95)
    Image.fromarray(arr).save(pp)
    return jp, pp


def test_png_matches_pil_resample(jpg_png):
    from PIL import Image

    from ddpm_diffusion_model_tpu.data.transforms import make_celeba_transform

    _jp, pp = jpg_png
    out = decode_image_file(pp, out_size=64, crop=178)
    ref = make_celeba_transform(64, crop=178)(Image.open(pp))
    assert out.shape == (64, 64, 3)
    assert np.abs(out - ref).max() <= 2.5 / 255  # lossless source: ~1 LSB


def test_jpeg_decodes_and_is_close(jpg_png):
    from PIL import Image

    from ddpm_diffusion_model_tpu.data.transforms import make_celeba_transform

    jp, _pp = jpg_png
    out = decode_image_file(jp, out_size=64, crop=178)
    ref = make_celeba_transform(64, crop=178)(Image.open(jp))
    # libjpeg vs PIL IDCT may differ by a few LSB
    assert np.abs(out - ref).mean() < 0.02
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_initial_resize_path(jpg_png):
    _jp, pp = jpg_png
    out = decode_image_file(pp, out_size=32, crop=178, init_resize=178)
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all()


def test_bytes_api(jpg_png):
    jp, _ = jpg_png
    with open(jp, "rb") as f:
        data = f.read()
    out = decode_image_bytes(data, out_size=64, crop=178)
    ref = decode_image_file(jp, out_size=64, crop=178)
    np.testing.assert_array_equal(out, ref)


def test_corrupt_input_returns_none(tmp_path):
    p = str(tmp_path / "bad.jpg")
    with open(p, "wb") as f:
        f.write(b"garbage bytes not an image")
    assert decode_image_file(p, out_size=64, crop=178) is None
    assert decode_image_file(str(tmp_path / "missing.jpg"), 64) is None


def test_threaded_decode_consistent(jpg_png):
    jp, _ = jpg_png
    ref = decode_image_file(jp, out_size=64, crop=178)
    with ThreadPoolExecutor(8) as ex:
        outs = list(ex.map(lambda _: decode_image_file(jp, 64, crop=178), range(32)))
    for o in outs:
        np.testing.assert_array_equal(o, ref)


def test_folder_dataset_uses_native(jpg_png, tmp_path):
    from ddpm_diffusion_model_tpu.data import ImageFolderDataset
    from ddpm_diffusion_model_tpu.data.transforms import make_celeba_transform

    jp, _pp = jpg_png
    ds = ImageFolderDataset(
        os.path.dirname(jp), make_celeba_transform(64, crop=178),
        img_size=64, crop=178,
    )
    assert ds._native
    x, y = ds[0]
    assert x.shape == (64, 64, 3) and np.isfinite(x).all()
