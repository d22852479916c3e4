"""Image grid utility tests."""

import numpy as np

from ddpm_diffusion_model_tpu.utils import (
    load_image,
    make_grid,
    save_image,
    save_image_grid,
)


def test_load_image_roundtrip_and_resize(tmp_path):
    img = np.linspace(0, 1, 8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    p = str(tmp_path / "x.png")
    save_image(img, p)
    back = load_image(p)
    assert back.shape == (8, 8, 3) and back.dtype == np.float32
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)
    # center-crop-to-square + resize, and grayscale mask loading
    wide = np.zeros((8, 16, 3), dtype=np.float32)
    wide[:, 4:12] = 1.0  # the center square is all-white
    pw = str(tmp_path / "w.png")
    save_image(wide, pw)
    sq = load_image(pw, size=4)
    assert sq.shape == (4, 4, 3)
    np.testing.assert_allclose(sq, 1.0, atol=1 / 255)
    m = load_image(pw, size=4, grayscale=True)
    assert m.shape == (4, 4, 1)


def test_make_grid_square():
    imgs = np.random.rand(4, 8, 8, 3).astype(np.float32)
    grid = make_grid(imgs, padding=2)
    # 2x2 grid: 2*8 + 3*2 = 22 per side
    assert grid.shape == (22, 22, 3)


def test_make_grid_nonsquare_count():
    imgs = np.random.rand(5, 4, 4, 3).astype(np.float32)
    grid = make_grid(imgs)  # nrow = ceil(sqrt(5)) = 3 -> 2 rows x 3 cols
    assert grid.shape == (2 * 4 + 3 * 2, 3 * 4 + 4 * 2, 3)


def test_make_grid_places_pixels():
    imgs = np.zeros((1, 2, 2, 3), dtype=np.float32)
    imgs[0, 0, 0] = [1, 0.5, 0.25]
    grid = make_grid(imgs, padding=1)
    np.testing.assert_allclose(grid[1, 1], [1, 0.5, 0.25])


def test_save_image_roundtrip(tmp_path):
    from PIL import Image

    img = np.linspace(0, 1, 8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    p = str(tmp_path / "x.png")
    save_image(img, p)
    back = np.asarray(Image.open(p)).astype(np.float32) / 255.0
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)


def test_save_image_grid(tmp_path):
    imgs = np.random.rand(4, 8, 8, 3).astype(np.float32)
    p = str(tmp_path / "sub" / "g.png")
    grid = save_image_grid(imgs, p)
    import os

    assert os.path.exists(p)
    assert grid.shape == (22, 22, 3)
