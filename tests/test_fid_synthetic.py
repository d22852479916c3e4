"""rFID (random-CNN Fréchet distance) + the procedural blob-faces dataset:
the offline sample-quality metric and the structured-data learning testbed
(VERDICT round-1 items 3-4)."""

import numpy as np
import pytest

from ddpm_diffusion_model_tpu.data import BlobFacesDataset, blob_faces_array
from ddpm_diffusion_model_tpu.utils.fid import (
    extract_features,
    frechet_distance,
    rfid,
)

S = 32


@pytest.fixture(scope="module")
def faces():
    return blob_faces_array(96, img_size=S, seed=0)


def test_blob_faces_deterministic_and_ranged(faces):
    ds = BlobFacesDataset(10, img_size=S, seed=0)
    a, _ = ds[3]
    b, _ = ds[3]
    np.testing.assert_array_equal(a, b)
    c, _ = BlobFacesDataset(10, img_size=S, seed=1)[3]
    assert not np.allclose(a, c)
    assert a.shape == (S, S, 3) and a.dtype == np.float32
    assert faces.min() >= -1.0 and faces.max() <= 1.0
    # structured, not iid noise: strong spatial correlation
    gx = np.abs(np.diff(faces, axis=1)).mean()
    assert gx < 0.25  # iid U(-1,1) noise would be ~0.66


def test_feature_extractor_deterministic(faces):
    x01 = (faces[:8] + 1) / 2
    f1 = extract_features(x01)
    f2 = extract_features(x01)
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape[0] == 8 and f1.shape[1] == 2 * (32 + 64 + 128 + 128)


def test_frechet_distance_properties():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=8)
    a = rng.normal(size=(8, 8))
    cov = a @ a.T
    assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-4)
    d = frechet_distance(mu, cov, mu + 1.0, cov)
    assert d == pytest.approx(8.0, rel=1e-3)  # ||1||^2 over 8 dims


def test_rfid_zero_for_identical_and_ranks_quality(faces):
    x01 = (faces + 1) / 2
    real, fake_pool = x01[:48], x01[48:]
    assert rfid(real, real) == pytest.approx(0.0, abs=1e-3)

    # same distribution, disjoint samples: small
    d_same = rfid(real, fake_pool)
    # noise: far
    noise = np.random.default_rng(1).random((48, S, S, 3)).astype(np.float32)
    d_noise = rfid(real, noise)
    # corrupted faces (heavy noise added): in between
    corrupted = np.clip(
        fake_pool + np.random.default_rng(2).normal(0, 0.35, fake_pool.shape), 0, 1
    ).astype(np.float32)
    d_corr = rfid(real, corrupted)
    assert d_same < d_corr < d_noise, (d_same, d_corr, d_noise)


def test_fid_with_torchscript_extractor(tmp_path):
    """The offline TRUE-FID hook (utils/fid.py): a mounted TorchScript
    extractor drives the same Fréchet machinery.  Exercised with a tiny
    scripted conv net standing in for the (unmountable-here) Inception."""
    torch = pytest.importorskip("torch")
    from ddpm_diffusion_model_tpu.utils.fid import fid, load_torch_extractor

    class TinyExtractor(torch.nn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(0)
            self.conv = torch.nn.Conv2d(3, 16, 3, stride=2)

        def forward(self, x):  # (N,3,H,W) in [0,1] -> (N,32)
            h = torch.nn.functional.leaky_relu(self.conv(x * 2 - 1), 0.2)
            return torch.cat([h.mean(dim=(2, 3)), h.std(dim=(2, 3))], dim=1)

    path = str(tmp_path / "extractor.pt")
    torch.jit.save(torch.jit.script(TinyExtractor()), path)

    rng = np.random.default_rng(0)
    a = rng.random((96, 16, 16, 3)).astype(np.float32)
    b = rng.random((96, 16, 16, 3)).astype(np.float32) * 0.5  # darker dist
    ex = load_torch_extractor(path)
    feats = ex(a[:4])
    assert feats.shape == (4, 32) and feats.dtype == np.float64

    same = fid(a, a.copy(), extractor_path=path)
    diff = fid(a, b, extractor_path=path)
    assert same < 1e-6
    assert diff > same and diff > 0.01
    # no extractor -> documented rfid fallback
    assert fid(a, a.copy()) < 1e-6


def test_mismatched_extractor_weights_rejected(tmp_path):
    """A weights file that is neither TorchScript nor a matching
    inception_v3 state_dict must raise, not silently score FID with a
    random-weight network."""
    torch = pytest.importorskip("torch")
    from ddpm_diffusion_model_tpu.utils.fid import load_torch_extractor

    bad = str(tmp_path / "bad.pth")
    torch.save({"some.layer.weight": torch.zeros(3, 3)}, bad)
    with pytest.raises(ValueError, match="does not match"):
        load_torch_extractor(bad)

    notdict = str(tmp_path / "notdict.pth")
    torch.save(torch.zeros(4), notdict)
    with pytest.raises(ValueError, match="neither"):
        load_torch_extractor(notdict)
