"""Native decode core vs PIL on all three benchmark formats + fused normalize-crop."""

import numpy as np
import pytest
from PIL import Image

from multishiftseg_tpu.data import native_io


@pytest.fixture(scope="module")
def lib():
    lib = native_io.get_lib()
    if lib is None:
        pytest.skip("native dataio unavailable")
    return lib


def _rand_img(rng, h=37, w=53):
    return (rng.rand(h, w, 3) * 255).astype(np.uint8)


def test_png_roundtrip(lib, rng, tmp_path):
    img = _rand_img(rng)
    p = tmp_path / "x.png"
    Image.fromarray(img).save(p)
    out = native_io.decode(str(p))
    np.testing.assert_array_equal(out, img)


def test_png_label_single_channel(lib, rng, tmp_path):
    lab = (rng.rand(20, 30) * 255).astype(np.uint8)
    p = tmp_path / "label.png"
    Image.fromarray(lab, "L").save(p)
    out = native_io.decode(str(p))
    assert out.ndim == 2
    np.testing.assert_array_equal(out, lab)


def test_jpeg_close_to_pil(lib, rng, tmp_path):
    img = _rand_img(rng, 64, 64)
    p = tmp_path / "x.jpg"
    Image.fromarray(img).save(p, quality=95)
    ours = native_io.decode(str(p))
    ref = np.asarray(Image.open(p))
    assert ours.shape == ref.shape
    # independent IDCT implementations may differ by a few levels
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 2.0


def test_webp_roundtrip(lib, rng, tmp_path):
    img = _rand_img(rng)
    p = tmp_path / "x.webp"
    Image.fromarray(img).save(p, lossless=True)
    out = native_io.decode(str(p))
    np.testing.assert_array_equal(out, img)


def test_decode_batch(lib, rng, tmp_path):
    paths = []
    imgs = []
    for i, ext in enumerate(["png", "webp", "png"]):
        img = _rand_img(rng, 16 + i, 20 + i)
        p = tmp_path / f"b{i}.{ext}"
        Image.fromarray(img).save(p, **({"lossless": True} if ext == "webp" else {}))
        paths.append(str(p))
        imgs.append(img)
    outs = native_io.decode_batch(paths)
    for out, img in zip(outs, imgs):
        np.testing.assert_array_equal(out, img)


def test_normalize_crop_matches_numpy(lib, rng):
    img = _rand_img(rng, 40, 50)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    out = native_io.normalize_crop(img, 5, 7, 20, 30, mean, std)
    ref = (img[5:25, 7:37].astype(np.float32) / 255.0 - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_palette_png_returns_indices_like_pil(lib, rng, tmp_path):
    """Paletted pngs are a common label encoding (index == class id): the
    native decoder must return INDICES like np.asarray(PIL mode 'P'), not the
    palette-expanded RGB (which would put luminance garbage through _gray)."""
    idx = (np.arange(48, dtype=np.uint8).reshape(6, 8)) % 7
    im = Image.fromarray(idx, mode="P")
    im.putpalette([int(v) for v in rng.randint(0, 255, 768)])
    p = tmp_path / "pal.png"
    im.save(p)
    out = native_io.decode(str(p))
    np.testing.assert_array_equal(out, np.asarray(Image.open(p)))


def test_decode_batch_corrupt_file_falls_back(lib, rng, tmp_path):
    """A corrupt member fails the native batch; the loader falls back to PIL
    per file (the C side frees the successful buffers before returning)."""
    img = _rand_img(rng, 12, 12)
    good = tmp_path / "good.png"
    Image.fromarray(img).save(good)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0garbage")
    import pytest as _pytest

    with _pytest.raises(OSError):  # PIL also rejects the garbage -> loud error
        native_io.decode_batch([str(good), str(bad)])
    # an all-good batch after the failure still works (no corrupted state)
    outs = native_io.decode_batch([str(good), str(good)])
    np.testing.assert_array_equal(outs[0], img)
