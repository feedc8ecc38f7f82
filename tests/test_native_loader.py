"""Native C++ decoder (runtime/cfen_loader.cpp) vs the PIL path."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def imgdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    arrs = []
    for i in range(4):
        a = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(a).save(d / f"im_{i}.png")
        arrs.append(a)
    Image.fromarray(arrs[0]).save(d / "im_jpg.jpg", quality=95)
    return d, arrs


def test_native_decode_matches_pil(imgdir):
    from cfen_vit_tpu.data import native
    if not native.available():
        pytest.skip("native loader unavailable (no toolchain)")
    d, arrs = imgdir
    paths = [str(d / f"im_{i}.png") for i in range(4)]
    out = native.decode_batch(paths, 48, 64)
    assert out is not None and out.shape == (4, 48, 64, 3)
    for i, a in enumerate(arrs):
        ref = a.astype(np.float32) / 255.0 * 2 - 1
        np.testing.assert_allclose(out[i], ref, atol=1e-6)


def test_native_decode_jpeg(imgdir):
    from cfen_vit_tpu.data import native
    if not native.available():
        pytest.skip("native loader unavailable")
    d, arrs = imgdir
    out = native.decode_batch([str(d / "im_jpg.jpg")], 48, 64)
    assert out is not None
    ref = np.asarray(Image.open(d / "im_jpg.jpg")).astype(np.float32) \
        / 255.0 * 2 - 1
    # libjpeg and PIL (also libjpeg) agree exactly
    np.testing.assert_allclose(out[0], ref, atol=1e-5)


def test_native_size_mismatch_falls_back(imgdir):
    from cfen_vit_tpu.data import native
    if not native.available():
        pytest.skip("native loader unavailable")
    d, _ = imgdir
    assert native.decode_batch([str(d / "im_0.png")], 99, 99) is None


def test_loader_uses_native_path(imgdir, tmp_path):
    """End to end: DecVitDataset eval batch decodes natively and matches
    the PIL path bit-for-bit."""
    from cfen_vit_tpu.config import Config
    from cfen_vit_tpu.data import create_dataloader, native
    d, arrs = imgdir
    root = tmp_path / "data"
    (root / "hazy").mkdir(parents=True)
    for i in range(4):
        Image.fromarray(arrs[i]).save(root / "hazy" / f"h_{i}.png")
    cfg = Config(dataroot=str(root), isTrain=False, sb=True, batchSize=2,
                 nThreads=0, name="t", checkpoints_dir=str(tmp_path / "c"))
    batches = list(create_dataloader(cfg))
    assert len(batches) == 2
    ref = arrs[0].astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(batches[0]["B"][0], ref, atol=1e-6)


def test_mixed_size_batch_clear_error(tmp_path):
    from cfen_vit_tpu.config import Config
    from cfen_vit_tpu.data import create_dataloader
    import numpy as np
    from PIL import Image
    root = tmp_path / "mix"
    (root / "hazy").mkdir(parents=True)
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(root / "hazy" / "a.png")
    Image.fromarray(np.zeros((48, 48, 3), np.uint8)).save(root / "hazy" / "b.png")
    cfg = Config(dataroot=str(root), isTrain=False, sb=True, batchSize=2,
                 name="m", checkpoints_dir=str(tmp_path / "c"))
    with pytest.raises(ValueError, match="mixes image sizes"):
        list(create_dataloader(cfg))


def test_mem_codec_roundtrip(rng):
    """In-memory decode/encode (serving path) — exact byte roundtrip."""
    import io
    from PIL import Image
    from cfen_vit_tpu.data import native
    if not native.available():
        import pytest
        pytest.skip("native runtime unavailable")
    img = (rng.rand(64, 48, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    dec = native.decode_rgb_bytes(buf.getvalue())
    np.testing.assert_array_equal(dec, img)
    enc = native.encode_png_bytes(img)
    back = np.asarray(Image.open(io.BytesIO(enc)))
    np.testing.assert_array_equal(back, img)
    # jpeg decodes too (lossy, just shape/type)
    jb = io.BytesIO()
    Image.fromarray(img).save(jb, "JPEG", quality=95)
    dj = native.decode_rgb_bytes(jb.getvalue())
    assert dj.shape == img.shape and dj.dtype == np.uint8
    # garbage -> None (PIL fallback path)
    assert native.decode_rgb_bytes(b"not an image") is None
