"""Native image-kernel tests: builds the C++ library, checks numeric parity
with numpy/PIL references and that the fused path matches the composed one."""

import numpy as np
import pytest
from PIL import Image

from apla_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def img(h=48, w=64):
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_resize_matches_pil_bilinear_upsample():
    """Upsampling: PIL applies no antialias, algorithms coincide.  (On
    downscale PIL area-averages; ours is classic 2x2-tap bilinear, matching
    torch `interpolate(antialias=False)` — intentionally different.)"""
    a = img(24, 32)
    ours = native.resize_bilinear(a, 48, 64)
    ref = np.asarray(Image.fromarray(a).resize((64, 48), Image.BILINEAR))
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_resize_downsample_smooth():
    grad = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None],
                   (48, 1, 3))
    ours = native.resize_bilinear(np.ascontiguousarray(grad), 24, 32)
    ref = np.asarray(Image.fromarray(grad).resize((32, 24), Image.BILINEAR))
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 3


def test_normalize_matches_numpy():
    a = img()
    mean, std = (0.5, 0.4, 0.3), (0.2, 0.25, 0.3)
    ours = native.normalize(a, mean, std)
    ref = (a.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fused_crop_resize_normalize():
    a = img()
    mean, std = (0.5, 0.5, 0.5), (0.25, 0.25, 0.25)
    box = (8, 10, 32, 40)
    fused = native.crop_resize_normalize(a, box, 16, 16, mean, std)
    crop = a[8:40, 10:50]
    resized = native.resize_bilinear(np.ascontiguousarray(crop), 16, 16)
    composed = native.normalize(resized, mean, std)
    # fused avoids the uint8 quantisation between resize and normalize
    assert np.abs(fused - composed).max() < 0.05
    assert fused.dtype == np.float32


def test_hflip():
    a = img()
    np.testing.assert_array_equal(native.hflip(a), a[:, ::-1])


def test_native_jpeg_decode_matches_pil():
    import io
    from PIL import Image
    from apla_tpu.native import decode_jpeg, jpeg_available
    if not jpeg_available():
        import pytest
        pytest.skip("no libjpeg / compiler")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, "JPEG", quality=95)
    data = b.getvalue()
    full = decode_jpeg(data)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert full.shape == pil.shape
    # same libjpeg underneath -> identical full-size decode
    assert int(np.abs(full.astype(int) - pil.astype(int)).max()) <= 1
    small = decode_jpeg(data, out_size=96)
    assert small.shape == (96, 96, 3) and small.dtype == np.uint8


def test_raw_mode_uses_native_jpeg(tmp_path):
    from PIL import Image
    from apla_tpu.data.datasets import Pneumonia
    from apla_tpu.native import jpeg_available
    if not jpeg_available():
        import pytest
        pytest.skip("no libjpeg / compiler")
    root = tmp_path / "Pneumonia"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = ["filename,label"]
    for i in range(3):
        arr = rng.integers(0, 255, (200, 260, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "images" / f"x{i}.jpg", "JPEG")
        rows.append(f"x{i}.jpg,{i % 2}")
    for split in ("train", "val", "test"):
        (root / f"{split}.csv").write_text("\n".join(rows) + "\n")
    t = {"Resize": {"apply": True, "height": 64, "width": 64},
         "Normalize": True}
    ds = Pneumonia({"data_location": str(tmp_path),
                    "train_transforms": t, "val_transforms": t,
                    "test_transforms": t}, mode="train")
    ds.raw_mode = True
    ds.raw_size = 128
    s = ds[0]
    assert s["image"].shape == (128, 128, 3)
    assert s["image"].dtype == np.uint8
    # fast path actually engaged
    assert ds._load_raw_fast(ds.data[0]) is not None
