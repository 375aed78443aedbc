import numpy as np
import pytest
from PIL import Image

from spe_tpu.data import native_io
from spe_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


@pytest.fixture
def jpegs(tmp_path, rng):
    paths = []
    arrays = []
    for i, (h, w) in enumerate([(40, 60), (64, 64), (100, 30)]):
        a = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(a).save(p, quality=95)
        paths.append(p)
        arrays.append(np.asarray(Image.open(p).convert("RGB")))  # post-jpeg
    return paths, arrays


def test_native_decode_matches_pil_pipeline(jpegs):
    if not native_io.available():
        pytest.skip("native dataio not built")
    paths, arrays = jpegs
    out = native_io.decode_batch(paths, size=32)
    assert out is not None and out.shape == (3, 32, 32, 3)
    for i, a in enumerate(arrays):
        pil = Image.fromarray(a).resize((32, 32), Image.BILINEAR)
        ref = (np.asarray(pil, np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        # PIL's bilinear uses the same half-pixel convention; allow small
        # interpolation differences at edges
        err = np.abs(out[i] - ref)
        assert np.median(err) < 0.05, (i, np.median(err))
        assert np.mean(err < 0.3) > 0.98, (i, np.mean(err < 0.3))


def test_native_decode_flip(jpegs):
    if not native_io.available():
        pytest.skip("native dataio not built")
    paths, _ = jpegs
    a = native_io.decode_batch(paths[:1], size=16)
    b = native_io.decode_batch(paths[:1], size=16, flips=[True])
    np.testing.assert_allclose(b[0], a[0][:, ::-1], atol=1e-6)


def test_native_decode_bad_data(tmp_path):
    if not native_io.available():
        pytest.skip("native dataio not built")
    p = tmp_path / "junk.jpg"
    p.write_bytes(b"not a jpeg at all")
    out = native_io.decode_batch([p], size=16)
    assert out is None  # signals failure -> caller falls back to PIL


def test_loader_native_path_matches_pil(tmp_path, rng):
    """DataLoader(use_native=True) eval batches match the PIL path."""
    if not native_io.available():
        pytest.skip("native dataio not built")
    import json

    from spe_tpu.data.coco import CocoFormatDataset
    from spe_tpu.data.loader import DataLoader
    from spe_tpu.data.transforms import FixedSizeTransform

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)).save(
            img_dir / f"{i:012d}.jpg", quality=95)
    gt = {
        "images": [{"id": i, "file_name": f"{i:012d}.jpg", "width": 60, "height": 40}
                   for i in range(4)],
        "annotations": [
            {"id": i + 1, "image_id": i, "category_id": 1, "bbox": [5, 5, 20, 10],
             "area": 200, "iscrowd": 0} for i in range(4)],
        "categories": [{"id": 1, "name": "a"}],
    }
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(gt))
    ds = CocoFormatDataset(img_dir, ann, num_classes=1,
                           transform=FixedSizeTransform(32, train=False))
    kw = dict(batch_size=2, num_classes=1, fixed_size=32, shuffle=False,
              drop_last=False, train=False)
    dl_pil = DataLoader(ds, **kw)
    dl_nat = DataLoader(ds, use_native=True, **kw)
    assert dl_nat.use_native
    b0 = next(iter(dl_pil.epoch(0)))
    b1 = next(iter(dl_nat.epoch(0)))
    assert b1["images"].shape == b0["images"].shape
    err = np.abs(b1["images"] - b0["images"])
    assert np.median(err) < 0.02, np.median(err)
    np.testing.assert_array_equal(b1["image_id"], b0["image_id"])
    np.testing.assert_array_equal(b1["img_label"], b0["img_label"])
