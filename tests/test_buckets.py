"""Shape-bucketed padding for the multi-scale recipe (SURVEY §5.7): across
a multi-scale epoch the set of distinct compiled (H, W) batch shapes must
stay bounded (each distinct shape is a fresh XLA compilation)."""

import numpy as np

from spe_tpu.data.loader import DataLoader, collate
from spe_tpu.data.synthetic import SyntheticDetection
from spe_tpu.data.transforms import MultiScaleTransform


def test_collate_bucket_rounding():
    img = np.zeros((130, 470, 3), np.float32)
    t = {"image_id": 0, "img_label": np.zeros(3, np.float32),
         "orig_size": np.array([130, 470]), "size": np.array([130, 470])}
    b = collate([(img, t)], num_classes=3, bucket_quantum=128)
    assert b["images"].shape[1:3] == (256, 512)
    assert bool(b["pad_mask"][0, 130, 0]) and not bool(b["pad_mask"][0, 129, 0])


def test_multiscale_epoch_shape_count_bounded():
    tf = MultiScaleTransform(max_size=512, train=True)
    ds = SyntheticDetection(num_images=96, num_classes=3, img_size=400,
                            seed=0, transform=tf)
    q = 128
    loader = DataLoader(ds, batch_size=4, num_classes=3, seed=0,
                        bucket_quantum=q)
    shapes = set()
    for epoch in range(2):
        for batch in loader.epoch(epoch):
            h, w = batch["images"].shape[1:3]
            assert h % q == 0 and w % q == 0
            shapes.add((h, w))
    # max_size 512 -> at most (512/128)^2 = 16 buckets; the scale ladder
    # makes it far fewer in practice
    assert len(shapes) <= (512 // q) ** 2, shapes
    assert len(shapes) >= 1


def test_unbucketed_multiscale_produces_many_shapes():
    """Control: without buckets the same epoch yields more distinct shapes
    than with them (the recompile hazard the buckets exist to remove)."""
    tf = MultiScaleTransform(max_size=512, train=True)
    ds = SyntheticDetection(num_images=96, num_classes=3, img_size=400,
                            seed=0, transform=tf)

    def count(quantum):
        loader = DataLoader(ds, batch_size=4, num_classes=3, seed=0,
                            bucket_quantum=quantum)
        return len({tuple(b["images"].shape[1:3]) for b in loader.epoch(0)})

    assert count(128) < count(0)
