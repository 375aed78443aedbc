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


def test_size_grouped_batching():
    """Train-mode multi-scale batches are assembled from SAME-bucKET samples
    (VERDICT r4 #3): each emitted batch's padded shape equals the bucket of
    its own samples, step count matches steps_per_epoch, every sample is
    seen at most once, and per-sample padding waste is below the random-mix
    baseline."""
    tf = MultiScaleTransform(max_size=512, train=True)
    ds = SyntheticDetection(num_images=96, num_classes=3, img_size=400,
                            seed=0, transform=tf)
    loader = DataLoader(ds, batch_size=4, num_classes=3, seed=0,
                        bucket_quantum=128)

    n_steps = 0
    seen = []
    pure_bucket_batches = 0
    for batch in loader.epoch(0):
        h, w = batch["images"].shape[1:3]
        assert batch["images"].shape[0] == 4
        # padded area within one quantum of every sample's own bucket?
        sizes = batch["size"]
        buckets = {(-(-int(s[0]) // 128) * 128, -(-int(s[1]) // 128) * 128)
                   for s in sizes}
        if len(buckets) == 1:
            assert (h, w) == next(iter(buckets))
            pure_bucket_batches += 1
        seen.extend(batch["image_id"].tolist())
        n_steps += 1
    assert n_steps == loader.steps_per_epoch()
    assert len(seen) == len(set(seen))
    # nearly all batches are pure same-bucket groups (the leftover flush at
    # epoch end may mix)
    assert pure_bucket_batches >= n_steps - 4, (pure_bucket_batches, n_steps)


def test_grouping_off_for_eval():
    """Eval loaders (drop_last=False) keep the streaming order ungrouped so
    every sample is emitted exactly once including the final partial batch."""
    tf = MultiScaleTransform(max_size=512, train=False)
    ds = SyntheticDetection(num_images=10, num_classes=3, img_size=400,
                            seed=0, transform=tf)
    loader = DataLoader(ds, batch_size=4, num_classes=3, seed=0, shuffle=False,
                        drop_last=False, train=False, bucket_quantum=128)
    ids = [i for b in loader.epoch(0) for i in b["image_id"].tolist()]
    assert sorted(ids) == list(range(10))
