"""Batched data loader producing fixed-shape device-ready arrays.

Replaces the reference's torch DataLoader + NestedTensor collate
(util/misc.py:276-336): images padded to the max shape in the batch with a
True-on-padding mask (the published fixed-size recipe makes all images the
same SxS so the mask is empty), plus the weak labels and eval metadata.

Background prefetching uses a thread pool (decode/augment on host while the
device computes); a native C++ decode path can slot in behind the same
iterator later.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def collate(samples: Sequence, num_classes: int, fixed_size: Optional[int] = None,
            size_divisor: int = 16) -> Dict[str, np.ndarray]:
    """samples: list of (image (H,W,3) float32, target dict)."""
    imgs = [s[0] for s in samples]
    targets = [s[1] for s in samples]
    if fixed_size is not None:
        H = W = fixed_size
    else:
        H = max(i.shape[0] for i in imgs)
        W = max(i.shape[1] for i in imgs)
        H = -(-H // size_divisor) * size_divisor
        W = -(-W // size_divisor) * size_divisor
    B = len(imgs)
    images = np.zeros((B, H, W, 3), np.float32)
    pad_mask = np.ones((B, H, W), bool)
    for b, im in enumerate(imgs):
        h, w = im.shape[:2]
        images[b, :h, :w] = im
        pad_mask[b, :h, :w] = False

    batch = {
        "images": images,
        "pad_mask": pad_mask,
        "img_label": np.stack([t["img_label"] for t in targets]).astype(np.float32),
        "image_id": np.array([t["image_id"] for t in targets], np.int64),
        "orig_size": np.stack([t["orig_size"] for t in targets]).astype(np.int64),
        "size": np.stack([t.get("size", t["orig_size"]) for t in targets]).astype(np.int64),
    }
    return batch


class DataLoader:
    """Epoch-based loader with shuffling, per-process sharding (the
    DistributedSampler replacement, main.py:196-197) and thread prefetch."""

    def __init__(self, dataset, batch_size: int, num_classes: int,
                 fixed_size: Optional[int] = None, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 2, num_threads: int = 2,
                 use_native: bool = False, train: bool = True):
        self.ds = dataset
        self.batch_size = batch_size
        self.num_classes = num_classes
        self.fixed_size = fixed_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.train = train
        # native fast path: C++ JPEG decode+resize+normalize, only valid for
        # the fixed-size recipe on datasets that expose image file paths
        self.use_native = (use_native and fixed_size is not None
                           and hasattr(dataset, "image_path"))
        if self.use_native:
            from spe_tpu.data import native_io

            self.use_native = native_io.available()

    def _indices(self, epoch: int) -> List[int]:
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)  # set_epoch equivalent
            rng.shuffle(idx)
        return list(idx[self.process_index::self.process_count])

    def steps_per_epoch(self) -> int:
        n = len(self._indices(0))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _native_batch(self, bidx, rng) -> Optional[Dict[str, np.ndarray]]:
        """FixedSizeTransform semantics via the C++ decoder: optional train
        hflip + square resize + normalize, with boxes adjusted to match."""
        from spe_tpu.data import native_io

        S = self.fixed_size
        paths = [self.ds.image_path(i) for i in bidx]
        flips = [bool(rng.random() < 0.5) if self.train else False for _ in bidx]
        images = native_io.decode_batch(paths, S, flips,
                                        n_threads=self.num_threads)
        if images is None:
            return None
        targets = []
        for i, flip in zip(bidx, flips):
            t = self.ds.target_at(i)
            h, w = t["orig_size"]
            if len(t.get("boxes", [])):
                b = t["boxes"].astype(np.float32).copy()
                if flip:
                    b[:, [0, 2]] = w - b[:, [2, 0]]
                b[:, [0, 2]] *= S / w
                b[:, [1, 3]] *= S / h
                t["boxes"] = b
            t["size"] = np.array([S, S], np.int64)
            targets.append(t)
        batch = collate(list(zip(images, targets)), self.num_classes, S)
        return batch

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices(epoch)
        nb = self.steps_per_epoch()
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size] for i in range(nb)]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        rng = np.random.default_rng(self.seed * 7919 + epoch)

        def make_batch(bidx):
            if self.use_native:
                b = self._native_batch(bidx, rng)
                if b is not None:
                    return b
            samples = [self.ds[i] for i in bidx]
            return collate(samples, self.num_classes, self.fixed_size)

        def worker():
            try:
                for bidx in batches:
                    q.put(make_batch(bidx))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
