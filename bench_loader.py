"""Data-pipeline throughput bench: can the host feed the device?

Measures images/sec of the native C++ decode path (libjpeg decode +
antialiased resize + normalize + flip, spe_tpu/native/dataio.cc) vs the
PIL fallback, at the recipe shape (512x512, batch 8). The target is
loader img/s >= device img/s so training is never input-bound
(reference analog: torch DataLoader num_workers, main.py:196-209).

Prints one JSON line:
  {"metric": "loader_images_per_sec", "value": N, "unit": "img/s",
   "pil_images_per_sec": M, "device_images_per_sec_ref": ...}
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from pathlib import Path

import numpy as np

B, S, N_BATCHES = 8, 512, 12
NT = min(2, os.cpu_count() or 1)  # 1 on this box: extra threads only add switching


def make_jpegs(tmp, n=32, src=640):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        # low-frequency content so files look like photos, not noise
        small = rng.integers(0, 255, (src // 8, src // 8, 3), np.uint8)
        img = Image.fromarray(small).resize((src, src), Image.BILINEAR)
        p = Path(tmp) / f"img_{i}.jpg"
        img.save(p, quality=90)
        paths.append(p)
    return paths


def main():
    from spe_tpu.data import native_io
    from spe_tpu.data.transforms import FixedSizeTransform

    with tempfile.TemporaryDirectory() as tmp:
        paths = make_jpegs(tmp)
        flips = [i % 2 == 0 for i in range(B)]

        assert native_io.available(), "native dataio library not built"
        # warm (first call pays dlopen + thread spin-up)
        native_io.decode_batch(paths[:B], S, flips, n_threads=NT)
        t0 = time.time()
        for i in range(N_BATCHES):
            batch = [paths[(i * B + j) % len(paths)] for j in range(B)]
            out = native_io.decode_batch(batch, S, flips, n_threads=NT)
            assert out is not None and out.shape == (B, S, S, 3)
        native_rate = B * N_BATCHES / (time.time() - t0)

        from PIL import Image

        tf = FixedSizeTransform(S, train=False)
        t0 = time.time()
        for i in range(N_BATCHES):
            for j in range(B):
                p = paths[(i * B + j) % len(paths)]
                img = Image.open(p).convert("RGB")
                tf(img, {"image_id": 0, "orig_size": np.array(img.size[::-1]),
                         "size": np.array(img.size[::-1]),
                         "img_label": np.zeros(3, np.float32)})
        pil_rate = B * N_BATCHES / (time.time() - t0)

    print(json.dumps({
        "metric": "loader_images_per_sec",
        "value": round(native_rate, 2),
        "unit": "img/s",
        "pil_images_per_sec": round(pil_rate, 2),
        "batch": B, "size": S,
    }))


if __name__ == "__main__":
    main()
