import numpy as np

from spe_tpu.data.multilabel_ap import AveragePrecisionMeter
from spe_tpu.utils.logging import MetricLogger, SmoothedValue
from spe_tpu.utils.visualize import blend_cam, denormalize_image, draw_boxes, resize_cam


def test_ap_meter_perfect_and_random():
    m = AveragePrecisionMeter()
    scores = np.array([[0.9, 0.1], [0.8, 0.2], [0.1, 0.9]])
    targets = np.array([[1, 0], [1, 0], [0, 1]])
    m.add(scores, targets)
    ap = m.value()
    np.testing.assert_allclose(ap, [1.0, 1.0])
    # one inversion in class 0
    m2 = AveragePrecisionMeter()
    m2.add(np.array([[0.9], [0.8], [0.7]]), np.array([[0], [1], [1]]))
    # ranks: neg first -> AP = (1/2 + 2/3)/2
    np.testing.assert_allclose(m2.value(), [(0.5 + 2 / 3) / 2])


def test_smoothed_value_and_logger():
    v = SmoothedValue(window_size=3)
    for x in (1.0, 2.0, 3.0, 4.0):
        v.update(x)
    assert v.median == 3.0
    assert v.global_avg == 2.5
    log = MetricLogger(print_fn=lambda *a, **k: None)
    items = list(log.log_every(range(5), print_freq=2, header="t"))
    assert items == list(range(5))
    log.update(loss=1.0)
    assert "loss" in str(log)


def test_visualization_roundtrip(rng):
    cam = rng.uniform(size=(8, 8)).astype(np.float32)
    big = resize_cam(cam, (32, 32))
    assert big.shape == (32, 32)
    assert 0 <= big.min() and big.max() <= 1.0 + 1e-6
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    blend, heat = blend_cam(img, big)
    assert blend.shape == img.shape
    boxed = draw_boxes(img, [[2, 2, 20, 20]], scores=[0.7], labels=["dog"])
    assert boxed.shape == img.shape
    norm = (img.astype(np.float32) / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225])
    back = denormalize_image(norm.astype(np.float32))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 1
