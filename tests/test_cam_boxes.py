import numpy as np
import jax.numpy as jnp

from spe_tpu.ops.cam_boxes import _connected_components, cam_pseudo_boxes


def _cv2_multi_bboxes(cam, cam_thr=0.2, area_ratio=0.5, out_size=512):
    """The reference pipeline verbatim-in-behavior: resize_cam
    (cams_deit.py:9-13) + get_multi_bboxes (cams_deit.py:61-96) via cv2."""
    import cv2

    cam = cv2.resize(cam.astype(np.float32), (out_size, out_size))
    cam = cam - cam.min()
    cam = cam / max(cam.max(), 1e-12)
    cam = (cam * 255.0).astype(np.uint8)
    map_thr = cam_thr * np.max(cam)
    _, thr = cv2.threshold(cam, int(map_thr), 255, cv2.THRESH_TOZERO)
    contours, _ = cv2.findContours(thr, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE)
    if len(contours) == 0:
        return np.array([[0, 0, 1, 1]], np.float32) / out_size
    areas = [cv2.contourArea(c) for c in contours]
    order = sorted(range(len(areas)), key=areas.__getitem__, reverse=True)
    boxes = []
    for i in order:
        if areas[i] >= areas[order[0]] * area_ratio:
            x, y, w, h = cv2.boundingRect(contours[i])
            boxes.append([x, y, x + w, y + h])
    return np.array(boxes, np.float32) / out_size


def _blobby_cam(rng, h=32, w=32, n_blobs=2):
    cam = np.zeros((h, w), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    for _ in range(n_blobs):
        cy, cx = rng.uniform(0.2, 0.8) * h, rng.uniform(0.2, 0.8) * w
        sy, sx = rng.uniform(0.05, 0.2) * h, rng.uniform(0.05, 0.2) * w
        amp = rng.uniform(0.5, 1.0)
        cam += amp * np.exp(-((ys - cy) ** 2 / (2 * sy**2) + (xs - cx) ** 2 / (2 * sx**2)))
    return cam


def _iou(a, b):
    lt = np.maximum(a[:2], b[:2])
    rb = np.minimum(a[2:], b[2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[0] * wh[1]
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def test_connected_components_vs_scipy(rng):
    from scipy import ndimage

    for _ in range(8):
        mask = rng.uniform(size=(32, 32)) > 0.65
        lab = np.asarray(_connected_components(jnp.array(mask)))
        ref, n_ref = ndimage.label(mask, structure=np.ones((3, 3)))
        got_ids = np.unique(lab[mask])
        assert len(got_ids) == n_ref
        # component partitions identical
        for g in got_ids:
            ref_vals = np.unique(ref[lab == g])
            assert len(ref_vals) == 1


def test_cam_boxes_match_cv2_reference(rng):
    """Boxes from the on-device pipeline overlap the cv2 reference ones."""
    matched, total = 0, 0
    for trial in range(10):
        cam = _blobby_cam(rng, n_blobs=rng.integers(1, 4))
        ref_boxes = _cv2_multi_bboxes(cam, cam_thr=0.2, area_ratio=0.5)
        out = cam_pseudo_boxes(
            jnp.array(cam)[None, None], jnp.ones((1, 1)), 0.2,
            area_ratio=0.5, size=64, k=4, max_boxes=8)
        m = np.asarray(out["mask"][0])
        from spe_tpu.ops.boxes import box_cxcywh_to_xyxy

        got = np.asarray(box_cxcywh_to_xyxy(out["boxes"][0]))[m]
        for rb in ref_boxes:
            total += 1
            if any(_iou(rb, gb) > 0.5 for gb in got):
                matched += 1
    assert matched / total >= 0.9, (matched, total)


def test_cam_boxes_batch_packing(rng):
    B, C = 2, 5
    cams = np.stack([
        np.stack([_blobby_cam(rng) for _ in range(C)]) for _ in range(B)
    ])
    img_label = np.zeros((B, C), np.float32)
    img_label[0, [1, 3]] = 1
    img_label[1, 4] = 1
    out = cam_pseudo_boxes(jnp.array(cams), jnp.array(img_label), 0.2,
                           size=32, k=3, max_boxes=6)
    labels = np.asarray(out["labels"])
    mask = np.asarray(out["mask"])
    boxes = np.asarray(out["boxes"])
    # labels are class+1 and only for positive classes
    assert set(np.unique(labels[0][mask[0]])) <= {2, 4}
    assert set(np.unique(labels[1][mask[1]])) <= {5}
    # class-ascending packing order among valid entries
    v0 = labels[0][mask[0]]
    assert (np.diff(v0) >= 0).all()
    # boxes normalized cxcywh within [0, 1]
    assert (boxes[mask] >= 0).all() and (boxes[mask] <= 1).all()
    # padded entries contribute no labels
    assert (labels[~mask] == 0).all()


def test_cam_boxes_jit_traced_threshold(rng):
    import jax

    cam = _blobby_cam(rng)
    f = jax.jit(lambda thr: cam_pseudo_boxes(
        jnp.array(cam)[None, None], jnp.ones((1, 1)), thr, size=32, k=2, max_boxes=4))
    a = f(0.2)
    b = f(0.1)  # no retrace needed; lower threshold -> bigger/equal boxes
    wa = np.asarray(a["boxes"][0, 0, 2:]).prod()
    wb = np.asarray(b["boxes"][0, 0, 2:]).prod()
    assert wb >= wa - 1e-6


def test_max_pos_budget_matches_full(rng):
    """Gathering positive channels (max_pos) must be exact when every image
    has <= max_pos positive labels."""
    B, C, S = 3, 12, 24
    cams = rng.normal(size=(B, C, S, S)).astype(np.float32)
    img_label = np.zeros((B, C), np.float32)
    img_label[0, [1, 7]] = 1
    img_label[1, [0, 3, 11]] = 1
    img_label[2, [5]] = 1
    full = cam_pseudo_boxes(jnp.array(cams), jnp.array(img_label), 0.2,
                            size=16, k=2, max_boxes=8)
    budg = cam_pseudo_boxes(jnp.array(cams), jnp.array(img_label), 0.2,
                            size=16, k=2, max_boxes=8, max_pos=4)
    np.testing.assert_array_equal(np.asarray(full["mask"]), np.asarray(budg["mask"]))
    np.testing.assert_array_equal(np.asarray(full["labels"]), np.asarray(budg["labels"]))
    np.testing.assert_allclose(np.asarray(full["boxes"]), np.asarray(budg["boxes"]),
                               rtol=1e-6, atol=1e-6)


def test_pallas_cc_matches_xla(rng):
    """The single-kernel Pallas CC (interpret mode on CPU) reaches the same
    fixpoint as the XLA while_loop implementation, incl. percolation noise."""
    import jax

    from spe_tpu.ops.pallas_cc import connected_components_pallas

    masks = []
    for p in (0.35, 0.5, 0.65):
        masks.append(rng.uniform(size=(16, 16)) > p)
    # adversarial: diagonal snake + checkerboard (8-connectivity joins it)
    snake = np.zeros((16, 16), bool)
    for i in range(16):
        snake[i, (i * 3) % 16] = True
    masks.append(snake)
    masks.append(np.indices((16, 16)).sum(0) % 2 == 0)
    batch = jnp.asarray(np.stack(masks))
    got = np.asarray(connected_components_pallas(batch, interpret=True))
    want = np.asarray(jax.vmap(_connected_components)(batch))
    np.testing.assert_array_equal(got, want)
