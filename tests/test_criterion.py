import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from spe_tpu.train.criterion import (image_label_losses, jitter_repeat_targets,
                                     match, matcher_cost, set_criterion)


def _mk_outputs(rng, B=2, Q=20, K=6, L=3):
    return {
        "pred_logits": jnp.array(rng.normal(size=(B, Q, K)).astype(np.float32)),
        "pred_boxes": jnp.array(rng.uniform(0.2, 0.8, (B, Q, 4)).astype(np.float32)),
        "aux_pred_logits": jnp.array(rng.normal(size=(L - 1, B, Q, K)).astype(np.float32)),
        "aux_pred_boxes": jnp.array(rng.uniform(0.2, 0.8, (L - 1, B, Q, 4)).astype(np.float32)),
    }


def _mk_targets(rng, B=2, T=4, K=6, n_valid=(3, 2)):
    boxes = rng.uniform(0.3, 0.6, (B, T, 4)).astype(np.float32)
    labels = rng.integers(1, K - 1, (B, T)).astype(np.int32)
    mask = np.zeros((B, T), bool)
    for b, n in enumerate(n_valid):
        mask[b, :n] = True
    return {
        "boxes": jnp.array(boxes), "labels": jnp.array(labels),
        "mask": jnp.array(mask),
        "scores": jnp.array(rng.uniform(0.2, 0.9, (B, T)).astype(np.float32)),
    }


def _np_reference_losses(outputs, targets, num_boxes, K, gamma=2.0, alpha=0.25,
                         refine=False):
    """Reference-semantics loss oracle (conditional_detr.py:237-319,497-589)
    with exact scipy matching, per final layer only."""
    logits = np.asarray(outputs["pred_logits"])
    pboxes = np.asarray(outputs["pred_boxes"])
    B, Q, _ = logits.shape
    tot_ce_terms = np.zeros((B, Q, K))
    weights = np.ones((B, Q, K))
    l1_sum, giou_sum = 0.0, 0.0
    for b in range(B):
        m = np.asarray(targets["mask"][b])
        tb = np.asarray(targets["boxes"][b])[m]
        tl = np.asarray(targets["labels"][b])[m]
        ts = np.asarray(targets["scores"][b])[m]
        prob = 1 / (1 + np.exp(-logits[b]))
        neg = (1 - alpha) * prob**2 * (-np.log(1 - prob + 1e-8))
        pos = alpha * (1 - prob) ** 2 * (-np.log(prob + 1e-8))
        c_class = pos[:, tl] - neg[:, tl]
        c_bbox = np.abs(pboxes[b][:, None] - tb[None]).sum(-1)

        def xyxy(x):
            return np.concatenate([x[..., :2] - x[..., 2:] / 2, x[..., :2] + x[..., 2:] / 2], -1)

        def giou(b1, b2):
            a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
            a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
            lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
            rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[..., 0] * wh[..., 1]
            union = a1[:, None] + a2[None] - inter
            iou = inter / union
            lt2 = np.minimum(b1[:, None, :2], b2[None, :, :2])
            rb2 = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
            wh2 = np.clip(rb2 - lt2, 0, None)
            area = wh2[..., 0] * wh2[..., 1]
            return iou - (area - union) / area

        g = giou(xyxy(pboxes[b]), xyxy(tb))
        C = 5 * c_bbox + 2 * c_class + 2 * (-g)
        r, c = linear_sum_assignment(C)
        # one-hot targets + box losses on matched pairs
        if refine:
            weights[b] = ts.mean()
        for ri, ci in zip(r, c):
            tot_ce_terms[b, ri, tl[ci]] = 1.0
            w = ts[ci] if refine else 1.0
            l1_sum += np.abs(pboxes[b, ri] - tb[ci]).sum() * (w if refine else 1)
            giou_sum += (1 - g[ri, ci]) * (w if refine else 1)
            if refine:
                weights[b, ri, :] = min(3 * ts[ci], 1.0)
    prob = 1 / (1 + np.exp(-logits))
    ce = -(tot_ce_terms * np.log(prob) + (1 - tot_ce_terms) * np.log(1 - prob))
    p_t = np.clip(prob * tot_ce_terms + (1 - prob) * (1 - tot_ce_terms), 1e-5, 1 - 1e-5)
    loss = weights * ce * (1 - p_t) ** gamma
    alpha_t = alpha * tot_ce_terms + (1 - alpha) * (1 - tot_ce_terms)
    loss_ce = (alpha_t * loss).mean(1).sum() / num_boxes * Q
    return {"loss_ce": loss_ce, "loss_bbox": l1_sum / num_boxes,
            "loss_giou": giou_sum / num_boxes}


def test_criterion_matches_reference_oracle(rng):
    outputs = _mk_outputs(rng)
    targets = _mk_targets(rng)
    num_boxes = 5.0
    got = set_criterion(outputs, targets, None, num_boxes,
                        assignment="hungarian_cpu", training=False,
                        focal_gamma=2.0)
    want = _np_reference_losses(outputs, targets, num_boxes, K=6)
    for k in ("loss_ce", "loss_bbox", "loss_giou"):
        np.testing.assert_allclose(float(got[k]), want[k], rtol=2e-3), k
    # aux layers present
    assert "loss_ce_0" in got and "loss_ce_1" in got


def test_criterion_refine_weights_match_oracle(rng):
    outputs = _mk_outputs(rng)
    targets = _mk_targets(rng)
    num_boxes = 5.0
    got = set_criterion(outputs, targets, None, num_boxes,
                        assignment="hungarian_cpu", training=False,
                        refine_weights=True, focal_gamma=2.0)
    want = _np_reference_losses(outputs, targets, num_boxes, K=6, refine=True)
    for k in ("loss_ce", "loss_bbox", "loss_giou"):
        np.testing.assert_allclose(float(got[k]), want[k], rtol=2e-3), k


def test_criterion_auction_close_to_exact(rng):
    outputs = _mk_outputs(rng, Q=40)
    targets = _mk_targets(rng)
    kw = dict(training=False, focal_gamma=0.5)
    exact = set_criterion(outputs, targets, None, 5.0, assignment="hungarian_cpu", **kw)
    approx = set_criterion(outputs, targets, None, 5.0, assignment="auction", **kw)
    for k in ("loss_ce", "loss_bbox", "loss_giou"):
        np.testing.assert_allclose(float(approx[k]), float(exact[k]), rtol=0.02)


def test_jitter_repeat_semantics(rng):
    targets = _mk_targets(rng, B=1, T=3, n_valid=(3,))
    out = jitter_repeat_targets(targets, jax.random.PRNGKey(0), ratio=5, box_jitter=0.1)
    assert out["boxes"].shape == (1, 15, 4)
    assert out["labels"].shape == (1, 15)
    boxes = np.asarray(out["boxes"]).reshape(3, 5, 4)
    orig = np.asarray(targets["boxes"][0])
    # last slot is always the original box
    np.testing.assert_allclose(boxes[:, -1], orig, atol=1e-6)
    # jittered copies have IoU > 0.7 with the original
    from spe_tpu.ops.boxes import box_cxcywh_to_xyxy, box_iou_aligned

    for t in range(3):
        ious = np.asarray(box_iou_aligned(
            box_cxcywh_to_xyxy(jnp.array(boxes[t, :4])),
            box_cxcywh_to_xyxy(jnp.broadcast_to(jnp.array(orig[t]), (4, 4)))))
        assert (ious > 0.7).all()
    # labels repeat, masks repeat
    assert (np.asarray(out["labels"][0]).reshape(3, 5) ==
            np.asarray(targets["labels"][0])[:, None]).all()


def test_jitter_actually_jitters(rng):
    targets = _mk_targets(rng, B=1, T=2, n_valid=(2,))
    out = jitter_repeat_targets(targets, jax.random.PRNGKey(3), ratio=5, box_jitter=0.1)
    boxes = np.asarray(out["boxes"]).reshape(2, 5, 4)
    orig = np.asarray(targets["boxes"][0])
    # at least some jittered slots differ from the original
    assert np.abs(boxes[:, :4] - orig[:, None]).max() > 1e-4


def test_image_label_losses(rng):
    backbone_out = {
        "x_logits": jnp.array(rng.normal(size=(2, 5)).astype(np.float32)),
        "x_cls_logits": jnp.array(rng.normal(size=(2, 5)).astype(np.float32)),
    }
    lbl = jnp.array((rng.uniform(size=(2, 5)) > 0.5).astype(np.float32))
    out = image_label_losses(backbone_out, lbl)
    assert set(out) == {"img_label_logits", "img_label_logits_tokens"}
    for v in out.values():
        assert np.isfinite(float(v))


def test_criterion_grads_finite(rng):
    outputs = _mk_outputs(rng)
    targets = _mk_targets(rng)

    def loss_fn(o):
        losses = set_criterion(o, targets, jax.random.PRNGKey(0), 5.0,
                               assignment="auction", training=True)
        return 2.0 * losses["loss_ce"] + 2.0 * losses["loss_bbox"] + 2.0 * losses["loss_giou"]

    g = jax.grad(lambda o: loss_fn(o))(outputs)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_multi_stage_matches_per_stage(rng):
    """set_criterion_multi (one batched solver call) must be numerically
    identical to calling set_criterion per stage with the same rngs."""
    import jax

    from spe_tpu.train.criterion import set_criterion, set_criterion_multi

    B, Q, K, T, L = 2, 10, 5, 4, 3
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    stages = []
    for _ in range(2):
        stages.append({
            "pred_logits": mk(B, Q, K), "pred_boxes": jax.nn.sigmoid(mk(B, Q, 4)),
            "aux_pred_logits": mk(L - 1, B, Q, K),
            "aux_pred_boxes": jax.nn.sigmoid(mk(L - 1, B, Q, 4)),
        })
    tgts = []
    for _ in range(2):
        tgts.append({
            "boxes": jnp.clip(jax.nn.sigmoid(mk(B, T, 4)), 0.05, 0.9),
            "labels": jnp.asarray(rng.integers(0, K, (B, T)), jnp.int32),
            "mask": jnp.asarray(rng.uniform(size=(B, T)) > 0.3),
            "scores": jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
        })
    rngs = [jax.random.PRNGKey(3), jax.random.PRNGKey(7)]
    nbs = [jnp.float32(5.0), jnp.float32(4.0)]

    multi = set_criterion_multi(stages, tgts, rngs, nbs, [False, True],
                                hung_match_ratio=3)
    # stage 0 additionally carries solver-health stats (observability)
    assert float(multi[0].pop("match_cleanup")) == 0.0
    assert float(multi[0].pop("match_iters")) >= 1.0
    for s, flag in enumerate([False, True]):
        single = set_criterion(stages[s], tgts[s], rngs[s], nbs[s],
                               hung_match_ratio=3, refine_weights=flag)
        assert set(single) == set(multi[s])
        for k in single:
            np.testing.assert_allclose(np.asarray(multi[s][k]),
                                       np.asarray(single[k]), rtol=1e-6,
                                       atol=1e-6, err_msg=k)


def test_cost_trace_subopt_metrics(rng):
    """cost_trace=True adds match_subopt_{mean,max}: the configured solver's
    realized assignment cost vs the exact Hungarian optimum on the SAME cost
    matrices, normalized by (matched count x cost spread). Exact solver ->
    ~0; auction -> bounded by its eps guarantee (ops/assignment.py). Loss
    values must be unchanged by tracing."""
    import jax

    from spe_tpu.train.criterion import set_criterion_multi

    # Q > T*ratio like the deployment regime (Q=300 >> repeated targets);
    # with more columns than rows the two solvers' unmatched-column
    # conventions differ and the audit is not meaningful
    B, Q, K, T, L = 2, 40, 5, 4, 2
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    stages = [{
        "pred_logits": mk(B, Q, K), "pred_boxes": jax.nn.sigmoid(mk(B, Q, 4)),
        "aux_pred_logits": mk(L - 1, B, Q, K),
        "aux_pred_boxes": jax.nn.sigmoid(mk(L - 1, B, Q, 4)),
    }]
    tgts = [{
        "boxes": jnp.clip(jax.nn.sigmoid(mk(B, T, 4)), 0.05, 0.9),
        "labels": jnp.asarray(rng.integers(0, K, (B, T)), jnp.int32),
        "mask": jnp.asarray(rng.uniform(size=(B, T)) > 0.3),
        "scores": jnp.ones((B, T), jnp.float32),
    }]
    kw = dict(hung_match_ratio=3)

    for solver, bound in (("hungarian_cpu", 1e-6), ("auction", 0.05)):
        plain = set_criterion_multi(stages, tgts, [jax.random.PRNGKey(3)],
                                    [jnp.float32(5.0)], [False],
                                    assignment=solver, **kw)
        traced = set_criterion_multi(stages, tgts, [jax.random.PRNGKey(3)],
                                     [jnp.float32(5.0)], [False],
                                     assignment=solver, cost_trace=True, **kw)
        sub_mean = float(traced[0].pop("match_subopt_mean"))
        sub_max = float(traced[0].pop("match_subopt_max"))
        assert -1e-6 <= sub_mean <= sub_max <= bound, (solver, sub_mean, sub_max)
        for k in plain[0]:
            np.testing.assert_allclose(np.asarray(traced[0][k]),
                                       np.asarray(plain[0][k]), rtol=1e-6,
                                       err_msg=(solver, k))
