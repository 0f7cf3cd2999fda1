"""Loss numerical goldens vs torch oracles.

Oracles are written here from the formulas in SURVEY.md §2.5 using
torch.nn.functional — they define the reference semantics (including the
reduction='none' aux-CE quirk and OHEM's sorted-threshold selection).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pidnet_tpu.losses import (
    FullLoss,
    boundary_loss,
    cross_entropy,
    ohem_cross_entropy,
    weighted_bce,
)

IGNORE = 255


def _rand_logits_labels(rng, n=2, h=32, w=48, c=19, ignore_frac=0.2):
    logits = rng.standard_normal((n, h, w, c), dtype=np.float32) * 2
    labels = rng.integers(0, c, (n, h, w))
    mask = rng.random((n, h, w)) < ignore_frac
    labels = np.where(mask, IGNORE, labels).astype(np.int64)
    return logits, labels


def _t(logits):  # NHWC -> NCHW torch tensor
    return torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))


def test_cross_entropy_weighted_mean(rng):
    logits, labels = _rand_logits_labels(rng)
    weights = (0.5 + rng.random(19)).astype(np.float32)
    want = F.cross_entropy(
        _t(logits), torch.from_numpy(labels),
        weight=torch.from_numpy(weights), ignore_index=IGNORE,
    ).item()
    got = float(cross_entropy(logits, labels, weights, IGNORE))
    assert abs(got - want) < 5e-5


def test_cross_entropy_numel_mean(rng):
    """The OHEM-criterion aux path: reduction='none' then global mean."""
    logits, labels = _rand_logits_labels(rng)
    weights = (0.5 + rng.random(19)).astype(np.float32)
    per_pix = F.cross_entropy(
        _t(logits), torch.from_numpy(labels),
        weight=torch.from_numpy(weights), ignore_index=IGNORE, reduction="none",
    )
    want = per_pix.mean().item()
    got = float(cross_entropy(logits, labels, weights, IGNORE, divide_by="numel"))
    assert abs(got - want) < 1e-5


@pytest.mark.parametrize("min_kept,thres", [(100, 0.7), (5000, 0.9), (1, 0.5)])
def test_ohem(rng, min_kept, thres):
    logits, labels = _rand_logits_labels(rng)
    weights = (0.5 + rng.random(19)).astype(np.float32)

    # oracle per SURVEY §2.5: sort valid true-class probs ascending,
    # threshold = max(thres, prob[min_kept]), keep prob < threshold, mean
    lt, tt, wt = _t(logits), torch.from_numpy(labels), torch.from_numpy(weights)
    pixel_losses = F.cross_entropy(
        lt, tt, weight=wt, ignore_index=IGNORE, reduction="none"
    ).view(-1)
    prob = F.softmax(lt, dim=1)
    tmp = tt.clone()
    tmp[tmp == IGNORE] = 0
    tp = prob.gather(1, tmp.unsqueeze(1)).view(-1)
    mask = tt.view(-1) != IGNORE
    sorted_probs, ind = tp[mask].sort()
    min_value = sorted_probs[min(min_kept, sorted_probs.numel() - 1)]
    threshold = max(min_value.item(), thres)
    kept = pixel_losses[mask][ind]
    kept = kept[sorted_probs < threshold]
    want = kept.mean().item()

    got = float(ohem_cross_entropy(logits, labels, weights, IGNORE, thres, min_kept))
    assert abs(got - want) < 1e-5, (got, want)


def test_weighted_bce(rng):
    pre = rng.standard_normal((2, 1, 16, 16), dtype=np.float32)
    target = np.zeros((2, 16, 16), np.float32)
    target[:, 5, :] = 1
    target[:, 10, 3] = 2  # out-of-{0,1} pixels get weight 0

    log_p = torch.from_numpy(pre).permute(0, 2, 3, 1).contiguous().view(1, -1)
    tt = torch.from_numpy(target).view(1, -1)
    pos, neg = tt == 1, tt == 0
    w = torch.zeros_like(log_p)
    s = pos.sum() + neg.sum()
    w[pos] = neg.sum() * 1.0 / s
    w[neg] = pos.sum() * 1.0 / s
    want = F.binary_cross_entropy_with_logits(log_p, tt, w, reduction="mean").item()

    got = float(weighted_bce(np.transpose(pre, (0, 2, 3, 1)), target))
    assert abs(got - want) < 1e-6
    got20 = float(boundary_loss(np.transpose(pre, (0, 2, 3, 1)), target))
    assert abs(got20 - 20.0 * want) < 1e-5


def test_full_loss_composition(rng):
    """End-to-end objective = loss_s + loss_b + loss_sb with upsampling
    (reference utils/utils.py:37-57), verified against a torch oracle."""
    n, h8, w8, c = 2, 8, 12, 19
    h, w = h8 * 8, w8 * 8
    outs = [
        rng.standard_normal((n, h8, w8, c), dtype=np.float32),
        rng.standard_normal((n, h8, w8, c), dtype=np.float32),
        rng.standard_normal((n, h8, w8, 1), dtype=np.float32) * 3,
    ]
    labels = rng.integers(0, c, (n, h, w))
    labels = np.where(rng.random((n, h, w)) < 0.1, IGNORE, labels).astype(np.int64)
    edge = (rng.random((n, h, w)) < 0.15).astype(np.float32)
    weights = (0.5 + rng.random(c)).astype(np.float32)

    # ---- torch oracle
    ot = [F.interpolate(_t(o), size=(h, w), mode="bilinear", align_corners=True) for o in outs]
    lt = torch.from_numpy(labels)
    wt = torch.from_numpy(weights)

    def ohem(score, target, thres=0.9, min_kept=1000):
        pl = F.cross_entropy(score, target, weight=wt, ignore_index=IGNORE, reduction="none").view(-1)
        prob = F.softmax(score, dim=1)
        tmp = target.clone(); tmp[tmp == IGNORE] = 0
        tp = prob.gather(1, tmp.unsqueeze(1)).view(-1)
        mask = target.view(-1) != IGNORE
        sp, ind = tp[mask].sort()
        mv = sp[min(min_kept, sp.numel() - 1)]
        th = max(mv.item(), thres)
        kept = pl[mask][ind][sp < th]
        return kept.mean()

    ce_map = F.cross_entropy(ot[0], lt, weight=wt, ignore_index=IGNORE, reduction="none")
    loss_s = 0.4 * ce_map + 1.0 * ohem(ot[1], lt)
    # weighted bce oracle
    log_p = ot[2].permute(0, 2, 3, 1).contiguous().view(1, -1)
    tt = torch.from_numpy(edge).view(1, -1)
    pos, neg = tt == 1, tt == 0
    wbce = torch.zeros_like(log_p)
    s = pos.sum() + neg.sum()
    wbce[pos] = neg.sum() * 1.0 / s
    wbce[neg] = pos.sum() * 1.0 / s
    loss_b = 20.0 * F.binary_cross_entropy_with_logits(log_p, tt, wbce, reduction="mean")
    filler = torch.ones_like(lt) * IGNORE
    bd_label = torch.where(torch.sigmoid(ot[2][:, 0, :, :]) > 0.8, lt, filler)
    loss_sb = 1.0 * ohem(ot[1], bd_label)
    want = (loss_s + loss_b + loss_sb).mean().item()

    # ---- ours
    fl = FullLoss(
        num_outputs=2,
        align_corners=True,
        ignore_label=IGNORE,
        class_weights=weights,
        use_ohem=True,
        ohem_thres=0.9,
        ohem_kept=1000,
        balance_weights=(0.4, 1.0),
        sb_weights=1.0,
    )
    got, metrics = fl(outs, labels, edge)
    assert abs(float(got) - want) < 2e-4, (float(got), want)
    assert 0.0 <= float(metrics["acc"]) <= 1.0


def test_kth_smallest_fuzz(rng):
    """The 32-step bit-bisection k-th-smallest (criterion._kth_smallest,
    the sort-free OHEM threshold) must equal np.partition exactly on
    adversarial non-negative inputs: duplicates, zeros, subnormals, infs,
    and k at both ends."""
    import jax.numpy as jnp

    from pidnet_tpu.losses.criterion import _kth_smallest

    cases = []
    for _ in range(10):
        n = int(rng.integers(1, 5000))
        scale = rng.choice([1e-38, 1.0, 1e30])
        cases.append((rng.random(n) * scale).astype(np.float32))
    cases.append(np.zeros(100, np.float32))
    cases.append(np.full(64, 0.5, np.float32))  # all duplicates
    cases.append(np.float32([np.inf, 0.0, 1.0, np.inf]))
    cases.append(np.concatenate([np.zeros(10, np.float32),
                                 np.full(10, np.float32(2.0))]))
    for x in cases:
        for k in {0, len(x) // 2, len(x) - 1}:
            got = float(_kth_smallest(jnp.asarray(x), k))
            want = float(np.partition(x, k)[k])
            assert got == want or (np.isnan(got) and np.isnan(want)), (
                len(x), k, got, want)


def test_full_loss_shared_final_maps_equivalence(rng):
    """FullLoss shares ONE per-pixel (nll, w) map between the final head's
    OHEM term and the boundary-aware CE (criterion.FullLoss.__call__).
    That sharing must be f32-equivalent — value AND logits gradients — to
    the direct formulation that recomputes maps on bd_label (the pre-share
    semantics, identical to reference utils/utils.py:52-54)."""
    import jax
    import jax.numpy as jnp

    from pidnet_tpu.losses import criterion as C
    from pidnet_tpu.ops.resize import resize_bilinear

    n, h, w, c = 2, 64, 64, 19
    outs = [
        jnp.asarray(rng.standard_normal((n, h // 8, w // 8, c)), jnp.float32),
        jnp.asarray(rng.standard_normal((n, h // 8, w // 8, c)), jnp.float32),
        jnp.asarray(rng.standard_normal((n, h // 8, w // 8, 1)), jnp.float32),
    ]
    labels = jnp.asarray(rng.integers(0, c, (n, h, w)), jnp.int32)
    labels = jnp.where(jnp.asarray(rng.random((n, h, w)) < 0.1), IGNORE, labels)
    edges = jnp.asarray((rng.random((n, h, w)) < 0.2).astype(np.float32))
    cw = (0.5 + rng.random(c)).astype(np.float32)
    fl = FullLoss(ignore_label=IGNORE, ohem_kept=100, class_weights=cw)

    def direct(outputs):
        seg_heads = outputs[:-1]
        seg_final = seg_heads[-1]
        bd_head = resize_bilinear(outputs[-1], (h, w), fl.align_corners)
        loss_s = sum(
            bw
            * fl._single_maps(
                fl._maps(s, labels, (h, w)),
                fl.use_ohem and i == len(seg_heads) - 1,
            )
            for i, (bw, s) in enumerate(zip(fl.balance_weights, seg_heads))
        )
        loss_b = fl.bd_coeff * C.weighted_bce(bd_head, edges)
        bd_conf = jax.nn.sigmoid(bd_head[..., 0]) > 0.8
        bd_label = jnp.where(bd_conf, labels, fl.ignore_label)
        loss_sb = fl.sb_weights * fl._single_maps(
            fl._maps(seg_final, bd_label, (h, w)), fl.use_ohem
        )
        return loss_s + loss_b + loss_sb

    l_new, g_new = jax.value_and_grad(lambda o: fl(o, labels, edges)[0])(outs)
    l_old, g_old = jax.value_and_grad(direct)(outs)
    assert float(jnp.abs(l_new - l_old)) == 0.0, (float(l_new), float(l_old))
    for a, b in zip(g_new, g_old):
        # one fp reassociation in the summed final-head cotangent
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
