"""Training losses, shape-static for XLA.

Numerical parity targets (reference utils/criterion.py, utils/utils.py):

- `cross_entropy`       = nn.CrossEntropyLoss(weight, ignore_index) mean
                          (weighted mean: sum(w_t * nll) / sum(w_t) over
                          valid pixels) — criterion.py:10-38;
- `ohem_cross_entropy`  = criterion.py:63-78: keep valid pixels whose
                          predicted true-class prob < max(thres, kth
                          smallest prob) with k=min_kept, then take the
                          *plain* mean of their weighted per-pixel losses;
- `weighted_bce`        = criterion.py:102-119: class-balanced BCE with
                          logits over the boundary map, weight 0 for
                          pixels not in {0,1}, mean over ALL pixels;
- `FullLoss`            = utils/utils.py:37-57: l = loss_s + loss_b +
                          loss_sb with the boundary-aware CE on pixels
                          where sigmoid(boundary logit) > 0.8.

The reference's OHEM sorts all valid pixels dynamically
(criterion.py:72); here the kth-smallest threshold is found exactly with
a 32-step binary search over float bit patterns (`_kth_smallest`) —
static shapes, no sort. Under the shard_map training step each data
shard runs its own OHEM, exactly like per-GPU DataParallel replicas in
the reference.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

_BIG = 2.0  # sentinel prob for invalid pixels; any real prob is < 1


def _kth_smallest(x: jnp.ndarray, k) -> jnp.ndarray:
    """Exact k-th smallest (0-indexed) of a 1-D array of NON-NEGATIVE
    floats, without sorting: 32-step binary search over the uint32 bit
    space (bit patterns of non-negative IEEE floats are order-isomorphic).
    Each step is one fused compare+reduce pass — ~10x cheaper than XLA's
    full sort at OHEM sizes (6M pixels)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    k1 = (jnp.asarray(k, jnp.int32) + 1).astype(jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + ((hi - lo) >> 1)
        cnt = jnp.sum((bits <= mid).astype(jnp.int32))
        take_low = cnt >= k1
        return (
            jnp.where(take_low, lo, mid + jnp.uint32(1)),
            jnp.where(take_low, mid, hi),
        )

    # derive the initial bounds from the data so the loop carry is
    # device-varying under shard_map (a literal carry trips the vma check)
    zero = bits[0] & jnp.uint32(0)
    lo, _ = jax.lax.fori_loop(0, 32, body, (zero, zero | jnp.uint32(0xFFFFFFFF)))
    return jax.lax.bitcast_convert_type(lo, jnp.float32)


def _per_pixel_ce(logits, labels, class_weights, ignore_label):
    """Returns (raw per-pixel nll, per-pixel class weight, valid mask).

    logits: (..., C) float; labels: (...,) int. The label gather is
    expressed as a one-hot select+reduce over the class dim — on TPU a
    fused vector op, where `take_along_axis`/`w[labels]` lower to serial
    6M-element gathers costing ~100 ms each at training resolution.
    """
    num_classes = logits.shape[-1]
    valid = labels != ignore_label
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    onehot = safe_labels[..., None] == jnp.arange(num_classes, dtype=jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    if class_weights is not None:
        cw = jnp.asarray(class_weights, jnp.float32)
        w = jnp.sum(jnp.where(onehot, cw, 0.0), axis=-1)
    else:
        w = jnp.ones_like(nll)
    w = jnp.where(valid, w, 0.0)
    return nll, w, valid


def _ce_from_maps(nll, w, divide_by: str = "weights", numel=None):
    """Reduce per-pixel (nll, weight) maps to the scalar CE."""
    wl = nll * w
    if divide_by == "numel":
        denom = wl.size if numel is None else jnp.maximum(numel, 1)
        return jnp.sum(wl) / denom
    return jnp.sum(wl) / jnp.maximum(jnp.sum(w), 1e-12)


def _ohem_from_maps(nll, w, valid, thres: float, min_kept: int):
    """OHEM reduction over per-pixel maps (reference criterion.py:63-78)."""
    min_kept = max(1, int(min_kept))
    wl = nll * w
    # predicted prob of the true class = exp(log_softmax[label]) = exp(-nll)
    true_prob = jnp.where(valid, jnp.exp(-jax.lax.stop_gradient(nll)), _BIG)
    true_prob = true_prob.reshape(-1)

    # kth smallest valid prob (reference: sorted pred[min(min_kept, nvalid-1)],
    # criterion.py:73) — found by exact bit-space bisection, no sort. Invalid
    # pixels rank last via the _BIG sentinel; the clamp to nvalid-1 makes the
    # degenerate almost-all-ignored case match the reference exactly too.
    nvalid = jnp.sum(valid)
    k = jnp.clip(jnp.minimum(min_kept, nvalid - 1), 0, true_prob.size - 1)
    kth = _kth_smallest(true_prob, k)
    threshold = jnp.maximum(kth, thres)

    keep = valid.reshape(-1) & (true_prob < threshold)
    kept_losses = jnp.where(keep, wl.reshape(-1), 0.0)
    return jnp.sum(kept_losses) / jnp.maximum(jnp.sum(keep), 1)


def cross_entropy(
    logits,
    labels,
    class_weights=None,
    ignore_label=-1,
    divide_by: str = "weights",
    numel=None,
):
    """Mean-reduced weighted CE.

    divide_by="weights": torch nn.CrossEntropyLoss 'mean' (divide by the sum
    of kept class weights) — the reference `CrossEntropy` path.
    divide_by="numel": divide by the TOTAL pixel count. This reproduces the
    reference's OHEM aux-head quirk: `OhemCrossEntropy._ce_forward` keeps
    reduction='none' (criterion.py:50-61), so the aux CE stays a per-pixel
    map that is finally `.mean()`-ed over all pixels in the train loop
    (utils/function.py:44), ignored pixels contributing 0 to the numerator
    but 1 to the denominator. `numel` overrides that denominator — used by
    the padded validation path to count only real samples' pixels.
    """
    nll, w, _ = _per_pixel_ce(logits, labels, class_weights, ignore_label)
    return _ce_from_maps(nll, w, divide_by, numel)


def ohem_cross_entropy(
    logits,
    labels,
    class_weights=None,
    ignore_label=-1,
    thres: float = 0.7,
    min_kept: int = 100000,
):
    """Online hard-example mining CE (reference criterion.py:63-78)."""
    nll, w, valid = _per_pixel_ce(logits, labels, class_weights, ignore_label)
    return _ohem_from_maps(nll, w, valid, thres, min_kept)


def weighted_bce(bd_logits, targets, numel=None):
    """Class-balanced BCE-with-logits on the 1-channel boundary logits.

    bd_logits: (N,H,W,1) or (N,H,W); targets: (N,H,W) float/int in {0,1}
    (other values get weight 0). Mean over all pixels, matching
    reference criterion.py:117 (reduction='mean' with explicit weights);
    `numel` overrides the denominator when the batch carries padding.
    """
    logits = bd_logits.reshape(-1).astype(jnp.float32)
    t = targets.reshape(-1).astype(jnp.float32)
    pos = t == 1.0
    neg = t == 0.0
    pos_num = jnp.sum(pos)
    neg_num = jnp.sum(neg)
    total = jnp.maximum(pos_num + neg_num, 1)
    weight = jnp.where(pos, neg_num / total, jnp.where(neg, pos_num / total, 0.0))
    # stable BCE-with-logits: max(x,0) - x*t + log1p(exp(-|x|))
    bce = jnp.maximum(logits, 0.0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    denom = logits.size if numel is None else jnp.maximum(numel, 1)
    return jnp.sum(weight * bce) / denom


def boundary_loss(bd_logits, targets, coeff_bce: float = 20.0):
    """BondaryLoss [sic] (reference criterion.py:122-132)."""
    return coeff_bce * weighted_bce(bd_logits, targets)


class FullLoss:
    """Composes the PIDNet training objective (reference utils/utils.py:21-57).

    Callable as `loss, metrics = full_loss(outputs, labels, bd_gt)` where
    outputs = [p_logits, logits, d_logits] at 1/8 resolution (NHWC).
    All outputs are first upsampled to the label size with
    align_corners=cfg.MODEL.ALIGN_CORNERS (utils/utils.py:41-46).
    """

    def __init__(
        self,
        *,
        num_outputs: int = 2,
        align_corners: bool = True,
        ignore_label: int = 255,
        class_weights=None,
        use_ohem: bool = True,
        ohem_thres: float = 0.9,
        ohem_kept: int = 131072,
        balance_weights=(0.4, 1.0),
        sb_weights: float = 1.0,
        bd_coeff: float = 20.0,
    ):
        self.align_corners = align_corners
        self.ignore_label = ignore_label
        self.class_weights = class_weights
        self.use_ohem = use_ohem
        self.ohem_thres = ohem_thres
        self.ohem_kept = ohem_kept
        self.balance_weights = tuple(balance_weights)
        self.sb_weights = sb_weights
        self.bd_coeff = bd_coeff
        assert num_outputs == len(self.balance_weights)

    def _maps(self, logits, labels, out_hw):
        """Per-pixel (nll, weight, valid) at label resolution. Low-res
        logits go through ops.ce_front.ce_maps, which on the bf16 TPU
        training path fuses upsample+log-softmax+NLL in one Pallas kernel
        (full-res C-channel logits never reach HBM); otherwise it is the
        exact XLA resize + one-hot CE."""
        from pidnet_tpu.ops.ce_front import ce_maps

        nll, w = ce_maps(
            logits, labels, self.class_weights, self.ignore_label, out_hw,
            self.align_corners,
        )
        return nll, w, labels != self.ignore_label

    def _single_maps(self, maps, use_ohem, numel=None):
        nll, w, valid = maps
        if use_ohem:
            return _ohem_from_maps(nll, w, valid, self.ohem_thres, self.ohem_kept)
        # Inside the OHEM criterion the aux head's plain CE is normalized
        # by total pixel count (see cross_entropy docstring); the non-OHEM
        # criterion uses torch's weighted mean.
        divide_by = "numel" if self.use_ohem else "weights"
        return _ce_from_maps(nll, w, divide_by, numel)

    def sem_loss(self, scores: list, labels, numel=None, out_hw=None, final_maps=None):
        """Balance-weighted multi-output semantic loss: plain CE on all but
        the last head, OHEM on the last (reference criterion.py:87-93).
        `final_maps` optionally supplies precomputed per-pixel maps for the
        last head so __call__ can share ONE ce_front invocation between the
        OHEM term and the boundary-aware CE (see __call__)."""
        out_hw = out_hw or (labels.shape[1], labels.shape[2])
        if len(scores) != len(self.balance_weights):
            # zip would silently truncate — with more heads than weights the
            # FINAL head's OHEM term would be dropped entirely. The reference
            # raises here too (criterion.py:96-99).
            raise ValueError(
                f"lengths of prediction ({len(scores)}) and "
                f"LOSS.BALANCE_WEIGHTS ({len(self.balance_weights)}) "
                "are not identical"
            )
        losses = []
        for i, (w, s) in enumerate(zip(self.balance_weights, scores)):
            is_last = i == len(scores) - 1
            maps = (
                final_maps
                if is_last and final_maps is not None
                else self._maps(s, labels, out_hw)
            )
            losses.append(
                w * self._single_maps(maps, self.use_ohem and is_last, numel)
            )
        return sum(losses)

    def __call__(self, outputs: list, labels, bd_gt, sample_mask=None):
        """`sample_mask` (N,) in {0,1} marks real vs padding samples; padded
        samples are made inert in every term (ignore-labeled for CE/OHEM,
        weight-0 in the BCE, excluded from acc and the numel denominator),
        so the loss over a padded batch equals the loss the reference
        computes over the unpadded batch (utils/function.py:94-106)."""
        from pidnet_tpu.ops.resize import resize_bilinear
        from pidnet_tpu.ops.upsample_argmax import upsample_argmax

        h, w = labels.shape[1], labels.shape[2]
        # seg heads stay LOW-RES (the CE maps upsample on the fly); only
        # the 1-channel boundary head is materialized at label size
        # (reference utils/utils.py:41-46 upsamples everything — same math)
        seg_heads = outputs[:-1]
        seg_final = seg_heads[-1]
        bd_head = outputs[-1]
        if bd_head.shape[1:3] != (h, w):
            bd_head = resize_bilinear(bd_head, (h, w), self.align_corners)

        numel = None
        sample_valid = None
        if sample_mask is not None:
            sample_valid = sample_mask.reshape(-1, 1, 1) > 0
            labels = jnp.where(sample_valid, labels, self.ignore_label)
            # -1 is outside {0,1}: weight 0 in weighted_bce AND excluded
            # from its pos/neg balance counts
            bd_gt = jnp.where(sample_valid, bd_gt, -1.0)
            numel = jnp.sum(sample_mask.astype(jnp.float32)) * (h * w)

        # pixel accuracy of the final head. NOTE: the reference counts
        # every label >= 0 as valid (utils/utils.py:31), so with
        # IGNORE_LABEL=255 the ignored pixels count against accuracy.
        # Faithfully reproduced (padding samples excluded when masked).
        preds = upsample_argmax(
            jax.lax.stop_gradient(seg_final), (h, w), self.align_corners
        )
        valid = labels >= 0
        if sample_valid is not None:
            valid = valid & sample_valid
        acc = jnp.sum(valid & (preds == labels)) / (jnp.sum(valid) + 1e-10)

        # ONE ce_front invocation serves both final-head terms: the OHEM
        # loss and the boundary-aware CE share the same per-pixel nll map
        # (nll depends only on logits + true label); the SB term
        # (utils/utils.py:52-54 — keep the label only where
        # sigmoid(boundary logit) > 0.8, i.e. bd_label) differs from the
        # plain-label term ONLY in which pixels are valid, so it is the
        # same maps with validity/weights additionally masked by the
        # boundary confidence. Pixels that are bd-unconfident get w=0 and
        # valid=False — exactly what ce_maps(bd_label) would produce —
        # while their nll values are inert in every reduction. This halves
        # the final head's upsample+CE cost (fwd and bwd: the two terms'
        # cotangents sum into one ce_front backward).
        nll_f, w_f, valid_f = self._maps(seg_final, labels, (h, w))
        final_maps = (nll_f, w_f, valid_f)

        loss_s = self.sem_loss(seg_heads, labels, numel, (h, w), final_maps)
        loss_b = self.bd_coeff * weighted_bce(bd_head, bd_gt, numel)

        # boundary-aware CE: only pixels the boundary head is confident
        # about keep their label (utils/utils.py:52-54)
        bd_conf = jax.nn.sigmoid(bd_head[..., 0].astype(jnp.float32)) > 0.8
        # nll needs no masking: w=0 / valid=False already make unconfident
        # pixels inert in every reduction (wl = nll*w; OHEM's true_prob is
        # sentineled by valid)
        sb_maps = (nll_f, jnp.where(bd_conf, w_f, 0.0), valid_f & bd_conf)
        loss_sb = self.sb_weights * self._single_maps(sb_maps, self.use_ohem)

        loss = loss_s + loss_b + loss_sb
        metrics = {
            "loss": loss,
            "acc": acc,
            "sem_loss": loss_s,
            "bce_loss": loss_b,
            "sb_loss": loss_sb,
        }
        return loss, metrics
