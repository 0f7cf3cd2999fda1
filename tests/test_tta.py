"""Multi-scale + flip TTA inference (engine.make_ms_flip_inference) —
the TEST.MULTI_SCALE / TEST.FLIP_TEST keys the reference declares but
never consumes (reference configs/default.py:84-85). The window/scale
accounting is verified against an independent composition of the plain
single-scale `make_inference` closure."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from pidnet_tpu.config import default_config
from pidnet_tpu import engine
from pidnet_tpu.models import pidnet as M
from pidnet_tpu.ops.resize import resize_bilinear


def _cfg(crop_hw, base, *, flip=False, ms=False, scales=(1.0,)):
    cfg = default_config()
    cfg.TEST.IMAGE_SIZE = [crop_hw[1], crop_hw[0]]  # width * height
    cfg.TEST.BASE_SIZE = base
    cfg.TEST.FLIP_TEST = flip
    cfg.TEST.MULTI_SCALE = ms
    cfg.TEST.SCALE_LIST = list(scales)
    cfg.MODEL.NUM_OUTPUTS = 2
    cfg.TEST.OUTPUT_INDEX = 1
    return cfg.freeze()


def _assert_probs_match(got, want, tol=0.01):
    """Compare exp'd probability maps in clipped log space.

    Random-init logits reach |z| > 88, where f32 exp saturates to inf
    (HRNet's raw-exp protocol assumes trained-scale logits), so prob-space
    allclose against an f64-built expectation fails on saturation alone.
    Clipping to the f32-meaningful range and comparing log-probs checks
    the same semantics without the overflow artifacts; 0.01 logit units
    of slack is far below any real accounting error."""
    lg = np.log(np.clip(np.asarray(got, np.float64), 1e-30, 1e38))
    lw = np.log(np.clip(np.asarray(want, np.float64), 1e-30, 1e38))
    np.testing.assert_allclose(lg, lw, rtol=0, atol=tol)


@pytest.fixture(scope="module")
def net():
    spec = M.spec_for("pidnet_s", 19, augment=True)
    params, state = M.init(jax.random.PRNGKey(3), spec)
    return spec, params, state


def test_identity_scale_matches_single_scale(rng, net):
    """scales=[1.0], no flip, image == crop == base: exactly the plain
    single-scale parity path."""
    spec, params, state = net
    cfg = _cfg((64, 128), 128)
    x = rng.standard_normal((1, 64, 128, 3)).astype(np.float32)

    want = np.asarray(engine.make_inference(cfg, spec, params, state)(jnp.asarray(x)))
    got = np.asarray(
        engine.make_ms_flip_inference(cfg, spec, params, state)(jnp.asarray(x))
    )
    # same math, different jit fusion boundaries since the round-5 fused
    # per-scale program (see test_multi_scale_sums_resized_probs note)
    _assert_probs_match(got, want)


def test_flip_averages_logits(rng, net):
    """FLIP_TEST: probs = exp(0.5 * (logits(x) + unflip(logits(flip x)))).

    Expected values are built from the raw upsampled logits (recovering
    them as log(plain()) underflows f32 for very negative logits)."""
    spec, params, state = net
    cfg = _cfg((64, 128), 128, flip=True)
    x = rng.standard_normal((1, 64, 128, 3)).astype(np.float32)

    def logits(v):
        out = M.apply(params, state, jnp.asarray(v), spec, train=False)[1]
        return np.asarray(
            resize_bilinear(out, (64, 128), cfg.MODEL.ALIGN_CORNERS)
        ).astype(np.float64)

    z = logits(x)
    zf = logits(x[:, :, ::-1])[:, :, ::-1]
    want = np.exp(0.5 * (z + zf))

    got = np.asarray(
        engine.make_ms_flip_inference(cfg, spec, params, state)(jnp.asarray(x))
    )
    _assert_probs_match(got, want)


def test_multi_scale_sums_resized_probs(rng, net):
    """MULTI_SCALE over fits-in-crop scales: sum over scales of the exp'd
    probabilities, each computed at the scaled size (zero-padded to crop,
    sliced back) and bilinearly resized to the input size."""
    spec, params, state = net
    cfg = _cfg((64, 128), 128, ms=True, scales=(0.5, 1.0))
    x = rng.standard_normal((1, 64, 128, 3)).astype(np.float32)
    plain = engine.make_inference(cfg, spec, params, state)

    # scale 1.0: long side 128 -> identity
    want = np.asarray(plain(jnp.asarray(x)))
    # scale 0.5: long side 64 -> (32, 64), pad to (64, 128), slice, resize
    xs = resize_bilinear(jnp.asarray(x), (32, 64), False)
    xp = jnp.pad(xs, ((0, 0), (0, 32), (0, 64), (0, 0)))
    p = np.asarray(plain(xp))[:, :32, :64]
    want = want + np.asarray(
        resize_bilinear(jnp.asarray(p), (64, 128), False)
    )

    got = np.asarray(
        engine.make_ms_flip_inference(cfg, spec, params, state)(jnp.asarray(x))
    )
    # round 5 fused each scale into one jitted program (host-dispatch fix);
    # XLA fusion reassociates the resize->exp composition, so raw prob
    # comparison carries ~2e-4 relative noise at random-init logit scales —
    # compare in clipped log space like the other accounting tests
    _assert_probs_match(got, want)


def test_sliding_windows_count_average(rng, net):
    """A scaled image wider than the crop runs the 2/3-overlap window grid
    with count-averaged overlaps — verified against a hand-built grid using
    the plain single-scale closure on each window."""
    spec, params, state = net
    cfg = _cfg((64, 64), 128)  # crop 64x64; image long side 128 -> windows
    x = rng.standard_normal((1, 64, 128, 3)).astype(np.float32)
    plain = engine.make_inference(cfg, spec, params, state)

    # grid along W: nh=64 fits, nw=128 > 64; stride = int(64*2/3) = 42
    # (HRNet floor semantics)
    stride = int(64 * 2 / 3)
    cols = 1 + -(-(128 - 64) // stride)  # 3
    pw = stride * (cols - 1) + 64
    xp = np.zeros((1, 64, pw, 3), np.float32)
    xp[:, :, :128] = x
    acc = np.zeros((1, 64, pw, 19), np.float64)
    cnt = np.zeros((1, 64, pw, 1), np.float64)
    for q in range(cols):
        q0 = q * stride
        acc[:, :, q0 : q0 + 64] += np.asarray(
            plain(jnp.asarray(xp[:, :, q0 : q0 + 64]))
        )
        cnt[:, :, q0 : q0 + 64] += 1.0
    want = (acc / cnt)[:, :, :128]

    got = np.asarray(
        engine.make_ms_flip_inference(cfg, spec, params, state)(jnp.asarray(x))
    )
    _assert_probs_match(got, want)


def _hrnet_multi_scale_oracle(
    window_logits, x, *, scales, crop_hw, base, flip, num_classes
):
    """Independent numpy transcription of the HRNet-Semantic-Segmentation
    `multi_scale_inference` protocol (the upstream implementation the
    reference's dead TEST.MULTI_SCALE/FLIP_TEST flags once toggled —
    reference configs/default.py:84-85): per scale, aspect-preserving
    long-side resize to int(base*s+0.5); whole-(padded-)image inference
    when it fits the crop, else a sliding grid with stride
    int(crop*2/3) (numpy int() truncation) and count-averaged overlaps;
    per-window flip averaging of un-exp'd CROP-RESOLUTION logits; exp'd
    per-scale maps resized to the input size and summed.

    `window_logits(win) -> (N, ch, cw, C)` full-resolution logits for one
    crop-size window — the only model access; every piece of TTA
    accounting here is written from the protocol, not from engine.py."""
    crop_h, crop_w = crop_hw
    n, ori_h, ori_w = x.shape[0], x.shape[1], x.shape[2]
    stride_h, stride_w = max(1, int(crop_h * 2 / 3)), max(1, int(crop_w * 2 / 3))

    def win_probs(win):
        z = np.asarray(window_logits(win), np.float64)
        if flip:
            zf = np.asarray(window_logits(win[:, :, ::-1]), np.float64)
            z = 0.5 * (z + zf[:, :, ::-1])
        return np.exp(z)

    final = np.zeros((n, ori_h, ori_w, num_classes), np.float64)
    for s in scales:
        if ori_h > ori_w:
            nh = int(base * s + 0.5)
            nw = max(1, int(ori_w * nh / ori_h + 0.5))
        else:
            nw = int(base * s + 0.5)
            nh = max(1, int(ori_h * nw / ori_w + 0.5))
        xs = (
            x
            if (nh, nw) == (ori_h, ori_w)
            else np.asarray(resize_bilinear(jnp.asarray(x), (nh, nw), False))
        )
        if nh <= crop_h and nw <= crop_w:
            xp = np.zeros((n, crop_h, crop_w, 3), np.float32)
            xp[:, :nh, :nw] = xs
            p = win_probs(xp)[:, :nh, :nw]
        else:
            rows = 1 + int(np.ceil((nh - crop_h) / stride_h))
            cols = 1 + int(np.ceil((nw - crop_w) / stride_w))
            ph = stride_h * (rows - 1) + crop_h
            pw = stride_w * (cols - 1) + crop_w
            xp = np.zeros((n, ph, pw, 3), np.float32)
            xp[:, :nh, :nw] = xs
            acc = np.zeros((n, ph, pw, num_classes), np.float64)
            cnt = np.zeros((1, ph, pw, 1), np.float64)
            for r in range(rows):
                for q in range(cols):
                    r0, q0 = r * stride_h, q * stride_w
                    acc[:, r0 : r0 + crop_h, q0 : q0 + crop_w] += win_probs(
                        xp[:, r0 : r0 + crop_h, q0 : q0 + crop_w]
                    )
                    cnt[:, r0 : r0 + crop_h, q0 : q0 + crop_w] += 1.0
            p = (acc / cnt)[:, :nh, :nw]
        if (nh, nw) != (ori_h, ori_w):
            p = np.asarray(
                resize_bilinear(jnp.asarray(p, jnp.float32), (ori_h, ori_w), False),
                np.float64,
            )
        final = final + p
    return final


def test_hrnet_protocol_oracle(rng, net):
    """The batched engine TTA (stacked window/flip model batches,
    1/8-resolution flip averaging, one batched upsample) matches an
    independent serial numpy transcription of the HRNet protocol — full
    multi-scale sweep with a window grid, flip, and a non-fitting scale."""
    spec, params, state = net
    scales = (0.5, 1.0, 1.5)
    cfg = _cfg((64, 64), 128, flip=True, ms=True, scales=scales)

    x = rng.standard_normal((1, 64, 128, 3)).astype(np.float32)

    def window_logits(win):
        out = M.apply(params, state, jnp.asarray(np.ascontiguousarray(win)), spec,
                      train=False)[1]
        return resize_bilinear(out, (win.shape[1], win.shape[2]),
                               cfg.MODEL.ALIGN_CORNERS)

    want = _hrnet_multi_scale_oracle(
        window_logits, x, scales=scales, crop_hw=(64, 64), base=128, flip=True,
        num_classes=19,
    )
    got = np.asarray(
        engine.make_ms_flip_inference(cfg, spec, params, state)(jnp.asarray(x))
    )
    _assert_probs_match(got, want, tol=0.02)
