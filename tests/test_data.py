"""Data-pipeline goldens: edge GT, label remap, datasets, loader."""

import os

import cv2
import numpy as np
import pytest
from PIL import Image

from pidnet_tpu.data import CamVid, Cityscapes, Loader, build_dataset
from pidnet_tpu.data.camvid import COLOR_LIST
from pidnet_tpu.data.cityscapes import LABEL_MAPPING
from pidnet_tpu.data.transforms import gen_edge_gt, gen_sample, input_transform


def _synthetic_label(rng, h=128, w=160, n=19):
    # blocky label image so Canny finds real edges
    lab = np.zeros((h, w), np.uint8)
    for _ in range(6):
        y, x = rng.integers(0, h - 16), rng.integers(0, w - 16)
        lab[y : y + 16, x : x + 16] = rng.integers(0, n)
    return lab


def test_edge_gt_formula(rng):
    """Matches reference base_dataset.py:109-114 exactly."""
    label = _synthetic_label(rng)
    for edge_pad in (True, False):
        got = gen_edge_gt(label, edge_size=4, edge_pad=edge_pad)
        edge = cv2.Canny(label, 0.1, 0.2)
        if edge_pad:
            edge = edge[6:-6, 6:-6]
            edge = np.pad(edge, ((6, 6), (6, 6)), mode="constant")
        want = (cv2.dilate(edge, np.ones((4, 4), np.uint8), iterations=1) > 50) * 1.0
        np.testing.assert_array_equal(got, want)
        assert got.sum() > 0  # non-trivial boundaries exist


def test_cityscapes_lut_matches_mask_loop(rng):
    raw = rng.integers(0, 34, (64, 64)).astype(np.uint8)
    ds = Cityscapes.__new__(Cityscapes)
    ds.ignore_label = 255
    from pidnet_tpu.data.cityscapes import _build_luts

    ds._fwd_lut, ds._inv_lut = _build_luts(255)

    # oracle: reference-style mask loop (cityscapes.py:84-92)
    want = raw.copy()
    tmp = raw.copy()
    for k, v in LABEL_MAPPING.items():
        want[tmp == k] = v
    got = ds.convert_label(raw)
    np.testing.assert_array_equal(got, want)

    # inverse round trip on train ids
    train = rng.integers(0, 19, (32, 32)).astype(np.uint8)
    back = ds.convert_label(ds.convert_label(train, inverse=True))
    np.testing.assert_array_equal(back, train)


def test_gen_sample_shapes_and_determinism(rng):
    img = rng.integers(0, 255, (256, 320, 3)).astype(np.uint8)
    lab = _synthetic_label(rng, 256, 320)
    kw = dict(
        multi_scale=True, is_flip=True, base_size=320, crop_size=(128, 160),
        scale_factor=16, ignore_label=255,
    )
    a = gen_sample(np.random.default_rng(7), img, lab, **kw)
    b = gen_sample(np.random.default_rng(7), img, lab, **kw)
    c = gen_sample(np.random.default_rng(8), img, lab, **kw)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert a[0].shape == (128, 160, 3) and a[0].dtype == np.float32
    assert a[1].shape == (128, 160) and a[1].dtype == np.uint8
    assert a[2].shape == (128, 160) and a[2].dtype == np.float32
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))  # seed matters


@pytest.fixture
def city_dir(tmp_path, rng):
    root = tmp_path / "data"
    (root / "cityscapes" / "img").mkdir(parents=True)
    (root / "cityscapes" / "gt").mkdir(parents=True)
    (root / "list" / "cityscapes").mkdir(parents=True)
    lines = []
    for i in range(5):
        img = rng.integers(0, 255, (128, 256, 3)).astype(np.uint8)
        raw = rng.integers(0, 34, (128, 256)).astype(np.uint8)
        cv2.imwrite(str(root / "cityscapes" / "img" / f"{i}.png"), img)
        cv2.imwrite(str(root / "cityscapes" / "gt" / f"{i}.png"), raw)
        lines.append(f"img/{i}.png\tgt/{i}.png")
    (root / "list" / "cityscapes" / "train.lst").write_text("\n".join(lines))
    (root / "list" / "cityscapes" / "test.lst").write_text(
        "\n".join(f"img/{i}.png" for i in range(5))
    )
    return str(root) + os.sep


def test_cityscapes_dataset(city_dir):
    ds = build_dataset(
        "cityscapes",
        root=city_dir,
        list_path="list/cityscapes/train.lst",
        base_size=256,
        crop_size=(96, 192),
    )
    assert len(ds) == 5
    img, lab, edge, size, name = ds[0]
    assert img.shape == (96, 192, 3)
    assert lab.shape == (96, 192)
    assert set(np.unique(lab)) <= set(range(19)) | {255}
    assert edge.shape == (96, 192)
    assert name == "0"
    assert (ds.class_weights is not None) and ds.class_weights.shape == (19,)


def test_cityscapes_test_split(city_dir):
    ds = Cityscapes(
        root=city_dir, list_path="list/cityscapes/test.lst",
        multi_scale=False, flip=False, base_size=256, crop_size=(128, 256),
    )
    img, size, name = ds[1]
    assert img.shape == (128, 256, 3) and img.dtype == np.float32
    assert name == "1"


def test_loader_batching(city_dir):
    ds = Cityscapes(
        root=city_dir, list_path="list/cityscapes/train.lst",
        base_size=256, crop_size=(96, 192),
    )
    loader = Loader(ds, batch_size=2, shuffle=True, drop_last=True, num_workers=2)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    imgs, labels, edges, sizes, names = batches[0]
    assert imgs.shape == (2, 96, 192, 3) and imgs.dtype == np.float32
    assert labels.shape == (2, 96, 192) and labels.dtype == np.int32
    assert edges.shape == (2, 96, 192) and edges.dtype == np.float32
    assert len(names) == 2


def test_loader_determinism_across_threads(city_dir):
    """Augmentations are per-(seed, epoch, index): identical across loader
    instances and thread schedules, different across epochs."""

    def batches(workers):
        ds = Cityscapes(
            root=city_dir, list_path="list/cityscapes/train.lst",
            base_size=256, crop_size=(96, 192), seed=11,
        )
        loader = Loader(ds, batch_size=2, shuffle=True, drop_last=True,
                        num_workers=workers, seed=11)
        return [list(loader) for _ in range(2)]  # two epochs

    a = batches(workers=1)
    b = batches(workers=4)
    for ep_a, ep_b in zip(a, b):
        for (ia, la, ea, _, na), (ib, lb, eb, _, nb) in zip(ep_a, ep_b):
            assert na == nb
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(la, lb)
            np.testing.assert_array_equal(ea, eb)
    # epoch 1 vs epoch 2 must differ (different augmentation stream)
    assert any(
        not np.array_equal(x[0], y[0]) for x, y in zip(a[0], a[1])
    )


class _TinyDataset:
    """Minimal in-memory dataset for loader failure-semantics tests."""

    def __init__(self, n=8, raise_at=None, sleep_at=None):
        self.n = n
        self.raise_at = raise_at
        self.sleep_at = sleep_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.raise_at is not None and i == self.raise_at:
            raise ValueError(f"corrupt sample {i}")
        if self.sleep_at is not None and i == self.sleep_at:
            import time

            time.sleep(0.05)
        img = np.full((4, 4, 3), i, np.float32)
        lab = np.full((4, 4), i, np.uint8)
        edge = np.zeros((4, 4), np.float32)
        return img, lab, edge, np.array([4, 4]), str(i)


def test_loader_propagates_worker_exception():
    """A raising __getitem__ fails the epoch loudly instead of hanging
    (torch DataLoader semantics, reference tools/train.py:96-102)."""
    loader = Loader(_TinyDataset(raise_at=5), batch_size=2, num_workers=2)
    with pytest.raises(ValueError, match="corrupt sample 5"):
        for _ in loader:
            pass


def test_loader_first_batch_exception():
    loader = Loader(_TinyDataset(raise_at=0), batch_size=2, num_workers=1)
    with pytest.raises(ValueError, match="corrupt sample 0"):
        next(iter(loader))


def test_loader_early_break_stops_producer():
    """Abandoning iteration must not leak the producer thread (it would
    otherwise block forever on a full prefetch queue)."""
    loader = Loader(_TinyDataset(n=64), batch_size=2, num_workers=2, prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # trigger the generator's finally (as `break` does via GC)
    loader._producer.join(timeout=10.0)
    assert not loader._producer.is_alive()


def test_loader_completes_after_failure_run():
    """The loader object stays reusable after a failed epoch."""
    ds = _TinyDataset(n=6)
    loader = Loader(ds, batch_size=2, num_workers=2)
    ds.raise_at = 3
    with pytest.raises(ValueError):
        list(loader)
    ds.raise_at = None
    batches = list(loader)
    assert len(batches) == 3


def test_camvid_color_mapping(tmp_path, rng):
    root = tmp_path / "data"
    (root / "camvid" / "img").mkdir(parents=True)
    (root / "camvid" / "lab").mkdir(parents=True)
    (root / "list" / "camvid").mkdir(parents=True)
    ids = rng.integers(0, 11, (96, 128)).astype(np.uint8)
    palette = np.array(COLOR_LIST, np.uint8)
    color = palette[ids]
    Image.fromarray(color).save(root / "camvid" / "lab" / "0.png")
    img = rng.integers(0, 255, (96, 128, 3)).astype(np.uint8)
    Image.fromarray(img).save(root / "camvid" / "img" / "0.png")
    (root / "list" / "camvid" / "trainval.lst").write_text("img/0.png\tlab/0.png")

    ds = CamVid(
        root=str(root) + os.sep, list_path="list/camvid/trainval.lst",
        multi_scale=False, flip=False, base_size=128, crop_size=(96, 128),
    )
    np.testing.assert_array_equal(ds.color2label(color), ids)
    np.testing.assert_array_equal(ds.label2color(ids), color)
    img_s, lab_s, edge_s, _, _ = ds[0]
    np.testing.assert_array_equal(lab_s, ids)  # no aug => labels intact
    # CamVid normalizes without BGR flip (camvid.py:83-93)
    want = input_transform(img, bgr_to_rgb=False)
    np.testing.assert_allclose(img_s, want, atol=1e-6)


def test_cache_matches_uncached(city_dir):
    """DATASET.CACHE memoizes only the deterministic prefix (decode +
    edge GT): every sample must be bit-identical to the uncached pipeline
    across epochs, and repeated epochs must not mutate cached arrays."""
    kw = dict(
        root=city_dir, list_path="list/cityscapes/train.lst",
        base_size=256, crop_size=(96, 192), seed=7,
    )
    plain = Cityscapes(**kw)
    cached = Cityscapes(cache=True, **kw)
    for epoch in (1, 2):
        plain.set_epoch(epoch)
        cached.set_epoch(epoch)
        for i in range(len(plain)):
            for _ in range(2):  # second read exercises the cache hit
                a = cached[i]
                b = plain[i]
                for x, y in zip(a[:3], b[:3]):
                    np.testing.assert_array_equal(x, y)
    assert len(cached._cache) == len(plain)


def test_cache_byte_budget_is_honored(city_dir):
    """DATASET.CACHE_GB: the LRU never exceeds its byte budget (OOM is
    impossible by construction), evicts least-recently-used, and evicted
    entries still produce bit-identical samples on re-decode."""
    kw = dict(
        root=city_dir, list_path="list/cityscapes/train.lst",
        base_size=256, crop_size=(96, 192), seed=7,
    )
    plain = Cityscapes(**kw)
    # budget ~ one sample (measured from a probe dataset's first entry):
    # forces eviction traffic on a len>1 dataset
    probe = Cityscapes(cache=True, cache_gb=64.0, **kw)
    probe.set_epoch(1)
    _ = probe[0]
    entry_bytes = probe._cache.bytes
    assert entry_bytes > 0

    budget = entry_bytes + entry_bytes // 2  # fits 1, not 2
    cached = Cityscapes(cache=True, cache_gb=budget / 2**30, **kw)
    cached.set_epoch(1)
    plain.set_epoch(1)
    assert len(plain) >= 2
    for epoch in (1, 2):
        cached.set_epoch(epoch)
        plain.set_epoch(epoch)
        for i in range(len(plain)):
            a, b = cached[i], plain[i]
            for x, y in zip(a[:3], b[:3]):
                np.testing.assert_array_equal(x, y)
            assert cached._cache.bytes <= budget
    assert len(cached._cache) == 1  # evictions happened, cap held
    assert cached._cache.misses > len(plain)  # re-decodes after eviction
    assert "hit rate" in cached._cache.stats()

    # a zero-budget cache stores nothing but stays correct
    none = Cityscapes(cache=True, cache_gb=0.0, **kw)
    none.set_epoch(1)
    plain.set_epoch(1)
    a, b = none[1], plain[1]
    for x, y in zip(a[:3], b[:3]):
        np.testing.assert_array_equal(x, y)
    assert len(none._cache) == 0
