"""Native host-kernel parity vs numpy reference semantics."""

import numpy as np
import pytest

from pidnet_tpu.data import native


def test_normalize_matches_numpy(rng):
    img = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    for bgr in (True, False):
        got = native.normalize_u8_f32(img, mean, std, bgr_to_rgb=bgr)
        x = img.astype(np.float32)
        if bgr:
            x = x[:, :, ::-1]
        want = ((x / 255.0 - mean) / std).astype(np.float32)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_normalize_odd_pixel_count(rng):
    img = rng.integers(0, 255, (3, 9, 3)).astype(np.uint8)  # 27 pixels (odd)
    mean = np.array([0.5, 0.5, 0.5], np.float32)
    std = np.array([0.25, 0.25, 0.25], np.float32)
    got = native.normalize_u8_f32(img, mean, std, bgr_to_rgb=True)
    want = ((img.astype(np.float32)[:, :, ::-1] / 255.0 - mean) / std).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_lut_remap(rng):
    lab = rng.integers(0, 256, (33, 47)).astype(np.uint8)
    lut = rng.integers(0, 256, 256).astype(np.uint8)
    np.testing.assert_array_equal(native.lut_remap_u8(lab, lut), lut[lab])


def test_hflip_matches_numpy(rng):
    img = rng.standard_normal((33, 47, 3)).astype(np.float32)
    np.testing.assert_array_equal(native.hflip_f32(img), img[:, ::-1])
    edge = rng.standard_normal((33, 47)).astype(np.float32)
    np.testing.assert_array_equal(native.hflip_f32(edge), edge[:, ::-1])


@pytest.mark.skipif(not native.available(), reason="libpidnet_host.so not built")
def test_native_lib_loaded():
    assert native.available()
