"""ctypes bindings for the native host-pipeline kernels (native/).

The .so is NOT checked in (platform-specific binaries are unreviewable):
it is built on first import via `make -C native` when a toolchain is
available, and every entry point falls back to numpy transparently when
it isn't. All entry points match the numpy semantics used in
transforms.py / cityscapes.py exactly (tested in tests/test_native.py).
Set PIDNET_NO_NATIVE_BUILD=1 to skip the build attempt.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libpidnet_host.so")
_NATIVE_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), os.pardir, os.pardir, "native")
)


def _try_build() -> None:
    if os.environ.get("PIDNET_NO_NATIVE_BUILD"):
        return
    if not os.path.isfile(os.path.join(_NATIVE_DIR, "Makefile")):
        return
    try:
        # Skip the subprocess entirely when the .so is already newer than
        # every native source — the common case after the first build —
        # so imports don't pay a make spawn per process.
        if os.path.isfile(_LIB_PATH):
            lib_mtime = os.path.getmtime(_LIB_PATH)
            srcs = [
                os.path.join(_NATIVE_DIR, f)
                for f in os.listdir(_NATIVE_DIR)
                if f.endswith((".cpp", ".h")) or f == "Makefile"
            ]
            if srcs and all(os.path.getmtime(s) <= lib_mtime for s in srcs):
                return
        # Serialize concurrent builds (multi-process training, parallel
        # test subprocesses) with an exclusive file lock; the Makefile
        # additionally links to a temp name and mv's it into place, so a
        # process that skipped the lock path can never dlopen a
        # half-written .so.
        import fcntl

        lock_path = os.path.join(_NATIVE_DIR, ".build.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                capture_output=True,
                timeout=120,
                check=False,
            )
    except Exception:
        pass


_lib = None
# rebuild when any native/ source is newer than the .so (mtime check, no
# subprocess in the common up-to-date case) so the binary stays coherent
# with edited sources instead of silently loading a stale kernel
_try_build()
if os.path.isfile(_LIB_PATH):
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.normalize_u8_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib.lut_remap_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        _lib.hflip_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
        ]
    except OSError:
        _lib = None


def available() -> bool:
    return _lib is not None


def normalize_u8_f32(
    image: np.ndarray, mean: np.ndarray, std: np.ndarray, *, bgr_to_rgb: bool
) -> np.ndarray:
    """u8 HWC -> f32 HWC, fused (BGR flip, /255, -mean, /std) in one pass."""
    assert image.dtype == np.uint8 and image.ndim == 3 and image.shape[2] == 3
    image = np.ascontiguousarray(image)
    out = np.empty(image.shape, np.float32)
    if _lib is not None:
        m = np.ascontiguousarray(mean, np.float32)
        s = np.ascontiguousarray(std, np.float32)
        _lib.normalize_u8_f32(
            image.ctypes.data, out.ctypes.data, image.shape[0] * image.shape[1],
            int(bgr_to_rgb), m.ctypes.data, s.ctypes.data,
        )
        return out
    x = image.astype(np.float32)
    if bgr_to_rgb:
        x = x[:, :, ::-1]
    return ((x / 255.0 - mean) / std).astype(np.float32)


def hflip_f32(image: np.ndarray) -> np.ndarray:
    """One-pass horizontal flip of an HWC (or HW) f32 array.

    Replaces `np.ascontiguousarray(image[:, ::-1])` in the flip branch of
    the train pipeline (reference base_dataset.py:127-131): numpy's strided
    reverse + contiguous copy is two passes; this is one."""
    assert image.dtype == np.float32 and image.ndim in (2, 3)
    image = np.ascontiguousarray(image)
    if _lib is not None:
        h, w = image.shape[:2]
        c = image.shape[2] if image.ndim == 3 else 1
        out = np.empty(image.shape, np.float32)
        _lib.hflip_f32(image.ctypes.data, out.ctypes.data, h, w, c)
        return out
    return np.ascontiguousarray(image[:, ::-1])


def lut_remap_u8(label: np.ndarray, lut: np.ndarray) -> np.ndarray:
    assert label.dtype == np.uint8 and lut.shape == (256,)
    label = np.ascontiguousarray(label)
    if _lib is not None:
        out = np.empty(label.shape, np.uint8)
        l = np.ascontiguousarray(lut, np.uint8)
        _lib.lut_remap_u8(label.ctypes.data, out.ctypes.data, label.size, l.ctypes.data)
        return out
    return lut[label]
