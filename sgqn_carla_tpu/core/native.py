"""ctypes bindings for the native host-IO library (native/hostio.cpp).

Auto-builds `native/libhostio.so` with g++ on first use; every entry point
has a pure-python fallback so the framework works without a toolchain.
Replaces the reference's reliance on cv2/PIL/imageio/DataLoader-worker
native code (SURVEY §2.3 row "cv2 / ffmpeg, PIL, pygame, Qt").
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhostio.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.png_encode_batch.restype = ctypes.c_int
        lib.png_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p]
        lib.resize_bilinear_u8.restype = None
        lib.resize_bilinear_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.synth_pool_u8.restype = None
        lib.synth_pool_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint32]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def png_write_batch(frames: np.ndarray, paths) -> bool:
    """Write (N, H, W, 3) uint8 frames to PNG files in parallel. Returns
    False if the native library is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return False
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, c = frames.shape
    assert c == 3
    blob = b"".join(p.encode() + b"\x00" for p in paths)
    rc = lib.png_encode_batch(frames.ctypes.data, n, w, h, blob)
    return rc == 0


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """(H, W, C) uint8 bilinear resize (PIL.Image.resize stand-in)."""
    lib = _load()
    sh, sw, c = img.shape
    if lib is None:
        yi = (np.arange(dh) * sh // dh).clip(0, sh - 1)
        xi = (np.arange(dw) * sw // dw).clip(0, sw - 1)
        return img[yi][:, xi]
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((dh, dw, c), np.uint8)
    lib.resize_bilinear_u8(img.ctypes.data, sh, sw, c, out.ctypes.data, dh, dw)
    return out


def synth_pool(n: int, h: int, w: int, seed: int = 0):
    """Procedural overlay pool (N, H, W, 3) uint8, multithreaded C++;
    returns None if unavailable (caller falls back to numpy synthesis)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((n, h, w, 3), np.uint8)
    lib.synth_pool_u8(out.ctypes.data, n, h, w, seed & 0xFFFFFFFF)
    return out
