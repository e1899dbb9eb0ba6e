"""ctypes bindings for the native host-data library (native/ndiv_host.cc).

Host-side data plane in C++ (SURVEY.md §2 C9 host pipeline): batch scene
rasterisation and trajectory collision validation, multithreaded over the
batch.  The library auto-builds on first use (``make`` in native/); every
entry point has a NumPy fallback so the package works without a
toolchain, and parity with the on-device JAX implementations is tested in
tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libndivhost.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False

_F32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_U8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ndiv_rasterize_scenes.argtypes = [
                _F32, _F32, _F32, _F32, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, _F32, ctypes.c_int,
            ]
            lib.ndiv_rasterize_scenes.restype = None
            lib.ndiv_check_collisions.argtypes = [
                _F32, _F32, _F32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                _U8, ctypes.c_int,
            ]
            lib.ndiv_check_collisions.restype = None
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def _as_f32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.float32)


def rasterize_scenes_host(obstacles, obstacle_mask, starts, goals,
                          size: int = 32, n_threads: int = 0) -> np.ndarray:
    """Batch scene rasterisation on the host CPU.

    Args mirror the batched Scene pytree fields as NumPy arrays:
      obstacles ``[B, MAX_OBS, 3]``, obstacle_mask ``[B, MAX_OBS]``,
      starts/goals ``[B, 2]``.

    Returns ``[B, size, size, 3]`` float32 images with identical
    semantics to data/scenes.py::rasterize_scene.
    """
    obstacles = _as_f32(obstacles)
    mask = _as_f32(obstacle_mask)
    starts = _as_f32(starts)
    goals = _as_f32(goals)
    b, max_obs = mask.shape
    out = np.empty((b, size, size, 3), np.float32)
    lib = _load()
    if lib is not None:
        lib.ndiv_rasterize_scenes(obstacles, mask, starts, goals, b, max_obs,
                                  size, out, n_threads)
        return out
    # NumPy fallback (same math, vectorised).
    coords = (np.arange(size, dtype=np.float32) + 0.5) / size
    xs = coords[None, None, :, None]
    ys = coords[None, :, None, None]
    cx = obstacles[:, None, None, :, 0]
    cy = obstacles[:, None, None, :, 1]
    r = obstacles[:, None, None, :, 2]
    d2 = (xs - cx) ** 2 + (ys - cy) ** 2
    inside = (d2 < r * r) & (mask[:, None, None, :] > 0.5)
    occ = np.any(inside, axis=-1).astype(np.float32)
    sigma = 1.5 / size

    def blob(p):
        d2p = (xs[..., 0] - p[:, None, None, 0:1][..., 0]) ** 2 + (
            ys[..., 0] - p[:, None, None, 1:2][..., 0]) ** 2
        return np.exp(-d2p / (2.0 * sigma * sigma)).astype(np.float32)

    out[..., 0] = occ
    out[..., 1] = blob(starts)
    out[..., 2] = blob(goals)
    return out


def collision_mask_host(trajs, obstacles, obstacle_mask,
                        n_threads: int = 0) -> np.ndarray:
    """Waypoint-level collision check for recorded expert trajectories.

    trajs ``[B, H, 2]`` against per-example scenes; returns ``[B]`` uint8
    (1 = the polyline through the waypoints intersects a live obstacle
    disc — swept segment check, matching envs/pointmass.py).  Used to
    filter recorded datasets before host-pipeline training.
    """
    trajs = _as_f32(trajs)
    obstacles = _as_f32(obstacles)
    mask = _as_f32(obstacle_mask)
    b, h, _ = trajs.shape
    max_obs = mask.shape[1]
    out = np.empty((b,), np.uint8)
    lib = _load()
    if lib is not None:
        lib.ndiv_check_collisions(trajs, obstacles, mask, b, h, max_obs, out,
                                  n_threads)
        return out
    # NumPy fallback: segment (prev waypoint -> waypoint) vs disc.
    prev = np.concatenate([trajs[:, :1], trajs[:, :-1]], axis=1)  # [B, H, 2]
    a = prev[:, :, None, :]  # [B, H, 1, 2]
    d = (trajs - prev)[:, :, None, :]
    c = obstacles[:, None, :, :2]  # [B, 1, MAX_OBS, 2]
    len2 = np.sum(d * d, axis=-1)  # [B, H, 1]
    t = np.sum((c - a) * d, axis=-1) / np.maximum(len2, 1e-12)
    t = np.clip(t, 0.0, 1.0)[..., None]  # [B, H, MAX_OBS, 1]
    closest = a + t * d
    d2 = np.sum((c - closest) ** 2, axis=-1)
    inside = (d2 < obstacles[:, None, :, 2] ** 2) & (mask[:, None, :] > 0.5)
    return np.any(inside, axis=(1, 2)).astype(np.uint8)
