"""Small parity helpers (reference: utils/utils.py, utils/debug_utils.py)."""

from __future__ import annotations

import functools
import os
import pickle
import time

import numpy as np


def fix_randomness(seed: int = 42) -> np.random.Generator:
    """Determinism hook (reference: utils/utils.py:48-68). JAX randomness is
    already explicit via keys; this seeds python/numpy for host-side schedule
    decisions and returns a Generator to thread through."""
    import random

    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)


def smpl_verts_to_center_and_up(verts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Scene center + up axis from the SMPL spine by SVD
    (reference: utils/utils.py:327-346): the dominant direction of the torso
    point cloud is the body's up vector."""
    verts = np.asarray(verts)
    center = verts.mean(axis=0)
    centered = verts - center
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    up = vt[0]
    if up[1] < 0:  # canonical humans stand +y
        up = -up
    return center.astype(np.float32), (up / np.linalg.norm(up)).astype(np.float32)


def print_notification(content, title: str = "NOTIFICATION") -> None:
    """(reference: utils/utils.py:32-41)."""
    if isinstance(content, str):
        content = [content]
    print("-" * 60)
    print(f"[{title}]")
    for line in content:
        print(line)
    print("-" * 60)


def dump_tensor(obj, path: str) -> None:
    """Pickle dump for debugging (reference: utils/debug_utils.py:34-41)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        pickle.dump(np.asarray(obj) if hasattr(obj, "shape") else obj, fh)


def log_exec(fn):
    """Timing decorator (reference: utils/debug_utils.py:53-58)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        print(f"[log_exec] {fn.__qualname__}: {time.perf_counter() - t0:.3f}s")
        return out

    return wrapper
