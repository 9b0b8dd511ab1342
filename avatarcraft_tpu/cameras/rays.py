"""Ray generation, jit-friendly.

Two camera conventions coexist in the reference and are both reproduced:

* **capture convention** -- +z forward, pixel dirs from K^-1 [x, y, 1]
  transformed by c2w (the pcd-projector path used by pose2cap/cap2rays,
  reference: utils/render_utils.py:323-376, geometry/pcd_projector.py:85-120).
* **dataset convention** -- OpenGL-style -z forward with flipped y
  (SMPLDataset.gen_rays_pose, reference: utils/SMPLDataset.py:86-103).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.cameras.camera import PinholeCamera
from avatarcraft_tpu.constants import CANONICAL_ZOOM_FACTOR


def canonical_camera(h: int, w: int) -> PinholeCamera:
    """The canonical render camera: f = CANONICAL_ZOOM_FACTOR * W
    (reference: utils/render_utils.py:323-337)."""
    return PinholeCamera(w, h, CANONICAL_ZOOM_FACTOR * w, CANONICAL_ZOOM_FACTOR * w, w / 2.0, h / 2.0)


def _pixel_grid(h: int, w: int):
    """Row-major (x, y) integer pixel coordinates, shape [h*w]."""
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    return xs.reshape(-1).astype(jnp.float32), ys.reshape(-1).astype(jnp.float32)


def camera_rays(cam: PinholeCamera, c2w, stride: int = 1):
    """Rays for every pixel under the capture convention.

    Mirrors cap2rays: pcd_2d_to_pcd_3d at depth 1 through K^-1, c2w transform,
    normalize(pt - center) (reference: utils/render_utils.py:363-376,
    utils/ray_utils.py:25-37).

    Returns (rays_o [h*w, 3], rays_d [h*w, 3]) as jnp arrays.
    """
    h, w = cam.height, cam.width
    xs, ys = _pixel_grid(h, w)
    if stride > 1:
        xs = xs.reshape(h, w)[::stride, ::stride].reshape(-1)
        ys = ys.reshape(h, w)[::stride, ::stride].reshape(-1)
    c2w = jnp.asarray(c2w, jnp.float32)
    # camera-space point at depth 1
    px = (xs - cam.cx) / cam.fx
    py = (ys - cam.cy) / cam.fy
    pts_cam = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)
    pts_world = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    center = c2w[:3, 3]
    dirs = pts_world - center
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(center, dirs.shape)
    return origins, dirs


def pose2rays(h: int, w: int, c2w) -> tuple[jnp.ndarray, jnp.ndarray]:
    """pose2cap + cap2rays fused: canonical camera at given pose."""
    return camera_rays(canonical_camera(h, w), c2w)


def dataset_rays(
    pose, K, h: int, w: int, resolution_level: int = 1, out_hw: tuple[int, int] | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SMPLDataset.gen_rays_pose convention (utils/SMPLDataset.py:86-103).

    Pixel grid sampled with linspace(0, W-1, W//l); dirs are
    normalize([(x-cx)/fx, -(y-cy)/fy, -1]) rotated by pose[:3,:3].
    ``out_hw`` overrides the sample-grid size explicitly.
    Returns (rays_o [hw, 3], rays_d [hw, 3]).
    """
    if out_hw is not None:
        lh, lw = out_hw
    else:
        lh, lw = int(h // resolution_level), int(w // resolution_level)
    tx = jnp.linspace(0.0, w - 1, lw)
    ty = jnp.linspace(0.0, h - 1, lh)
    px, py = jnp.meshgrid(tx, ty, indexing="xy")  # [lh, lw]
    K = jnp.asarray(K, jnp.float32)
    pose = jnp.asarray(pose, jnp.float32)
    p = jnp.stack(
        [
            (px - K[0, 2]) / K[0, 0],
            -(py - K[1, 2]) / K[1, 1],
            -jnp.ones_like(px),
        ],
        axis=-1,
    )
    v = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    rays_d = v @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


def sparse_ray_sampling(rays_o, rays_d, stride: int, rng: np.random.Generator):
    """Stride-subsample a [H, W, 3] ray grid from a random top-left offset
    (reference: utils/render_utils.py:989-1011)."""
    if stride == 1:
        return rays_o, rays_d
    x_off = int(rng.integers(0, stride))
    y_off = int(rng.integers(0, stride))
    return (
        rays_o[x_off::stride, y_off::stride],
        rays_d[x_off::stride, y_off::stride],
    )
