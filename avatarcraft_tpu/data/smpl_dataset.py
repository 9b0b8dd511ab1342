"""Blender-format multiview dataset of bare-SMPL renders.

Replaces the reference SMPLDataset (reference: utils/SMPLDataset.py:10-165):
loads transforms_train.json + PNGs, derives focal from camera_angle_x, keeps
images in host RAM as float32, and exposes jit-friendly per-view / per-batch
ray generation in the dataset (OpenGL) camera convention.

Note the reference flips every image horizontally on load
(``images[:, :, ::-1]`` reverses the W axis, utils/SMPLDataset.py:32) -- we
reproduce that so renders compare pixel-for-pixel.
"""

from __future__ import annotations

import json
import os

import numpy as np

from avatarcraft_tpu.cameras.rays import dataset_rays


class SMPLMultiviewDataset:
    def __init__(self, path: str):
        self.data_dir = path
        with open(os.path.join(path, "transforms_train.json")) as fp:
            meta = json.load(fp)

        import imageio.v2 as imageio

        images, poses = [], []
        for frame in meta["frames"]:
            fname = os.path.join(path, frame["file_path"] + ".png")
            images.append(imageio.imread(fname))
            poses.append(np.array(frame["transform_matrix"], np.float32))

        self.images = (np.array(images) / 255.0).astype(np.float32)
        self.images = self.images[:, :, ::-1].copy()  # horizontal flip, see module doc
        self.masks = (self.images != 0).any(axis=-1).astype(np.float32)
        self.poses = np.stack(poses)

        self.n_images = len(self.images)
        self.H, self.W = self.images.shape[1:3]
        camera_angle_x = float(meta["camera_angle_x"])
        self.focal = 0.5 * self.W / np.tan(0.5 * camera_angle_x)
        self.K = np.array(
            [
                [self.focal, 0, 0.5 * self.W],
                [0, self.focal, 0.5 * self.H],
                [0, 0, 1],
            ],
            np.float32,
        )

    # ------------------------------------------------------------------
    def gen_rays_pose(self, pose: np.ndarray, resolution_level: int = 1):
        """Rays for a full view at the given c2w pose. [hw,3] x2 (jnp)."""
        return dataset_rays(pose, self.K, self.H, self.W, resolution_level)

    def gen_rays_at(self, idx: int, resolution_level: int = 1):
        return self.gen_rays_pose(self.poses[idx], resolution_level)

    def all_pixels(self) -> tuple[np.ndarray, np.ndarray]:
        """(view_idx [M], pixel_idx [M]) covering every pixel of every view."""
        M = self.n_images * self.H * self.W
        view = np.repeat(np.arange(self.n_images, dtype=np.int32), self.H * self.W)
        pix = np.tile(np.arange(self.H * self.W, dtype=np.int32), self.n_images)
        assert view.shape[0] == M
        return view, pix

    def gather_rgb(self, view_idx: np.ndarray, pix_idx: np.ndarray) -> np.ndarray:
        """Host-side gather of ground-truth rgb for a ray batch. [M,3]."""
        flat = self.images.reshape(self.n_images, -1, 3)
        return flat[view_idx, pix_idx]

    def gather_mask(self, view_idx: np.ndarray, pix_idx: np.ndarray) -> np.ndarray:
        """Host-side gather of the subject mask for a ray batch. [M]."""
        flat = self.masks.reshape(self.n_images, -1)
        return flat[view_idx, pix_idx]

    def gen_random_rays_at(self, idx: int, batch_size: int, rng=None):
        """Random pixels of one view -> (rays_o, rays_d, rgb, mask)
        (reference: utils/SMPLDataset.py:128-147)."""
        rng = rng or np.random.default_rng()
        px = rng.integers(0, self.W, batch_size)
        py = rng.integers(0, self.H, batch_size)
        rgb = self.images[idx][py, px]
        mask = self.masks[idx][py, px]
        import jax.numpy as jnp

        K, pose = self.K, self.poses[idx]
        p = np.stack(
            [
                (px - K[0, 2]) / K[0, 0],
                -(py - K[1, 2]) / K[1, 1],
                -np.ones_like(px, np.float32),
            ],
            axis=-1,
        ).astype(np.float32)
        v = p / np.linalg.norm(p, axis=-1, keepdims=True)
        rays_d = v @ pose[:3, :3].T
        rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
        return (
            jnp.asarray(rays_o),
            jnp.asarray(rays_d),
            jnp.asarray(rgb),
            jnp.asarray(mask),
        )

    def gen_rays_silhouettes(self, pose, max_ray_num: int, mask: np.ndarray):
        """Rays restricted to a dilated subject silhouette
        (reference: utils/SMPLDataset.py:58-84). Returns
        (rays_o, rays_d, side, keep_mask) where side is the sampled square
        resolution."""
        from scipy import ndimage

        if mask.sum() == 0:
            ro, rd = self.gen_rays_pose(pose, resolution_level=4)
            side = self.H // 4
            return ro, rd, side, np.ones((side, side), bool)
        struct = ndimage.generate_binary_structure(2, 2)
        dilated = ndimage.binary_dilation(mask, structure=struct, iterations=10)
        ratio = dilated.sum() / float(mask.shape[0] * mask.shape[1])
        side = min(self.H, int(np.sqrt(max_ray_num / max(ratio, 1e-6))))
        ro, rd = dataset_rays(pose, self.K, self.H, self.W, out_hw=(side, side))
        # resize the dilated mask to the sampled square
        ys = (np.linspace(0, mask.shape[0] - 1, side)).astype(int)
        xs = (np.linspace(0, mask.shape[1] - 1, side)).astype(int)
        keep = dilated[np.ix_(ys, xs)] > 0
        flat = keep.reshape(-1)
        return ro[flat], rd[flat], side, keep

    def near_far_from_sphere(self, rays_o, rays_d):
        """Unit-sphere chord bounds (reference: utils/SMPLDataset.py:149-160)."""
        import jax.numpy as jnp

        a = jnp.sum(rays_d**2, axis=-1, keepdims=True)
        b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
        mid = 0.5 * (-b) / a
        near = jnp.maximum(mid - 1.0, 0.0)
        return near, mid + 1.0
