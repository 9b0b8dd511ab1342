"""Camera paths + ray generation invariants."""

import numpy as np
import pytest

from avatarcraft_tpu.cameras import (
    camera_rays,
    canonical_camera,
    dataset_rays,
    default_360_path,
    describe_view,
    pose_spherical,
    style_360_path,
)
from avatarcraft_tpu.constants import CANONICAL_ZOOM_FACTOR


def test_pose_spherical_distance_and_lookat():
    for theta in [0.0, 45.0, -120.0]:
        c2w = pose_spherical(theta, 0.0, 1.8)
        center = c2w[:3, 3]
        np.testing.assert_allclose(np.linalg.norm(center), 1.8, rtol=1e-6)
        # camera +z (forward under capture convention) points at the origin
        fwd = c2w[:3, 2]
        to_origin = -center / np.linalg.norm(center)
        np.testing.assert_allclose(fwd, to_origin, atol=1e-6)


def test_default_360_path_orbits_center():
    center = np.array([0.1, 0.2, 0.3])
    up = np.array([0.0, 1.0, 0.0])
    poses, desc = default_360_path(center, up, 1.44, res=8)
    assert poses.shape == (8, 4, 4)
    assert len(desc) == 8
    dists = np.linalg.norm(poses[:, :3, 3] - center, axis=1)
    np.testing.assert_allclose(dists, 1.44, rtol=1e-5)
    # orbit plane normal == up: camera centers have constant projection on up
    proj = (poses[:, :3, 3] - center) @ up
    np.testing.assert_allclose(proj, proj[0], atol=1e-6)


def test_style_360_path_head_boxes():
    rng = np.random.default_rng(0)
    poses, desc = style_360_path(
        np.zeros(3), np.array([0.0, 1.0, 0.0]), 1.8, res=40,
        add_noise=True, noise_scale=2.0, style_head=True,
        head_offset=0.42, head_rate=0.5, head_dist=0.45, rng=rng,
    )
    assert poses.shape[0] == 40 + 20
    assert sum("face" in d for d in desc) == 20
    # head cameras orbit the offset center at roughly head_dist (noise <= 0.2)
    head_centers = poses[40:, :3, 3]
    d = np.linalg.norm(head_centers - np.array([0, 0.42, 0]), axis=1)
    assert (d <= 0.45 + 1e-5).all() and (d >= 0.45 - 0.21).all()


def test_describe_view_bins():
    assert describe_view([180])[0].startswith("front")
    assert describe_view([0])[0].startswith("back")
    assert describe_view([90])[0].startswith("side")


def test_camera_rays_center_pixel_is_forward():
    cam = canonical_camera(64, 64)
    assert cam.fx == pytest.approx(CANONICAL_ZOOM_FACTOR * 64)
    c2w = pose_spherical(30.0, 0.0, 1.8)
    rays_o, rays_d = camera_rays(cam, c2w)
    assert rays_o.shape == (64 * 64, 3)
    d = np.asarray(rays_d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, rtol=1e-5)
    # the pixel at (cx, cy) = (32, 32) -> row 32*64+32 looks along +z of c2w
    center_ray = d[32 * 64 + 32]
    np.testing.assert_allclose(center_ray, c2w[:3, 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rays_o)[0], c2w[:3, 3], atol=1e-6)


def test_dataset_rays_opengl_convention():
    K = np.array([[444.0, 0, 32.0], [0, 444.0, 32.0], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    rays_o, rays_d = dataset_rays(pose, K, 64, 64)
    d = np.asarray(rays_d).reshape(64, 64, 3)
    # center pixel looks along -z
    np.testing.assert_allclose(d[32, 32], [0, 0, -1], atol=1e-5)
    # pixel right of center has +x component; pixel below center has -y (flipped)
    assert d[32, 48, 0] > 0
    assert d[48, 32, 1] < 0


def test_camera_rays_stride():
    cam = canonical_camera(32, 32)
    c2w = pose_spherical(0.0, 0.0, 1.8)
    o, d = camera_rays(cam, c2w, stride=4)
    assert o.shape == (64, 3)
