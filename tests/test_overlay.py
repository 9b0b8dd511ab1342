"""Phong mesh-overlay debug renderer (reference: utils/render_utils.py:914-951)."""

import numpy as np

from avatarcraft_tpu.utils.overlay import (
    overlay_mesh,
    phong_render_mesh,
    rasterize_mesh,
)

# a unit quad (two triangles) facing the camera at z = -2
QUAD_V = np.array(
    [[-0.5, -0.5, -2.0], [0.5, -0.5, -2.0], [0.5, 0.5, -2.0], [-0.5, 0.5, -2.0]]
)
QUAD_F = np.array([[0, 1, 2], [0, 2, 3]])
K = np.array([[64.0, 0, 32.0], [0, 64.0, 32.0], [0, 0, 1.0]])
C2W = np.eye(4)  # camera at origin, looking down -Z (OpenGL)
H = W = 64


def test_rasterize_quad_coverage_and_depth():
    fid, bary, depth = rasterize_mesh(QUAD_V, QUAD_F, C2W, K, H, W)
    hit = fid >= 0
    # the quad spans 1 unit at distance 2 with focal 64 -> 32px square
    assert 30 * 30 < hit.sum() < 34 * 34
    assert np.allclose(depth[hit], 2.0, atol=1e-4)
    assert fid[32, 32] >= 0  # center covered
    assert fid[2, 2] == -1  # corner empty
    b = bary[hit]
    assert np.allclose(b.sum(-1), 1.0, atol=1e-5)


def test_zbuffer_nearest_wins():
    # second quad closer to the camera, half-offset
    v2 = QUAD_V.copy()
    v2[:, 2] = -1.0
    v2[:, :2] *= 0.5
    verts = np.concatenate([QUAD_V, v2])
    faces = np.concatenate([QUAD_F, QUAD_F + 4])
    fid, _, depth = rasterize_mesh(verts, faces, C2W, K, H, W)
    # center pixel must come from the near quad
    assert fid[32, 32] >= 2
    assert abs(depth[32, 32] - 1.0) < 1e-4


def test_phong_shading_properties():
    rgba = phong_render_mesh(QUAD_V, QUAD_F, C2W, K, H, W)
    hit = rgba[..., 3] > 0
    assert hit.any()
    vals = rgba[hit][:, :3]
    assert (vals > 0.05).all() and (vals <= 1.0).all()
    # light at (2,2,-2): pixels nearer the light (top-right) are brighter
    top_right = rgba[8:24, 40:56, 0][rgba[8:24, 40:56, 3] > 0]
    bottom_left = rgba[40:56, 8:24, 0][rgba[40:56, 8:24, 3] > 0]
    assert top_right.mean() > bottom_left.mean()


def test_overlay_composites_only_silhouette():
    img = np.full((H, W, 3), 10, np.uint8)
    out = overlay_mesh(img, QUAD_V, QUAD_F, C2W, K)
    fid, _, _ = rasterize_mesh(QUAD_V, QUAD_F, C2W, K, H, W)
    hit = fid >= 0
    assert (out[~hit] == 10).all()
    assert (out[hit] != 10).any()
    assert out.dtype == np.uint8


def test_overlay_smpl_mesh_smoke():
    """Full-size SMPL-like mesh (6890 verts) rasterizes in reasonable time."""
    rng = np.random.default_rng(0)
    # a crude 'body': a cylinder point cloud triangulated as a strip
    n = 512
    theta = np.linspace(0, 2 * np.pi, 32, endpoint=False)
    zs = np.linspace(-0.8, 0.8, 16)
    tt, zz = np.meshgrid(theta, zs)
    verts = np.stack(
        [0.3 * np.cos(tt).ravel(), zz.ravel(), 0.3 * np.sin(tt).ravel() - 2.0], -1
    )
    faces = []
    for i in range(15):
        for j in range(32):
            a = i * 32 + j
            b = i * 32 + (j + 1) % 32
            faces += [[a, b, a + 32], [b, b + 32, a + 32]]
    faces = np.asarray(faces)
    rgba = phong_render_mesh(verts, faces, C2W, K, H, W)
    assert rgba[..., 3].sum() > 100
