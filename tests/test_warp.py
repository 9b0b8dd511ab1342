"""Warp correctness: exact point-triangle queries, closest-face vs brute
force, identity/rigid round trips, geometry-guided near/far vs brute force."""

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.models.smpl import synthetic_smpl_params
from avatarcraft_tpu.warp import (
    WarpData,
    build_vertex_face_table,
    closest_point_on_triangles,
    geometry_guided_near_far,
    warp_samples_to_canonical,
)


def icosphere(subdiv=1):
    """Small test mesh: icosahedron (optionally subdivided)."""
    t = (1 + np.sqrt(5)) / 2
    v = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float32,
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int32,
    )
    for _ in range(subdiv):
        nv = list(v)
        cache = {}
        nf = []

        def mid(a, b):
            k = (min(a, b), max(a, b))
            if k not in cache:
                m = (v[a] + v[b]) / 2
                m = m / np.linalg.norm(m)
                cache[k] = len(nv)
                nv.append(m)
            return cache[k]

        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(nv, np.float32)
        f = np.asarray(nf, np.int32)
    return v, f


def brute_force_closest(p, verts, faces):
    """Reference point-mesh query: exact closest point over ALL faces."""
    tri = verts[faces]  # [F,3,3]
    c, _ = closest_point_on_triangles(
        jnp.asarray(p)[:, None, :],
        jnp.asarray(tri[:, 0])[None],
        jnp.asarray(tri[:, 1])[None],
        jnp.asarray(tri[:, 2])[None],
    )
    d2 = np.asarray(jnp.sum((c - jnp.asarray(p)[:, None, :]) ** 2, -1))
    return d2.min(axis=1), np.asarray(c)[np.arange(len(p)), d2.argmin(axis=1)]


def test_closest_point_regions(rng):
    """Closest point matches dense sampling of the triangle."""
    a, b, c = np.array([0.0, 0, 0]), np.array([1.0, 0, 0]), np.array([0.0, 1, 0])
    # dense barycentric sampling as ground truth
    us = np.linspace(0, 1, 200)
    grid = np.array([[u, v] for u in us for v in us if u + v <= 1])
    tri_pts = grid[:, :1] * b + grid[:, 1:] * c + (1 - grid.sum(1, keepdims=True)) * a

    ps = rng.normal(size=(50, 3)).astype(np.float32) * 1.5
    closest, bary = closest_point_on_triangles(
        jnp.asarray(ps), jnp.asarray(a)[None], jnp.asarray(b)[None], jnp.asarray(c)[None]
    )
    d_ours = np.linalg.norm(np.asarray(closest) - ps, axis=1)
    d_true = np.min(
        np.linalg.norm(ps[:, None, :] - tri_pts[None], axis=-1), axis=1
    )
    np.testing.assert_allclose(d_ours, d_true, atol=5e-3)
    # barycentric reproduces the closest point
    recon = np.asarray(bary) @ np.stack([a, b, c])
    np.testing.assert_allclose(recon, np.asarray(closest), atol=1e-6)


def test_knn_face_search_matches_brute_force(rng):
    verts, faces = icosphere(2)  # 162 verts, 320 faces
    n_joints = 4
    Ts = np.broadcast_to(np.eye(4, dtype=np.float32), (len(verts) + n_joints, 4, 4))
    data = WarpData.create(verts, faces, Ts)

    pts = rng.normal(size=(8, 16, 3)).astype(np.float32) * 1.2
    can_pts, can_dirs, closest, mask = warp_samples_to_canonical(
        jnp.asarray(pts), data, threshold=0.3, block=32
    )
    d2_bf, closest_bf = brute_force_closest(pts.reshape(-1, 3), verts, faces)
    np.testing.assert_allclose(
        np.asarray(closest).reshape(-1, 3), closest_bf, atol=2e-4
    )
    np.testing.assert_array_equal(
        np.asarray(mask).reshape(-1), d2_bf < 0.3
    )


def test_identity_transform_warp_is_identity(rng):
    verts, faces = icosphere(1)
    Ts = np.broadcast_to(np.eye(4, dtype=np.float32), (len(verts), 4, 4))
    data = WarpData.create(verts, faces, Ts)
    pts = rng.normal(size=(4, 8, 3)).astype(np.float32)
    can_pts, _, _, _ = warp_samples_to_canonical(jnp.asarray(pts), data, block=16)
    np.testing.assert_allclose(np.asarray(can_pts), pts, atol=1e-5)


def test_rigid_transform_roundtrip(rng):
    """Posing the mesh by a rigid T and warping posed points recovers
    canonical coordinates."""
    from scipy.spatial.transform import Rotation as R

    verts, faces = icosphere(2)
    Rm = R.from_rotvec([0.4, -0.3, 0.2]).as_matrix().astype(np.float32)
    t = np.array([0.3, 0.1, -0.2], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = Rm, t

    posed_verts = verts @ Rm.T + t
    Ts = np.broadcast_to(T, (len(verts), 4, 4)).copy()
    data = WarpData.create(posed_verts, faces, Ts)

    # canonical points near the surface -> posed points
    can = verts[rng.integers(0, len(verts), 24)] * 1.02
    posed = can @ Rm.T + t
    can_back, _, _, mask = warp_samples_to_canonical(
        jnp.asarray(posed.reshape(4, 6, 3)), data, threshold=0.3, block=8
    )
    np.testing.assert_allclose(
        np.asarray(can_back).reshape(-1, 3), can, atol=1e-4
    )
    assert np.asarray(mask).all()


def test_can_dirs_unit_norm(rng):
    verts, faces = icosphere(1)
    Ts = np.broadcast_to(np.eye(4, dtype=np.float32), (len(verts), 4, 4))
    data = WarpData.create(verts, faces, Ts)
    o = np.array([0, 0, -3.0], np.float32)
    d = np.array([0, 0, 1.0], np.float32)
    z = np.linspace(1, 5, 12, dtype=np.float32)
    pts = (o[None] + z[:, None] * d[None])[None]  # [1,12,3]
    _, can_dirs, _, _ = warp_samples_to_canonical(jnp.asarray(pts), data, block=4)
    norms = np.linalg.norm(np.asarray(can_dirs), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # identity warp: dirs == ray dir
    np.testing.assert_allclose(np.asarray(can_dirs)[0, 0], d, atol=1e-5)


def test_vertex_face_table():
    verts, faces = icosphere(0)
    table = build_vertex_face_table(faces, len(verts))
    # icosahedron: every vertex touches exactly 5 faces
    assert table.shape == (12, 5)
    for v in range(12):
        incident = set(np.nonzero((faces == v).any(axis=1))[0].tolist())
        assert set(table[v].tolist()) == incident


def test_geometry_guided_near_far_vs_bruteforce(rng):
    verts = rng.normal(size=(50, 3)).astype(np.float32) * 0.5
    rays_o = np.array([[0, 0, -3.0], [5, 5, 5.0]], np.float32)
    rays_d = np.array([[0, 0, 1.0], [0, 0, 1.0]], np.float32)
    thresh = 0.2
    near, far = geometry_guided_near_far(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(verts), thresh
    )
    # brute force per ray: sphere of radius thresh around each vertex
    for r in range(2):
        t_hits = []
        for v in verts:
            ov = v - rays_o[r]
            z0 = ov @ rays_d[r]
            disc = thresh**2 - (ov @ ov - z0**2)
            if disc >= 0:
                t_hits += [z0 - np.sqrt(disc), z0 + np.sqrt(disc)]
        if t_hits:
            np.testing.assert_allclose(float(near[r, 0]), min(t_hits), rtol=1e-4)
            np.testing.assert_allclose(float(far[r, 0]), max(t_hits), rtol=1e-4)
        else:
            assert np.isinf(float(near[r, 0]))


def test_warped_render_end_to_end(rng):
    """Render a rigidly-posed analytic sphere through the warp: the image
    must match rendering the canonical sphere directly."""
    from avatarcraft_tpu.models.instant_nsr import RenderConfig, render_rays
    from avatarcraft_tpu.warp import make_warp_fn
    from tests.test_render_core import SMALL_FIELD, sphere_field

    verts, faces = icosphere(2)
    verts = verts * 0.5  # sphere radius 0.5 (matches analytic field)
    # identity pose: warp should be a no-op
    Ts = np.broadcast_to(np.eye(4, dtype=np.float32), (len(verts), 4, 4))
    data = WarpData.create(verts, faces, Ts)

    rays_o = jnp.asarray([[0.0, 0.0, -2.0], [0.05, 0.0, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    rcfg = RenderConfig(num_steps=32, upsample_steps=16, upsample_round=16, bound=1.6)

    near, far = geometry_guided_near_far(rays_o, rays_d, jnp.asarray(verts), 0.05)
    out_warp = render_rays(
        {}, rays_o, rays_d, jax.random.PRNGKey(0), SMALL_FIELD, rcfg,
        bg_color=0.0, field=sphere_field(0.5),
        near_far=(near, far), warp_fn=make_warp_fn(data, threshold=0.05, block=64),
    )
    out_can = render_rays(
        {}, rays_o, rays_d, jax.random.PRNGKey(0), SMALL_FIELD, rcfg,
        bg_color=0.0, field=sphere_field(0.5),
    )
    np.testing.assert_allclose(
        np.asarray(out_warp["rgb"]), np.asarray(out_can["rgb"]), atol=0.05
    )
    assert float(out_warp["weight_sum"][0, 0]) > 0.95
