"""Marching tetrahedra + PLY export."""

import os

import numpy as np

from avatarcraft_tpu.utils.marching_cubes import marching_cubes
from avatarcraft_tpu.utils.mesh_export import load_obj, save_ply


def _sphere_field(res=48, radius=0.6):
    xs = np.linspace(-1, 1, res)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    # field = -sdf so surface normals/sign convention match -SDF extraction
    return radius - np.sqrt(gx**2 + gy**2 + gz**2), xs


def test_sphere_surface_radius():
    field, xs = _sphere_field()
    verts, tris = marching_cubes(field, 0.0)
    assert len(verts) > 500 and len(tris) > 500
    # map index coords -> world coords
    world = verts / (len(xs) - 1) * 2.0 - 1.0
    r = np.linalg.norm(world, axis=1)
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.01)
    assert r.std() < 0.01
    # all triangle indices valid
    assert tris.min() >= 0 and tris.max() < len(verts)


def test_empty_field_no_mesh():
    field = -np.ones((8, 8, 8))
    verts, tris = marching_cubes(field, 0.0)
    assert len(verts) == 0 and len(tris) == 0


def test_mesh_is_closed_manifoldish():
    """Every edge of a closed surface should be shared by exactly 2 triangles."""
    field, _ = _sphere_field(res=24)
    verts, tris = marching_cubes(field, 0.0)
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_ply_roundtrip_size(tmp_path):
    field, _ = _sphere_field(res=16)
    verts, tris = marching_cubes(field, 0.0)
    p = os.path.join(tmp_path, "sphere.ply")
    save_ply(verts, tris, p)
    data = open(p, "rb").read()
    assert data.startswith(b"ply")
    assert f"element vertex {len(verts)}".encode() in data


def test_load_obj(tmp_path):
    p = os.path.join(tmp_path, "tri.obj")
    with open(p, "w") as fh:
        fh.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nf 1/1 2/1 3/1\n")
    v, uv, f = load_obj(p)
    assert v.shape == (3, 3) and f.shape == (1, 3)
    np.testing.assert_array_equal(f[0], [0, 1, 2])
