"""Native C++ mesh extractor vs the numpy reference implementation."""

import numpy as np
import pytest

from avatarcraft_tpu.utils.marching_cubes import marching_cubes
from avatarcraft_tpu.utils.native import get_mesh_extract_lib, native_marching_cubes


def _sphere_field(res=32, radius=0.6):
    xs = np.linspace(-1, 1, res)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    return radius - np.sqrt(gx**2 + gy**2 + gz**2)


needs_native = pytest.mark.skipif(
    get_mesh_extract_lib() is None, reason="native mesh extractor unavailable"
)


@needs_native
def test_native_matches_numpy_geometry():
    field = _sphere_field()
    nv, nt = native_marching_cubes(field, 0.0)
    pv, pt = marching_cubes(field, 0.0, prefer_native=False)
    assert len(nt) == len(pt)
    # same vertex set (order may differ)
    a = np.array(sorted(map(tuple, np.round(nv, 4).tolist())))
    b = np.array(sorted(map(tuple, np.round(pv, 4).tolist())))
    np.testing.assert_allclose(a, b, atol=1e-3)


@needs_native
def test_native_sphere_radius_and_manifold():
    field = _sphere_field(res=48)
    verts, tris = native_marching_cubes(field, 0.0)
    world = verts / 47 * 2.0 - 1.0
    r = np.linalg.norm(world, axis=1)
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.01)
    edges = np.sort(
        np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]]), axis=1
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


@needs_native
def test_native_empty_and_threading():
    empty = -np.ones((8, 8, 8), np.float32)
    v, t = native_marching_cubes(empty, 0.0)
    assert len(v) == 0 and len(t) == 0
    # multithreaded result identical to single-threaded
    field = _sphere_field(res=40)
    v1, t1 = native_marching_cubes(field, 0.0, n_threads=1)
    v8, t8 = native_marching_cubes(field, 0.0, n_threads=8)
    assert len(v1) == len(v8) and len(t1) == len(t8)
    a = np.array(sorted(map(tuple, np.round(v1, 4).tolist())))
    b = np.array(sorted(map(tuple, np.round(v8, 4).tolist())))
    np.testing.assert_allclose(a, b, atol=1e-4)
