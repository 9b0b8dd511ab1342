"""Bundled multiview dataset loader (uses the reference's data assets)."""

import os

import numpy as np
import pytest

DATA = "/root/reference/data/smpl_da_512"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="bundled dataset not available"
)


@pytest.fixture(scope="module")
def ds():
    from avatarcraft_tpu.data import SMPLMultiviewDataset

    return SMPLMultiviewDataset(DATA)


def test_load_shapes(ds):
    assert ds.n_images == 108
    assert ds.images.shape == (108, 512, 512, 3)
    assert ds.poses.shape == (108, 4, 4)
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    # focal from camera_angle_x = 1.0472 => 0.5*512/tan(0.5236) = 443.4
    np.testing.assert_allclose(ds.focal, 443.4, atol=0.1)


def test_rays_hit_subject(ds):
    """Rays from any view should pass near the origin (subject centered)."""
    rays_o, rays_d = ds.gen_rays_at(0, resolution_level=8)
    o, d = np.asarray(rays_o), np.asarray(rays_d)
    # closest approach of the central ray to origin
    mid = o[o.shape[0] // 2 + 32] , d[o.shape[0] // 2 + 32]
    t = -(mid[0] @ mid[1])
    closest = np.linalg.norm(mid[0] + t * mid[1])
    assert closest < 0.5


def test_pixel_batch_gather(ds):
    view, pix = ds.all_pixels()
    assert view.shape[0] == 108 * 512 * 512
    rgb = ds.gather_rgb(view[:10], pix[:10])
    np.testing.assert_allclose(rgb, ds.images[0].reshape(-1, 3)[:10])
