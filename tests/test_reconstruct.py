"""End-to-end reconstruct training on a tiny synthetic dataset (8 CPU devices)."""

import json
import os

import jax
import numpy as np
import pytest

from avatarcraft_tpu.models.instant_nsr import FieldConfig, RenderConfig
from avatarcraft_tpu.ops.hash_encoder import HashGridSpec
from avatarcraft_tpu.workloads.reconstruct import (
    ReconstructConfig,
    make_batch_ray_fn,
    pixel_batches,
    smooth_l1,
    train,
)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """2 synthetic 16x16 views: white disc on black background."""
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("tinyds")
    os.makedirs(root / "img", exist_ok=True)
    frames = []
    for i, angle in enumerate([0.0, np.pi / 2]):
        c, s = np.cos(angle), np.sin(angle)
        # camera at distance 2 looking at origin (OpenGL convention, -z fwd)
        c2w = np.array(
            [[c, 0, s, 2 * s], [0, 1, 0, 0], [-s, 0, c, 2 * c], [0, 0, 0, 1]],
            np.float32,
        )
        img = np.zeros((16, 16, 3), np.uint8)
        yy, xx = np.mgrid[:16, :16]
        img[(yy - 8) ** 2 + (xx - 8) ** 2 < 25] = 255
        imageio.imwrite(root / "img" / f"{i:04d}.png", img)
        frames.append(
            {"file_path": f"img/{i:04d}", "transform_matrix": c2w.tolist()}
        )
    with open(root / "transforms_train.json", "w") as fh:
        json.dump({"camera_angle_x": 1.0471975511965976, "frames": frames}, fh)

    from avatarcraft_tpu.data import SMPLMultiviewDataset

    return SMPLMultiviewDataset(str(root))


TINY_FIELD = FieldConfig(
    grid=HashGridSpec(num_levels=4, base_resolution=4, log2_hashmap_size=10, desired_resolution=32)
)
TINY_RENDER = RenderConfig(num_steps=12, upsample_steps=8, upsample_round=8, bound=1.6, perturb=True)


def test_smooth_l1_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    a = rng.normal(size=(32, 3)).astype(np.float32)
    b = rng.normal(size=(32, 3)).astype(np.float32)
    want = F.smooth_l1_loss(torch.from_numpy(a), torch.from_numpy(b)).item()
    got = float(smooth_l1(a, b))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pixel_batches_cover_everything():
    rng = np.random.default_rng(0)
    seen = set()
    for v, p in pixel_batches(2, 16, 8, rng):
        assert v.shape == (8,) and p.shape == (8,)
        seen.update(zip(v.tolist(), p.tolist()))
    assert len(seen) == 32  # every (view, pixel) exactly once


def test_ray_fn_matches_dataset_rays(tiny_dataset):
    from avatarcraft_tpu.cameras.rays import dataset_rays

    ds = tiny_dataset
    ray_fn = make_batch_ray_fn(ds.K, ds.H, ds.W)
    import jax.numpy as jnp

    view = np.zeros(ds.H * ds.W, np.int32)
    pix = np.arange(ds.H * ds.W, dtype=np.int32)
    ro_b, rd_b = ray_fn(jnp.asarray(ds.poses), jnp.asarray(view), jnp.asarray(pix))
    ro_f, rd_f = dataset_rays(ds.poses[0], ds.K, ds.H, ds.W)
    np.testing.assert_allclose(np.asarray(ro_b), np.asarray(ro_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd_b), np.asarray(rd_f), atol=1e-6)


def test_training_reduces_loss_sharded(tiny_dataset):
    """Full train loop across the virtual 8-device mesh: loss must drop."""
    assert jax.device_count() == 8
    cfg = ReconstructConfig(batch_size=64, lr=5e-3, epochs=10, white_bkg=False)
    params, stats = train(
        tiny_dataset, TINY_FIELD, TINY_RENDER, cfg, max_steps=60, log_every=1
    )
    losses = [l for _, l in stats["losses"]]
    assert len(losses) >= 50
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert late < early * 0.7, f"loss did not drop: {early} -> {late}"
    flat, _ = jax.tree_util.tree_flatten(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
