"""Hybrid rendering, VAE decoder, dataset extras, misc helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatarcraft_tpu.utils.misc import (
    fix_randomness,
    log_exec,
    smpl_verts_to_center_and_up,
)


def test_center_and_up_from_elongated_cloud(rng):
    # a vertical "body": tall in y
    pts = rng.normal(size=(500, 3)) * np.array([0.2, 1.0, 0.2]) + np.array([1, 2, 3])
    center, up = smpl_verts_to_center_and_up(pts)
    np.testing.assert_allclose(center, [1, 2, 3], atol=0.15)
    assert abs(up[1]) > 0.95 and up[1] > 0


def test_fix_randomness_deterministic():
    r1 = fix_randomness(7).random(5)
    r2 = fix_randomness(7).random(5)
    np.testing.assert_array_equal(r1, r2)


def test_log_exec_passthrough(capsys):
    @log_exec
    def f(x):
        return x + 1

    assert f(1) == 2
    assert "log_exec" in capsys.readouterr().out


def test_composite_by_depth():
    from avatarcraft_tpu.workloads.hybrid import composite_by_depth

    a = jnp.ones((4, 3))
    b = jnp.zeros((4, 3))
    da = jnp.asarray([1.0, 5.0, 2.0, 9.0])
    db = jnp.asarray([3.0, 3.0, 3.0, 3.0])
    out = np.asarray(composite_by_depth(a, b, da, db))
    np.testing.assert_array_equal(out[:, 0], [1, 0, 1, 0])


def test_hybrid_avatar_over_nerf_background():
    from avatarcraft_tpu.models.instant_nsr import RenderConfig
    from avatarcraft_tpu.models.nerf import NeRFConfig, init_nerf_params
    from avatarcraft_tpu.workloads.hybrid import render_hybrid_avatar
    from tests.test_render_core import SMALL_FIELD, sphere_field

    bkg_cfg = NeRFConfig(depth=2, width=32, skip_layer=1, multires=4)
    bkg_params = init_nerf_params(jax.random.PRNGKey(0), bkg_cfg)
    # empty background (random init has junk density): relu(sigma) == 0
    bkg_params["sigma"]["b"] = bkg_params["sigma"]["b"] - 10.0

    rays_o = jnp.asarray([[0.0, 0.0, -2.0], [1.5, 0.0, -2.0]])  # hit, miss
    rays_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    rcfg = RenderConfig(num_steps=16, upsample_steps=16, upsample_round=16)

    import avatarcraft_tpu.models.instant_nsr as nsr

    # monkeypatch-free: use field override through render_hybrid via params?
    # render_hybrid_avatar uses network params; test with the analytic field
    # by patching network_field_fns for the call
    orig = nsr.network_field_fns
    nsr.network_field_fns = lambda p, f, b: sphere_field(0.5, rgb=(1.0, 0.0, 0.0))
    try:
        out = render_hybrid_avatar(
            {}, SMALL_FIELD, rcfg, bkg_params, bkg_cfg, rays_o, rays_d,
            key=jax.random.PRNGKey(1),
        )
    finally:
        nsr.network_field_fns = orig
    assert bool(out["avatar_mask"][0]) is True  # central ray hits the avatar
    assert bool(out["avatar_mask"][1]) is False
    np.testing.assert_allclose(np.asarray(out["rgb"][0]), [1, 0, 0], atol=0.05)


def test_hybrid_multi_person_nearest_wins():
    from avatarcraft_tpu.models.instant_nsr import RenderConfig
    from avatarcraft_tpu.models.nerf import NeRFConfig, init_nerf_params
    from avatarcraft_tpu.workloads.hybrid import render_hybrid_multi_persons
    from tests.test_render_core import SMALL_FIELD, sphere_field

    bkg_cfg = NeRFConfig(depth=2, width=32, skip_layer=1, multires=4)
    bkg_params = init_nerf_params(jax.random.PRNGKey(0), bkg_cfg)
    bkg_params["sigma"]["b"] = bkg_params["sigma"]["b"] - 10.0  # empty bkg

    rcfg = RenderConfig(num_steps=16, upsample_steps=16, upsample_round=16)
    import avatarcraft_tpu.models.instant_nsr as nsr

    orig = nsr.network_field_fns
    nsr.network_field_fns = lambda p, f, b: sphere_field(0.5, rgb=tuple(p["rgb"]))
    try:
        avatars = [
            {"params": {"rgb": (1.0, 0.0, 0.0)}, "fcfg": SMALL_FIELD, "rcfg": rcfg},
            {"params": {"rgb": (0.0, 1.0, 0.0)}, "fcfg": SMALL_FIELD, "rcfg": rcfg},
        ]
        rays_o = jnp.asarray([[0.0, 0.0, -2.0]])
        rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
        out = render_hybrid_multi_persons(
            avatars, bkg_params, bkg_cfg, rays_o, rays_d, key=jax.random.PRNGKey(1)
        )
    finally:
        nsr.network_field_fns = orig
    # both avatars occupy the same sphere; the LAST nearer-or-equal one wins
    # deterministically and the pixel is an avatar color, not background white
    rgb = np.asarray(out["rgb"][0])
    assert rgb.max() > 0.9 and rgb.min() < 0.1
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_vae_decoder_roundtrip_shapes():
    from avatarcraft_tpu.models.sd import (
        VAEConfig,
        init_vae_decoder_params,
        init_vae_encoder_params,
        vae_decode_apply,
        vae_encode_apply,
    )

    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_groups=4)
    enc = init_vae_encoder_params(jax.random.PRNGKey(0), cfg)
    dec = init_vae_decoder_params(jax.random.PRNGKey(1), cfg)
    img = jnp.clip(jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 32, 32)), 0, 1)
    lat = vae_encode_apply(enc, cfg, img)
    rec = vae_decode_apply(dec, cfg, lat)
    assert rec.shape == (1, 3, 32, 32)
    assert float(rec.min()) >= 0.0 and float(rec.max()) <= 1.0


def test_dataset_extras():
    import os

    DATA = "/root/reference/data/smpl_da_512"
    if not os.path.isdir(DATA):
        pytest.skip("dataset unavailable")
    from avatarcraft_tpu.data import SMPLMultiviewDataset

    ds = SMPLMultiviewDataset(DATA)
    ro, rd, rgb, mask = ds.gen_random_rays_at(0, 64, np.random.default_rng(0))
    assert ro.shape == (64, 3) and rgb.shape == (64, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rd), axis=1), 1.0, atol=1e-5)

    m = ds.masks[0] > 0
    ro, rd, side, keep = ds.gen_rays_silhouettes(ds.poses[0], 4096, m)
    assert ro.shape[0] == keep.sum()
    assert ro.shape[0] <= 4096 * 1.6  # dilation slack

    near, far = ds.near_far_from_sphere(jnp.asarray([[0, 0, -3.0]]), jnp.asarray([[0, 0, 1.0]]))
    np.testing.assert_allclose(float(near[0, 0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(far[0, 0]), 4.0, atol=1e-5)
