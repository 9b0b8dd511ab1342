"""Legacy freq-NeuS and vanilla-NeRF capability paths."""

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.models.nerf import (
    NeRFConfig,
    init_nerf_params,
    nerf_forward,
    raw2outputs,
    render_nerf_rays,
)
from avatarcraft_tpu.models.neus import (
    NeuSConfig,
    build_neus,
    init_neus_params,
    neus_sdf,
)

CFG = NeuSConfig(d_hidden=64, n_layers=4, skip_layer=2, d_feature=64)


def test_neus_geometric_init_approximates_sphere():
    """SAL init: sdf(x) ~ |x| - r near the origin region."""
    params = init_neus_params(jax.random.PRNGKey(0), CFG)
    xs = jnp.asarray(
        [[0.0, 0.0, 0.0], [0.2, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.5]]
    )
    sdf = np.asarray(neus_sdf(params, xs, CFG)[:, 0])
    # the init is approximate; sign structure + radial monotonicity matter
    assert sdf[0] < 0 and sdf[1] < 0  # inside the r=0.5 sphere
    assert sdf[2] > 0 and sdf[3] > sdf[2]  # outside, increasing with radius


def test_neus_field_renders_through_shared_core():
    from avatarcraft_tpu.models.instant_nsr import RenderConfig, render_rays
    from tests.test_render_core import SMALL_FIELD

    params = init_neus_params(jax.random.PRNGKey(0), CFG)
    field = build_neus(params, CFG)
    rays_o = jnp.asarray([[0.0, 0.0, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = render_rays(
        {}, rays_o, rays_d, jax.random.PRNGKey(0), SMALL_FIELD,
        RenderConfig(num_steps=32, upsample_steps=16, upsample_round=16),
        bg_color=0.0, field=field,
    )
    # sphere-init field: the axial ray hits the r=0.5 sphere
    assert float(out["weight_sum"][0, 0]) > 0.5
    near, far = 2 - 1.6, 2 + 1.6
    t_hit = float(out["depth"][0]) * (far - near) + near
    assert abs(t_hit - 1.5) < 0.15


def test_nerf_forward_shapes_and_rotate_mapping():
    for mapping in ("identity", "rotate"):
        cfg = NeRFConfig(depth=4, width=64, skip_layer=2, mapping=mapping)
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
        d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        out = nerf_forward(params, x, d, cfg)
        assert out.shape == (10, 4)
        assert np.isfinite(np.asarray(out)).all()


def test_raw2outputs_opaque_sample():
    """A single very dense sample makes the ray fully opaque at its color."""
    N, T = 2, 8
    raw = np.zeros((N, T, 4), np.float32)
    raw[:, 3, 3] = 1e8  # huge density at sample 3
    raw[:, :, :3] = 10.0  # sigmoid(10) ~ 1 -> white-ish
    z = np.broadcast_to(np.linspace(1, 2, T), (N, T)).astype(np.float32)
    d = np.broadcast_to(np.array([0, 0, 1.0], np.float32), (N, 3))
    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d), white_bkg=False)
    np.testing.assert_allclose(np.asarray(out["acc"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), z[0, 3], atol=1e-5)


def test_render_nerf_rays_runs():
    cfg = NeRFConfig(depth=2, width=32, skip_layer=1, multires=4)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    rays_o = jnp.asarray([[0.0, 0.0, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = render_nerf_rays(params, rays_o, rays_d, cfg, n_samples=16)
    assert out["rgb"].shape == (1, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
