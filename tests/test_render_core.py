"""NeuS render core: analytic-sphere closed-form checks + network plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avatarcraft_tpu.models.instant_nsr import (
    FieldConfig,
    FieldFns,
    RenderConfig,
    forward_sdf,
    forward_variance,
    init_field_params,
    render_rays,
    render_rays_chunked,
    up_sample,
)
from avatarcraft_tpu.ops.hash_encoder import HashGridSpec

SMALL_FIELD = FieldConfig(
    grid=HashGridSpec(num_levels=4, base_resolution=4, log2_hashmap_size=10, desired_resolution=32)
)
SMALL_RENDER = RenderConfig(num_steps=16, upsample_steps=16, upsample_round=8, bound=1.6)


def sphere_field(radius=0.5, rgb=(1.0, 0.2, 0.1), inv_s=2000.0, geo_feat_dim=15):
    """Analytic sphere SDF field with constant albedo."""

    def sdf(x):
        d = jnp.linalg.norm(x, axis=-1, keepdims=True) - radius
        return jnp.concatenate([d, jnp.zeros((x.shape[0], geo_feat_dim))], axis=-1)

    def color(x, d, n, f):
        return jnp.broadcast_to(jnp.asarray(rgb), (x.shape[0], 3))

    return FieldFns(sdf=sdf, color=color, inv_s=lambda: jnp.asarray(inv_s))


def _rays_towards_origin(n=8, dist=2.0):
    """n rays from a circle at z=-dist aiming at the origin region."""
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    offsets = 0.1 * np.stack([np.cos(angles), np.sin(angles)], -1)
    rays_o = np.concatenate([offsets, np.full((n, 1), -dist)], axis=-1).astype(np.float32)
    d = -rays_o
    rays_d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(rays_o), jnp.asarray(rays_d)


def test_sphere_hit_ray_converges_to_surface():
    rays_o = jnp.asarray([[0.0, 0.0, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    field = sphere_field(radius=0.5)
    params = {}  # unused with explicit field fns
    out = render_rays(
        params, rays_o, rays_d, jax.random.PRNGKey(0),
        SMALL_FIELD, RenderConfig(num_steps=64, upsample_steps=64, bound=1.6),
        bg_color=0.0, field=field,
    )
    # the ray pierces the sphere: opacity saturates
    assert float(out["weight_sum"][0, 0]) > 0.98
    # expected hit at t = 2.0 - 0.5 = 1.5; depth is normalized (z-near)/(far-near)
    near, far = 2.0 - 1.6, 2.0 + 1.6
    t_hit = float(out["depth"][0]) * (far - near) + near
    assert abs(t_hit - 1.5) < 0.02
    # color == albedo against black background
    np.testing.assert_allclose(np.asarray(out["rgb"][0]), [1.0, 0.2, 0.1], atol=0.03)
    # surface normal at front of sphere points toward camera (-z)
    assert float(out["normal"][0, 2]) < -0.9


def test_sphere_miss_ray_is_background():
    rays_o = jnp.asarray([[1.5, 0.0, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = render_rays(
        {}, rays_o, rays_d, jax.random.PRNGKey(0),
        SMALL_FIELD, RenderConfig(num_steps=32, upsample_steps=32, bound=1.6),
        bg_color=jnp.asarray([[0.3, 0.6, 0.9]]), field=sphere_field(0.5),
    )
    assert float(out["weight_sum"][0, 0]) < 0.01
    np.testing.assert_allclose(np.asarray(out["rgb"][0]), [0.3, 0.6, 0.9], atol=0.01)


def test_sphere_eikonal_near_zero():
    """An exact SDF has ||grad|| = 1 -> eikonal loss ~ 0.

    The handful of samples whose FD stencil straddles the sphere-center
    kink (where an exact SDF is non-differentiable) report ||grad||=0; with
    ~2% of samples affected the loss lands around 0.04, so assert < 0.05.
    A smooth network SDF has no such kink.
    """
    rays_o, rays_d = _rays_towards_origin(8)
    out = render_rays(
        {}, rays_o, rays_d, jax.random.PRNGKey(1),
        SMALL_FIELD, SMALL_RENDER, bg_color=1.0, field=sphere_field(0.5),
    )
    assert float(out["gradient_error"]) < 0.05


def test_upsample_concentrates_near_surface():
    rays_o = jnp.asarray([[0.0, 0.0, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    z = jnp.linspace(0.4, 3.6, 32)[None, :]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    sdf = jnp.linalg.norm(pts, axis=-1) - 0.5
    new_z = up_sample(rays_o, rays_d, z, sdf, 16, 64.0)
    # new samples cluster around the two surface crossings t=1.5, t=2.5
    frac_near = (np.minimum(np.abs(np.asarray(new_z) - 1.5), np.abs(np.asarray(new_z) - 2.5)) < 0.3).mean()
    assert frac_near > 0.8


def test_network_field_init_renders_background():
    params = init_field_params(jax.random.PRNGKey(0), SMALL_FIELD)
    rays_o, rays_d = _rays_towards_origin(4)
    out = render_rays(
        params, rays_o, rays_d, jax.random.PRNGKey(2),
        SMALL_FIELD, SMALL_RENDER, bg_color=1.0,
    )
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert out["rgb"].shape == (4, 3)
    assert out["weights"].shape == (4, SMALL_RENDER.total_steps)


def test_gradients_flow_to_all_params():
    params = init_field_params(jax.random.PRNGKey(0), SMALL_FIELD)
    rays_o, rays_d = _rays_towards_origin(4)

    def loss(p):
        out = render_rays(
            p, rays_o, rays_d, jax.random.PRNGKey(0),
            SMALL_FIELD, SMALL_RENDER, bg_color=0.5,
        )
        return out["rgb"].sum() + 0.1 * out["gradient_error"]

    grads = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # sdf-net and variance receive gradient. NOTE: at geometric init the
    # layer-0 encoding columns are exactly zero (matching the reference,
    # models/instant_nsr.py:546), so the hash TABLE gets zero gradient at
    # step 0 -- it starts learning once those columns move.
    assert float(jnp.abs(grads["sdf"][0]["v"]).sum()) > 0
    assert float(jnp.abs(grads["sdf"][0]["v"][:, 3:]).sum()) > 0  # encoding cols learn
    assert float(jnp.abs(grads["variance"])) > 0
    assert float(jnp.abs(grads["color"][0]["v"]).sum()) > 0

    # after perturbing layer-0 encoding columns, the table receives gradient
    params2 = jax.tree_util.tree_map(lambda x: x, params)
    params2["sdf"][0]["v"] = params["sdf"][0]["v"] + 0.01
    grads2 = jax.grad(loss)(params2)
    assert float(jnp.abs(grads2["table"]).sum()) > 0


def test_perturb_changes_output_deterministically():
    params = init_field_params(jax.random.PRNGKey(0), SMALL_FIELD)
    rays_o, rays_d = _rays_towards_origin(2)
    rc = dataclasses_replace(SMALL_RENDER, perturb=True)
    o1 = render_rays(params, rays_o, rays_d, jax.random.PRNGKey(7), SMALL_FIELD, rc)
    o2 = render_rays(params, rays_o, rays_d, jax.random.PRNGKey(7), SMALL_FIELD, rc)
    o3 = render_rays(params, rays_o, rays_d, jax.random.PRNGKey(8), SMALL_FIELD, rc)
    np.testing.assert_array_equal(np.asarray(o1["z_vals"]), np.asarray(o2["z_vals"]))
    assert not np.allclose(np.asarray(o1["z_vals"]), np.asarray(o3["z_vals"]))


def dataclasses_replace(obj, **kw):
    import dataclasses

    return dataclasses.replace(obj, **kw)


def test_chunked_render_matches_direct():
    params = init_field_params(jax.random.PRNGKey(0), SMALL_FIELD)
    rays_o, rays_d = _rays_towards_origin(10)
    direct = render_rays(
        params, rays_o, rays_d, jax.random.PRNGKey(0), SMALL_FIELD, SMALL_RENDER, 1.0
    )
    chunked = render_rays_chunked(
        params, rays_o, rays_d, jax.random.PRNGKey(0), SMALL_FIELD, SMALL_RENDER, 1.0, chunk=4
    )
    # perturb off => same z grid => identical images up to chunk padding
    np.testing.assert_allclose(
        np.asarray(direct["rgb"]), np.asarray(chunked["rgb"]), rtol=2e-4, atol=2e-5
    )


def test_forward_sdf_weight_norm_shapes():
    params = init_field_params(jax.random.PRNGKey(0), SMALL_FIELD)
    x = jnp.zeros((5, 3))
    out = forward_sdf(params, x, SMALL_FIELD, 1.6)
    assert out.shape == (5, 1 + SMALL_FIELD.geo_feat_dim)
    inv_s = forward_variance(params)
    np.testing.assert_allclose(float(inv_s), np.exp(0.3 * 10.0), rtol=1e-5)


# ---------------------------------------------------------------------------
# Normal-mode dispatch (fd7 parity / fd4 / analytic forward-mode)
# ---------------------------------------------------------------------------


def test_analytic_gradient_matches_fd_on_smooth_field():
    """On a smooth (sphere) SDF the analytic forward-mode gradient and the
    reference FD7 stencil agree to O(eps^2)."""
    from avatarcraft_tpu.models.instant_nsr import field_sdf_grad

    field = sphere_field(radius=0.5)
    x = jnp.asarray(
        np.random.default_rng(3).uniform(-1.0, 1.0, size=(64, 3)).astype(np.float32)
    )
    sdf_a, feat_a, grad_a = field_sdf_grad(field, x, 1.6, 0.005, "analytic")
    sdf_f, feat_f, grad_f = field_sdf_grad(field, x, 1.6, 0.005, "fd7")
    np.testing.assert_allclose(np.asarray(sdf_a), np.asarray(sdf_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad_a), np.asarray(grad_f), atol=1e-3)
    # exact unit gradient for the sphere SDF
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(grad_a), axis=-1), 1.0, atol=1e-5
    )


def test_analytic_gradient_through_hash_network():
    """Analytic mode runs through the real hash-grid network and matches FD7
    away from cell boundaries (the field is piecewise trilinear; FD smooths
    over eps, so agreement is loose but directionally consistent)."""
    from avatarcraft_tpu.models.instant_nsr import field_sdf_grad, network_field_fns

    params = init_field_params(jax.random.PRNGKey(0), SMALL_FIELD)
    field = network_field_fns(params, SMALL_FIELD, 1.6)
    x = jnp.asarray(
        np.random.default_rng(5).uniform(-0.8, 0.8, size=(128, 3)).astype(np.float32)
    )
    sdf_a, feat_a, grad_a = field_sdf_grad(field, x, 1.6, 0.001, "analytic")
    sdf_f, feat_f, grad_f = field_sdf_grad(field, x, 1.6, 0.001, "fd7")
    assert np.isfinite(np.asarray(grad_a)).all()
    np.testing.assert_allclose(np.asarray(sdf_a), np.asarray(sdf_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(feat_a), np.asarray(feat_f), atol=1e-5)
    # geometric-init field is dominated by the smooth ||x|| component
    cos = np.sum(
        np.asarray(grad_a) * np.asarray(grad_f), axis=-1
    ) / (
        np.linalg.norm(np.asarray(grad_a), axis=-1)
        * np.linalg.norm(np.asarray(grad_f), axis=-1)
        + 1e-9
    )
    assert np.mean(cos) > 0.99


def _safe_sphere_field(radius=0.5, rgb=(1.0, 0.2, 0.1), inv_s=2000.0, geo_feat_dim=15):
    """Sphere SDF with a jvp-safe norm: rays through the exact origin hit
    jnp.linalg.norm's 0/0 tangent, which the analytic normal mode
    differentiates (the real network field has no such singularity)."""

    def sdf(x):
        d = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12) - radius
        return jnp.concatenate([d, jnp.zeros((x.shape[0], geo_feat_dim))], axis=-1)

    def color(x, d, n, f):
        return jnp.broadcast_to(jnp.asarray(rgb), (x.shape[0], 3))

    return FieldFns(sdf=sdf, color=color, inv_s=lambda: jnp.asarray(inv_s))


def test_render_rays_analytic_mode_close_to_fd():
    """Full render with normal_mode='analytic' stays close to the fd7 render
    on the converging sphere scene and is differentiable end to end."""
    params = init_field_params(jax.random.PRNGKey(0), SMALL_FIELD)
    rays_o, rays_d = _rays_towards_origin(8)
    out_fd = render_rays(
        params, rays_o, rays_d, jax.random.PRNGKey(0), SMALL_FIELD, SMALL_RENDER,
        1.0, field=_safe_sphere_field(0.5),
    )
    out_an = render_rays(
        params, rays_o, rays_d, jax.random.PRNGKey(0), SMALL_FIELD,
        dataclasses_replace(SMALL_RENDER, normal_mode="analytic"),
        1.0, field=_safe_sphere_field(0.5),
    )
    np.testing.assert_allclose(
        np.asarray(out_fd["rgb"]), np.asarray(out_an["rgb"]), atol=5e-3
    )

    # grad-of-grad: training loss through the analytic (jvp) normals
    def loss(p):
        out = render_rays(
            p, rays_o, rays_d, jax.random.PRNGKey(0), SMALL_FIELD,
            dataclasses_replace(SMALL_RENDER, normal_mode="analytic"), 1.0,
        )
        return out["rgb"].sum() + out["gradient_error"]

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_fast_path_analytic_mode_close_to_fd4():
    from avatarcraft_tpu.models.instant_nsr import FastRenderConfig, render_rays_fast

    params = init_field_params(jax.random.PRNGKey(0), SMALL_FIELD)
    rays_o, rays_d = _rays_towards_origin(8)
    grid = jnp.full((129, 129, 129), 100.0, jnp.float32)
    cfg_fd = FastRenderConfig(n_probes=48, k_samples=16, bound=1.6)
    cfg_an = FastRenderConfig(n_probes=48, k_samples=16, bound=1.6, normal_mode="analytic")
    out_fd = render_rays_fast(
        params, rays_o, rays_d, SMALL_FIELD, cfg_fd, grid, 1.0, field=sphere_field(0.5)
    )
    out_an = render_rays_fast(
        params, rays_o, rays_d, SMALL_FIELD, cfg_an, grid, 1.0, field=sphere_field(0.5)
    )
    np.testing.assert_allclose(
        np.asarray(out_fd["rgb"]), np.asarray(out_an["rgb"]), atol=5e-3
    )
