"""sample_pdf / near-far / stratified sampling invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.ops.sampling import (
    near_far_from_bound,
    sample_pdf,
    stratified_z_vals,
)


def test_sample_pdf_uniform_weights_gives_uniform_samples():
    bins = jnp.linspace(0.0, 1.0, 9)[None, :].repeat(4, axis=0)  # [4, 9]
    weights = jnp.ones((4, 8))
    s = np.asarray(sample_pdf(bins, weights, 16, det=True))
    # deterministic mid-bin samples of a uniform CDF == uniform spacing
    want = np.linspace(0.5 / 16, 1 - 0.5 / 16, 16)
    np.testing.assert_allclose(s[0], want, atol=1e-5)


def test_sample_pdf_concentrates_on_heavy_bin():
    bins = jnp.linspace(0.0, 1.0, 11)[None, :]
    weights = jnp.zeros((1, 10)).at[0, 7].set(1.0)
    s = np.asarray(sample_pdf(bins, weights, 32, det=True))
    # nearly all samples inside bin 7 => [0.7, 0.8]
    assert (np.abs(s - 0.75) < 0.06).mean() > 0.9


def test_sample_pdf_monotone_and_in_range():
    key = jax.random.PRNGKey(0)
    bins = jnp.sort(jax.random.uniform(key, (5, 12)), axis=-1)
    weights = jax.random.uniform(jax.random.PRNGKey(1), (5, 11))
    s = np.asarray(sample_pdf(bins, weights, 20, det=True))
    assert (s >= np.asarray(bins[:, :1])).all()
    assert (s <= np.asarray(bins[:, -1:])).all()


def test_near_far_cube_axis_ray():
    rays_o = jnp.asarray([[0.0, 0.0, -3.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    near, far = near_far_from_bound(rays_o, rays_d, 1.6)
    np.testing.assert_allclose(np.asarray(near)[0, 0], 3 - 1.6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(far)[0, 0], 3 + 1.6, rtol=1e-5)


def test_near_clamped_at_min():
    rays_o = jnp.asarray([[0.0, 0.0, 0.0]])  # inside the cube
    rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
    near, far = near_far_from_bound(rays_o, rays_d, 1.0)
    np.testing.assert_allclose(np.asarray(near)[0, 0], 0.05)
    np.testing.assert_allclose(np.asarray(far)[0, 0], 1.0, rtol=1e-5)


def test_stratified_z_vals_spacing_and_perturb():
    near = jnp.full((3, 1), 1.0)
    far = jnp.full((3, 1), 2.0)
    z = np.asarray(stratified_z_vals(near, far, 16))
    np.testing.assert_allclose(z[0], np.linspace(1, 2, 16), rtol=1e-6)

    zp = np.asarray(
        stratified_z_vals(near, far, 16, perturb=True, key=jax.random.PRNGKey(3))
    )
    assert not np.allclose(z, zp)
    assert (np.abs(zp - z) <= 0.5 * (1.0 / 16) + 1e-6).all()
