"""Ray sampling primitives: stratified z-vals, inverse-CDF importance sampling,
cube AABB near/far. All static-shape, jit-friendly.

Mirrors reference semantics:
* ``sample_pdf`` -- NeRF inverse-CDF sampling (reference: models/instant_nsr.py:21-55)
* ``near_far_from_bound`` -- cube slab test (reference: models/instant_nsr.py:58-77)
* ``stratified_z_vals`` -- linspace [near, far] + optional uniform perturb
  (reference: models/instant_nsr.py:155-162)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    *,
    det: bool = True,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling of ``n_samples`` new z-values per ray.

    Args:
        bins: [B, T] existing z values (bin edges).
        weights: [B, T-1] bin weights.
        det: deterministic mid-bin uniform samples (the reference renderer's
             up-sampling always uses det=True, models/instant_nsr.py:457).
        key: PRNG key, required when det=False.

    Returns: [B, n_samples] new z values.
    """
    B, T = bins.shape
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, T]

    if det:
        # linspace(0.5/n, 1 - 0.5/n, n) (models/instant_nsr.py:34)
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (B, n_samples))
    else:
        assert key is not None, "sample_pdf(det=False) requires a PRNG key"
        u = jax.random.uniform(key, (B, n_samples), dtype=bins.dtype)

    # searchsorted 'right' per ray
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, T - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def near_far_from_bound(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, bound: float, kind: str = "cube"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ray/[-bound,bound]^3 intersection interval.

    rays_o, rays_d: [N, 3]. Returns (near, far): [N, 1] each.
    Matches the reference slab test including the ``near >= 0.05`` clamp
    (models/instant_nsr.py:69-77).
    """
    if kind == "sphere":
        radius = jnp.linalg.norm(rays_o, axis=-1, keepdims=True)
        return radius - bound, radius + bound
    tmin = (-bound - rays_o) / (rays_d + 1e-15)
    tmax = (bound - rays_o) / (rays_d + 1e-15)
    near = jnp.max(jnp.minimum(tmin, tmax), axis=-1, keepdims=True)
    far = jnp.min(jnp.maximum(tmin, tmax), axis=-1, keepdims=True)
    near = jnp.maximum(near, 0.05)
    return near, far


def stratified_z_vals(
    near: jnp.ndarray,
    far: jnp.ndarray,
    num_steps: int,
    *,
    perturb: bool = False,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """[N, T] z values uniformly spanning [near, far] per ray.

    With ``perturb``, each sample is jittered by +-0.5*sample_dist
    (models/instant_nsr.py:159-162).
    """
    t = jnp.linspace(0.0, 1.0, num_steps, dtype=near.dtype)  # [T]
    z_vals = near + (far - near) * t[None, :]  # broadcas [N,1]*[1,T]
    if perturb:
        assert key is not None, "stratified_z_vals(perturb=True) requires a key"
        sample_dist = (far - near) / num_steps  # [N, 1]
        z_vals = z_vals + (jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype) - 0.5) * sample_dist
    return z_vals
