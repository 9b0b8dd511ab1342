"""Instant-NSR: hash-grid NeuS SDF field + volume render core, TPU-native.

This is the re-design of the reference renderer (reference:
models/instant_nsr.py:90-726). Key differences from the CUDA/torch original:

* the whole render step -- near/far, stratified sampling, SDF-guided
  importance upsampling, finite-difference normals, NeuS alpha compositing,
  eikonal -- is ONE static-shape jit'd function (`render_rays`); the
  reference's Python chunk loop becomes `lax.map` over fixed-size ray blocks
  (`render_rays_chunked`),
* the 1 + 6 finite-difference SDF evaluations per sample are batched into a
  single [7*N*T, 3] network forward so the MXU sees one large matmul instead
  of 7 small ones (reference: models/instant_nsr.py:210-214,687-704 issues 7
  separate kernel launches),
* posed-space warping is injected as a pure `warp_fn` callable so the same
  render core serves canonical and warped rendering without host round trips
  (the reference ships samples to the CPU for libigl each batch,
  models/instant_nsr.py:166-172),
* parameters are a plain pytree, replicable/shardable with jax.sharding.

Weight-norm parameterization (w = g * v / ||v||_row) matches
torch.nn.utils.weight_norm so reference checkpoints load bit-comparably
(reference: models/instant_nsr.py:555-556,585-586).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.ops.grid_encoder import (
    PyramidSpec,
    init_pyramid_params,
    materialize_packed,
    pyramid_encode,
)
from avatarcraft_tpu.ops.hash_encoder import HashGridSpec, hash_encode, init_hash_table
from avatarcraft_tpu.ops.sampling import (
    near_far_from_bound,
    sample_pdf,
    stratified_z_vals,
)
from avatarcraft_tpu.ops.sh_encoder import sh_encode


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Network hyperparameters (reference: models/instant_nsr.py:479-494).

    ``encoder`` selects the spatial encoding:
      * "hashgrid"    -- instant-NGP hash tables, bit-compatible with
        reference checkpoints (slow path on TPU: 128 gathers/point);
      * "tpu_pyramid" -- the TPU-native dense-pyramid + triplane encoder
        (ops/grid_encoder.py; ~12 gathers/point). The flagship for training
        from scratch on TPU.
    """

    grid: HashGridSpec = HashGridSpec()
    pyramid: PyramidSpec = PyramidSpec()
    encoder: str = "hashgrid"
    packed_dtype: str = "bfloat16"  # dtype of materialized pyramid tables
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    include_input: bool = True
    use_viewdirs: bool = False
    sh_degree: int = 4
    variance_init: float = 0.3
    # matmul input dtype for the COLOR MLP: "bfloat16" feeds the MXU at 2x
    # rate with fp32 accumulation and fp32 masters. The SDF MLP is always
    # fp32: its outputs feed finite-difference normals whose tap differences
    # are ~1e-3, and bf16 input rounding was measured to corrupt the normals
    # by 5.6 deg mean / 16 deg max (catastrophic cancellation).
    mlp_dtype: str = "float32"

    @property
    def encoder_dim(self) -> int:
        if self.encoder == "hashgrid":
            return self.grid.output_dim
        return self.pyramid.output_dim

    @property
    def sdf_in_dim(self) -> int:
        return self.encoder_dim + (3 if self.include_input else 0)

    @property
    def color_in_dim(self) -> int:
        # [x, (sh(d)), normal, geo_feat] (reference: models/instant_nsr.py:564-569)
        d = self.geo_feat_dim + 6
        if self.use_viewdirs:
            d += self.sh_degree**2
        return d


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Render-step hyperparameters (reference: models/instant_nsr.py:133,358)."""

    num_steps: int = 64
    upsample_steps: int = 64
    upsample_round: int = 16  # importance samples added per round
    bound: float = 1.6
    perturb: bool = False
    cos_anneal_ratio: float = 1.0
    normal_epsilon_ratio: float = 0.0
    curvature_loss: bool = False
    # normal estimator: "fd7" = reference central differences (parity),
    # "fd4" = tetrahedral stencil, "analytic" = exact forward-mode gradient
    # (1 encoder pass instead of 7 — the fast option; see field_sdf_grad)
    normal_mode: str = "fd7"

    @property
    def total_steps(self) -> int:
        return self.num_steps + self.upsample_steps


# ---------------------------------------------------------------------------
# Parameter init / MLP forward
# ---------------------------------------------------------------------------


def _weight_norm_apply(layer: dict) -> jnp.ndarray:
    """w = g * v / ||v||_row, rows = output channels (torch weight_norm dim=0)."""
    v = layer["v"]
    norm = jnp.linalg.norm(v, axis=1, keepdims=True)
    return v * (layer["g"][:, None] / (norm + 1e-12))


def init_field_params(key: jax.Array, cfg: FieldConfig) -> dict:
    """Geometric init + weight norm (reference: models/instant_nsr.py:522-589)."""
    keys = jax.random.split(key, 16)
    kit = iter(keys)

    sdf_layers = []
    for l in range(cfg.num_layers):
        in_dim = cfg.sdf_in_dim if l == 0 else cfg.hidden_dim
        out_dim = (
            1 + cfg.geo_feat_dim if l == cfg.num_layers - 1 else cfg.hidden_dim
        )
        if l == cfg.num_layers - 1:
            v = np.sqrt(np.pi) / np.sqrt(in_dim) + 1e-4 * jax.random.normal(
                next(kit), (out_dim, in_dim)
            )
        elif l == 0 and cfg.include_input:
            v_x = jax.random.normal(next(kit), (out_dim, 3)) * (
                np.sqrt(2.0) / np.sqrt(out_dim)
            )
            v = jnp.concatenate([v_x, jnp.zeros((out_dim, in_dim - 3))], axis=1)
        else:
            v = jax.random.normal(next(kit), (out_dim, in_dim)) * (
                np.sqrt(2.0) / np.sqrt(out_dim)
            )
        g = jnp.linalg.norm(v, axis=1)
        # avoid zero-norm rows when the encoding block is zero-initialized
        g = jnp.maximum(g, 1e-8)
        sdf_layers.append({"v": v.astype(jnp.float32), "g": g.astype(jnp.float32), "b": jnp.zeros((out_dim,), jnp.float32)})

    color_layers = []
    for l in range(cfg.num_layers_color):
        in_dim = cfg.color_in_dim if l == 0 else cfg.hidden_dim_color
        out_dim = 3 if l == cfg.num_layers_color - 1 else cfg.hidden_dim_color
        bound = 1.0 / np.sqrt(in_dim)
        v = jax.random.uniform(next(kit), (out_dim, in_dim), minval=-bound, maxval=bound)
        g = jnp.linalg.norm(v, axis=1)
        color_layers.append({"v": v.astype(jnp.float32), "g": g.astype(jnp.float32)})

    params = {
        "sdf": sdf_layers,
        "color": color_layers,
        "variance": jnp.asarray(cfg.variance_init, jnp.float32),
    }
    if cfg.encoder == "hashgrid":
        params["table"] = init_hash_table(next(kit), cfg.grid)
    else:
        params.update(init_pyramid_params(next(kit), cfg.pyramid))
    return params


def _softplus100(x: jnp.ndarray) -> jnp.ndarray:
    """Softplus with beta=100 (reference: models/instant_nsr.py:591)."""
    return jax.nn.softplus(x * 100.0) / 100.0


def _safe_norm(x: jnp.ndarray, axis=-1, keepdims=True) -> jnp.ndarray:
    """sqrt(sum(x^2) + eps): unlike linalg.norm, its gradient is finite at
    x == 0 (which occurs in practice — bf16-quantized tables make the FD
    stencil exactly flat at init, and linalg.norm's 0/0 backward NaNs the
    whole training step)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + 1e-12)


def encode_position(
    params: dict, x: jnp.ndarray, cfg: FieldConfig, bound: float, packed: dict | None = None
) -> jnp.ndarray:
    """Spatial encoding through the configured encoder."""
    if cfg.encoder == "hashgrid":
        cells = packed.get("dense_cells") if isinstance(packed, dict) else None
        return hash_encode(
            params["table"], x, cfg.grid, size=bound, packed_cells=cells
        )
    if packed is None:
        packed = materialize_field_tables(params, cfg)
    return pyramid_encode(packed, x, cfg.pyramid, size=bound)


def materialize_field_tables(params: dict, cfg: FieldConfig) -> dict | None:
    """Build per-step packed lookup tables. Call once per render/train step
    and pass down via FieldFns.

    * pyramid encoder: the cell-packed grid/plane tables (bf16 by default);
    * hashgrid: cell-packed tables for the DENSE levels (one gather instead
      of 8 per point per level, ops.hash_encoder.pack_dense_cells); the
      build touches each dense cell once (~360k rows at the default spec) —
      negligible against the ~131k gathers PER RAY of the 64+64 fd7
      pipeline it accelerates."""
    if cfg.encoder == "hashgrid":
        from avatarcraft_tpu.ops.hash_encoder import pack_dense_cells

        return {"dense_cells": pack_dense_cells(params["table"], cfg.grid)}
    packed = materialize_packed(params, cfg.pyramid)
    dt = jnp.dtype(cfg.packed_dtype)
    return jax.tree_util.tree_map(lambda t: t.astype(dt), packed)


def forward_sdf(
    params: dict, x: jnp.ndarray, cfg: FieldConfig, bound: float, packed: dict | None = None
) -> jnp.ndarray:
    """[N,3] -> [N, 1+geo_feat_dim]; h = [x, enc(x)] through the SDF MLP
    (reference: models/instant_nsr.py:627-642)."""
    h = encode_position(params, x, cfg, bound, packed).astype(jnp.float32)
    if cfg.include_input:
        h = jnp.concatenate([x, h], axis=-1)
    n = len(params["sdf"])
    # fp32 always: bf16 inputs here corrupt FD normals (see FieldConfig)
    for l, layer in enumerate(params["sdf"]):
        w = _weight_norm_apply(layer)
        h = h @ w.T + layer["b"]
        if l != n - 1:
            h = _softplus100(h)
    return h


def forward_color(
    params: dict,
    x: jnp.ndarray,
    d: jnp.ndarray,
    normal: jnp.ndarray,
    geo_feat: jnp.ndarray,
    cfg: FieldConfig,
) -> jnp.ndarray:
    """[x, (sh(d)), n, geo_feat] -> rgb in [0,1]
    (reference: models/instant_nsr.py:644-663)."""
    if cfg.use_viewdirs:
        d_enc = sh_encode(d, cfg.sh_degree)
        h = jnp.concatenate([x, d_enc, normal, geo_feat], axis=-1)
    else:
        h = jnp.concatenate([x, normal, geo_feat], axis=-1)
    n = len(params["color"])
    mdt = jnp.dtype(cfg.mlp_dtype)
    for l, layer in enumerate(params["color"]):
        w = _weight_norm_apply(layer)
        h = jnp.dot(h.astype(mdt), w.T.astype(mdt), preferred_element_type=jnp.float32)
        if l != n - 1:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h)


def forward_variance(params: dict) -> jnp.ndarray:
    """inv_s = exp(10 * v), clipped (reference: models/instant_nsr.py:665-667,720-726)."""
    return jnp.clip(jnp.exp(params["variance"] * 10.0), 1e-6, 1e6)


def density(params: dict, x: jnp.ndarray, cfg: FieldConfig, bound: float) -> jnp.ndarray:
    """SDF value only, [N] (reference: models/instant_nsr.py:669-681)."""
    return forward_sdf(params, x, cfg, bound)[..., 0]


_FD_OFFSETS = np.array(
    [
        [1, 0, 0],
        [0, 1, 0],
        [0, 0, 1],
        [-1, 0, 0],
        [0, -1, 0],
        [0, 0, -1],
    ],
    dtype=np.float32,
)


def sdf_and_gradient(
    params: dict, x: jnp.ndarray, cfg: FieldConfig, bound: float, epsilon: float
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One batched forward for SDF(+features) and 6-point FD gradient.

    Returns (sdf [N,1], geo_feat [N,F], grad [N,3]). Semantics follow the
    reference finite-difference normal approximator
    (models/instant_nsr.py:687-704) but all 7 evaluations run as a single
    [7N, 3] network call.
    """
    N = x.shape[0]
    offs = jnp.asarray(_FD_OFFSETS) * epsilon  # [6,3]
    stenciled = jnp.clip(x[None, :, :] + offs[:, None, :], -bound, bound)  # [6,N,3]
    all_pts = jnp.concatenate([x[None], stenciled], axis=0).reshape(7 * N, 3)
    out = forward_sdf(params, all_pts, cfg, bound)  # [7N, 1+F]
    out = out.reshape(7, N, -1)
    sdf = out[0, :, :1]
    geo_feat = out[0, :, 1:]
    d_pos = out[1:4, :, 0]  # [3,N]
    d_neg = out[4:7, :, 0]
    grad = (0.5 * (d_pos - d_neg) / epsilon).T  # [N,3]
    return sdf, geo_feat, grad


# ---------------------------------------------------------------------------
# Importance upsampling (reference: models/instant_nsr.py:410-475)
# ---------------------------------------------------------------------------


def up_sample(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    sdf: jnp.ndarray,
    n_importance: int,
    inv_s: float,
) -> jnp.ndarray:
    """NeuS SDF-guided importance sampling at a fixed inv_s."""
    B, T = z_vals.shape
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    radius = jnp.linalg.norm(pts, axis=-1)
    inside_sphere = (radius[:, :-1] < 1.0) | (radius[:, 1:] < 1.0)

    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)

    # use min(cos, prev_cos) for robustness (models/instant_nsr.py:442-445)
    prev_cos = jnp.concatenate([jnp.zeros((B, 1), cos_val.dtype), cos_val[:, :-1]], axis=-1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere.astype(cos_val.dtype)

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((B, 1), alpha.dtype), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1,
    )[:, :-1]
    weights = alpha * trans
    return jax.lax.stop_gradient(sample_pdf(z_vals, weights, n_importance, det=True))


def cat_z_vals(
    sdf_fn,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    new_z_vals: jnp.ndarray,
    sdf: jnp.ndarray,
    bound: float,
    last: bool,
    warp=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Merge-sort new z values in; evaluate SDF at the new points unless last.

    ``sdf_fn``: [M,3] -> [M, 1+F]. ``warp``: optional posed->canonical
    transform applied to the new sample points before evaluation.
    """
    B, T = z_vals.shape
    n_new = new_z_vals.shape[1]
    z_cat = jnp.concatenate([z_vals, new_z_vals], axis=-1)
    z_sorted, order = jax.lax.sort_key_val(
        z_cat, jnp.broadcast_to(jnp.arange(T + n_new), z_cat.shape)
    )
    if last:
        return z_sorted, sdf
    pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z_vals[..., None]
    if warp is not None:
        pts, _, _ = warp(pts)
    pts = jnp.clip(pts, -bound, bound)
    new_sdf = jax.lax.stop_gradient(
        sdf_fn(pts.reshape(-1, 3))[:, 0]
    ).reshape(B, n_new)
    sdf_cat = jnp.concatenate([sdf, new_sdf], axis=-1)
    sdf_sorted = jnp.take_along_axis(sdf_cat, order, axis=-1)
    return z_sorted, sdf_sorted


# ---------------------------------------------------------------------------
# The render core (reference: models/instant_nsr.py:133-299)
# ---------------------------------------------------------------------------

WarpFn = Callable[[jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class FieldFns:
    """Injectable field evaluation, letting the same render core serve the
    hash-grid network, the legacy freq-NeuS network, or analytic test fields.

    sdf:   [M,3] -> [M, 1+F] (sdf value + geometry features)
    color: (x [M,3], d [M,3], n [M,3], feat [M,F]) -> [M,3]
    inv_s: () -> scalar
    """

    sdf: Callable[[jnp.ndarray], jnp.ndarray]
    color: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
    inv_s: Callable[[], jnp.ndarray]


def network_field_fns(params: dict, fcfg: FieldConfig, bound: float) -> FieldFns:
    # pyramid encoder: pack the lookup tables ONCE for all evaluations of
    # this render/train step (coarse, upsample rounds, final + FD stencil)
    packed = materialize_field_tables(params, fcfg)
    return FieldFns(
        sdf=lambda x: forward_sdf(params, x, fcfg, bound, packed),
        color=lambda x, d, n, f: forward_color(params, x, d, n, f, fcfg),
        inv_s=lambda: forward_variance(params),
    )


def _field_sdf_and_gradient(
    field: FieldFns, x: jnp.ndarray, bound: float, epsilon: float
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched 7-point evaluation through an arbitrary FieldFns."""
    N = x.shape[0]
    offs = jnp.asarray(_FD_OFFSETS) * epsilon
    stenciled = jnp.clip(x[None, :, :] + offs[:, None, :], -bound, bound)
    all_pts = jnp.concatenate([x[None], stenciled], axis=0).reshape(7 * N, 3)
    out = field.sdf(all_pts).reshape(7, N, -1)
    sdf = out[0, :, :1]
    geo_feat = out[0, :, 1:]
    grad = (0.5 * (out[1:4, :, 0] - out[4:7, :, 0]) / epsilon).T
    return sdf, geo_feat, grad


def _field_sdf_and_gradient_analytic(
    field: FieldFns, x: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact SDF spatial gradient via forward-mode autodiff.

    One primal evaluation (jax.linearize) + three tangent passes. The tangent
    of the encoder's trilinear interpolation reuses the SAME gathered corner
    features as the primal — zero extra table gathers versus the 6 extra full
    encoder passes of the FD7 stencil, which dominate the reference-parity
    render cost (the encoder is gather-bound, docs/PERFORMANCE.md). The
    gradient is exact for the piecewise-trilinear hash field instead of the
    reference's eps-smoothed finite differences
    (models/instant_nsr.py:687-704); rendered frames agree to ~O(eps^2).
    """
    out, f_jvp = jax.linearize(field.sdf, x)
    sdf = out[:, :1]
    geo_feat = out[:, 1:]
    cols = [
        f_jvp(jnp.broadcast_to(jnp.eye(3, dtype=x.dtype)[d], x.shape))[:, 0]
        for d in range(3)
    ]
    return sdf, geo_feat, jnp.stack(cols, axis=-1)


def field_sdf_grad(
    field: FieldFns, x: jnp.ndarray, bound: float, epsilon: float, mode: str
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(sdf [N,1], geo_feat [N,F], grad [N,3]) under the chosen normal mode.

    * "fd7": center + 6-tap central differences — bitwise the reference
      semantics (models/instant_nsr.py:687-704).
    * "fd4": tetrahedral 4-tap stencil (sdf/features are the stencil mean).
    * "analytic": exact forward-mode gradient, 1 encoder pass (fastest).
    """
    if mode == "fd7":
        return _field_sdf_and_gradient(field, x, bound, epsilon)
    if mode == "fd4":
        return sdf_tetra(field, x, bound, epsilon)
    if mode == "analytic":
        return _field_sdf_and_gradient_analytic(field, x)
    raise ValueError(f"unknown normal_mode: {mode!r}")


def render_rays(
    params: dict,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    fcfg: FieldConfig,
    rcfg: RenderConfig,
    bg_color: jnp.ndarray | float = 1.0,
    near_far: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    warp_fn: WarpFn | None = None,
    field: FieldFns | None = None,
) -> dict:
    """Render a batch of rays through the NeuS field. Fully static shapes.

    Args:
        rays_o, rays_d: [N, 3].
        key: PRNG key (used when rcfg.perturb).
        bg_color: scalar or [N, 3] background.
        near_far: optional ([N,1], [N,1]) override (mesh-guided bounds for
            posed rendering; reference: models/instant_nsr.py:147-153).
        warp_fn: optional posed->canonical warp applied to sample points
            ([N,T,3] -> (can_pts [N,T,3], can_dirs [N,T,3], mask [N,T])).

    Returns dict with rgb [N,3], depth [N], weights [N,T], weight_sum [N,1],
    normal [N,3], gradient_error scalar, z_vals [N,T], pts_alpha [N,T],
    pts_color [N,T,3].
    """
    N = rays_o.shape[0]
    bound = rcfg.bound
    num_steps = rcfg.num_steps
    if field is None:
        field = network_field_fns(params, fcfg, bound)

    near, far = near_far_from_bound(rays_o, rays_d, bound, kind="cube")
    if near_far is not None:
        near_g, far_g = near_far
        near = jnp.where(jnp.isinf(near_g), near, near_g)
        far = jnp.where(jnp.isinf(far_g), far, far_g)

    key, k_perturb = jax.random.split(key)
    z_vals = stratified_z_vals(
        near, far, num_steps, perturb=rcfg.perturb, key=k_perturb
    )
    sample_dist = (far - near) / num_steps  # [N,1]

    def warp(pts_flat_shape_NT3):
        """Apply posed->canonical warp; identity when warp_fn is None."""
        if warp_fn is None:
            return pts_flat_shape_NT3, None, None
        can_pts, can_dirs, mask = warp_fn(pts_flat_shape_NT3)
        return can_pts, can_dirs, mask

    # ---- coarse points + importance upsampling (no grad) ----
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]  # [N,T,3]
    pts, _, _ = warp(pts)
    pts = jnp.clip(pts, -bound, bound)

    if rcfg.upsample_steps > 0:
        sdf_coarse = jax.lax.stop_gradient(
            field.sdf(pts.reshape(-1, 3))[:, 0]
        ).reshape(N, num_steps)
        z_cur, sdf_cur = z_vals, sdf_coarse
        n_rounds = rcfg.upsample_steps // rcfg.upsample_round
        for i in range(n_rounds):
            # NOTE: upsampling importance-samples against the *canonical-space*
            # SDF along the posed-space ray; for the warped path this matches
            # the reference behavior (upsample uses unwarped z-vals & sdf
            # evaluated at warped points, models/instant_nsr.py:175-187).
            new_z = up_sample(
                rays_o, rays_d, z_cur, sdf_cur, rcfg.upsample_round, 64 * 2**i
            )
            z_cur, sdf_cur = cat_z_vals(
                field.sdf, rays_o, rays_d, z_cur, new_z, sdf_cur,
                bound, last=(i + 1 == n_rounds),
                warp=None if warp_fn is None else warp,
            )
        z_vals = z_cur

    total_steps = rcfg.total_steps

    # ---- midpoint resampling (reference: models/instant_nsr.py:190-208) ----
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.broadcast_to(sample_dist, (N, 1))], axis=-1
    )  # [N,T]
    z_mid = jnp.concatenate(
        [z_vals[:, :-1] + 0.5 * deltas[:, :-1], z_vals[:, -1:]], axis=-1
    )
    new_pts = rays_o[:, None, :] + rays_d[:, None, :] * z_mid[..., None]  # [N,T,3]

    alpha_mask = None
    dirs = jnp.broadcast_to(rays_d[:, None, :], new_pts.shape)
    new_pts, can_dirs, alpha_mask = warp(new_pts)
    new_pts = jnp.clip(new_pts, -bound, bound)

    # ---- the single big network evaluation ----
    eps = 0.005 * (1.0 - rcfg.normal_epsilon_ratio)
    flat_pts = new_pts.reshape(-1, 3)
    sdf, geo_feat, gradient = field_sdf_grad(
        field, flat_pts, bound, eps, rcfg.normal_mode
    )
    normal = gradient / (1e-5 + _safe_norm(gradient))

    flat_dirs = dirs.reshape(-1, 3)
    color = field.color(flat_pts, flat_dirs, normal, geo_feat)

    inv_s = field.inv_s()

    true_cos = jnp.sum(flat_dirs * normal, axis=-1, keepdims=True)
    # softplus-annealed cos (reference: models/instant_nsr.py:231-233)
    iter_cos = -(
        _softplus100(-true_cos * 0.5 + 0.5) * (1.0 - rcfg.cos_anneal_ratio)
        + _softplus100(-true_cos) * rcfg.cos_anneal_ratio
    )

    flat_deltas = deltas.reshape(-1, 1)
    est_next = sdf + iter_cos * flat_deltas * 0.5
    est_prev = sdf - iter_cos * flat_deltas * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)

    # NeuS eq. 13 (reference: models/instant_nsr.py:243)
    alpha = jnp.clip(
        (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0
    ).reshape(N, total_steps)

    if alpha_mask is not None:
        alpha = alpha * alpha_mask.reshape(N, total_steps).astype(alpha.dtype)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((N, 1), alpha.dtype), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1,
    )[:, :-1]
    weights = alpha * trans  # [N,T]
    weights_sum = weights.sum(axis=-1, keepdims=True)

    color = color.reshape(N, total_steps, 3)
    image = (color * weights[:, :, None]).sum(axis=1)

    normal_map = (normal.reshape(N, total_steps, 3) * weights[:, :, None]).sum(axis=1)

    ori_z = jnp.clip((z_vals - near) / (far - near), 0.0, 1.0)
    depth = jnp.sum(weights * ori_z, axis=-1)

    # eikonal over the relaxed inside-sphere region
    # (reference: models/instant_nsr.py:266-272)
    pts_norm = jnp.linalg.norm(flat_pts, axis=-1).reshape(N, total_steps)
    relax_inside = jax.lax.stop_gradient((pts_norm < 1.2).astype(jnp.float32))
    grad_err = (_safe_norm(gradient.reshape(N, total_steps, 3), keepdims=False) - 1.0) ** 2
    gradient_error = (relax_inside * grad_err).sum() / (relax_inside.sum() + 1e-5)

    curvature_error = jnp.asarray(0.0)
    if rcfg.curvature_loss:
        key, k_curv = jax.random.split(key)
        rand_vec = 2.0 * jax.random.normal(k_curv, normal.shape) - 1.0
        rand_vec = rand_vec / (
            1e-5 + jnp.linalg.norm(rand_vec, axis=-1, keepdims=True)
        )
        perturbed = flat_pts + jnp.cross(normal, rand_vec) * 0.01 * (
            1.0 - rcfg.normal_epsilon_ratio
        )
        _, _, pgrad = _field_sdf_and_gradient(field, perturbed, bound, eps)
        pnormal = pgrad / (1e-5 + _safe_norm(pgrad))
        cerr = (jnp.sum(normal * pnormal, axis=-1) - 1.0) ** 2
        curvature_error = (relax_inside * cerr.reshape(N, total_steps)).sum() / (
            relax_inside.sum() + 1e-5
        )

    bg = bg_color if not isinstance(bg_color, (int, float)) else jnp.asarray(bg_color)
    image = image + (1.0 - weights_sum) * bg

    return {
        "rgb": image,
        "depth": depth,
        "weights": weights,
        "weight_sum": weights_sum,
        "normal": normal_map,
        "gradient_error": gradient_error,
        "curvature_error": curvature_error,
        "pts_color": color,
        "pts_alpha": alpha,
        "z_vals": z_vals,
    }


def render_rays_chunked(
    params: dict,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    fcfg: FieldConfig,
    rcfg: RenderConfig,
    bg_color: jnp.ndarray | float = 1.0,
    chunk: int = 4096,
    field: FieldFns | None = None,
) -> dict:
    """Render an arbitrary number of rays in fixed-size chunks via lax.map.

    Replaces the reference's Python chunk loop
    (utils/render_utils.py:514-600) with a single compiled program; rays are
    padded to a multiple of ``chunk``.
    """
    n = rays_o.shape[0]
    n_pad = (-n) % chunk
    rays_o_p = jnp.concatenate([rays_o, jnp.ones((n_pad, 3), rays_o.dtype)], axis=0)
    rays_d_p = jnp.concatenate(
        [rays_d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], rays_d.dtype), (n_pad, 3))],
        axis=0,
    )
    n_chunks = (n + n_pad) // chunk
    keys = jax.random.split(key, n_chunks)

    bg_is_array = not isinstance(bg_color, (int, float))
    if bg_is_array:
        bg_p = jnp.concatenate([bg_color, jnp.ones((n_pad, 3), rays_o.dtype)], axis=0)
        bg_p = bg_p.reshape(n_chunks, chunk, 3)

    def body(args):
        if bg_is_array:
            ro, rd, k, bg = args
        else:
            ro, rd, k = args
            bg = bg_color
        out = render_rays(params, ro, rd, k, fcfg, rcfg, bg, field=field)
        return {
            "rgb": out["rgb"],
            "depth": out["depth"],
            "weight_sum": out["weight_sum"],
            "normal": out["normal"],
            "gradient_error": out["gradient_error"],
        }

    xs = (
        (
            rays_o_p.reshape(n_chunks, chunk, 3),
            rays_d_p.reshape(n_chunks, chunk, 3),
            keys,
            bg_p,
        )
        if bg_is_array
        else (
            rays_o_p.reshape(n_chunks, chunk, 3),
            rays_d_p.reshape(n_chunks, chunk, 3),
            keys,
        )
    )
    out = jax.lax.map(body, xs)
    return {
        "rgb": out["rgb"].reshape(-1, 3)[:n],
        "depth": out["depth"].reshape(-1)[:n],
        "weight_sum": out["weight_sum"].reshape(-1, 1)[:n],
        "normal": out["normal"].reshape(-1, 3)[:n],
        "gradient_error": out["gradient_error"].mean(),
    }


# ---------------------------------------------------------------------------
# Occupancy-grid fast path (makes the reference's dormant CUDA marcher real;
# SURVEY.md 2.3 / build-plan step 7)
# ---------------------------------------------------------------------------

_TETRA_DIRS = np.array(
    [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], dtype=np.float32
)


def sdf_tetra(
    field: FieldFns, x: jnp.ndarray, bound: float, epsilon: float
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """4-tap tetrahedral stencil: (sdf [N,1], feat [N,F], grad [N,3]).

    grad = sum_i v_i f(x + eps v_i) / (4 eps); sdf/features are the stencil
    mean (O(eps^2) from the center value). 4 network evals instead of the
    reference's 7 (central differences + center, models/instant_nsr.py:687-704).
    """
    N = x.shape[0]
    dirs = jnp.asarray(_TETRA_DIRS)
    pts = jnp.clip(x[None, :, :] + epsilon * dirs[:, None, :], -bound, bound)
    out = field.sdf(pts.reshape(4 * N, 3)).reshape(4, N, -1)
    sdf = out[..., :1].mean(axis=0)
    feat = out[..., 1:].mean(axis=0)
    grad = jnp.einsum("sc,sn->nc", dirs, out[..., 0]) / (4.0 * epsilon)
    return sdf, feat, grad


@dataclasses.dataclass(frozen=True)
class FastRenderConfig:
    """Occupancy-guided render: M uniform probes -> K field samples."""

    n_probes: int = 192
    k_samples: int = 32
    bound: float = 1.6
    fd_epsilon: float = 0.005
    # global sample budget: evaluate the field on at most this many samples
    # across the whole batch (adaptive K -- rays only spend what the grid
    # marks occupied; the CUDA marcher's compaction, reference:
    # raymarching.cu:156-221). 0 = off (all N*K slots evaluated).
    sample_budget: int = 0
    # absolute density cutoff, applied as min(occ_threshold, mean(grid)) --
    # the reference marcher's rule (raymarching.cu:21,75: DENSITY_THRESH=10)
    occ_threshold: float = 10.0
    cos_anneal_ratio: float = 1.0
    # normal estimator ("fd4" | "fd7" | "analytic"); analytic reuses the
    # primal's table gathers via forward-mode autodiff — 1 encoder pass
    normal_mode: str = "fd4"


def _probe_occupied(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    cfg: FastRenderConfig,
    density_grid: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Probe pass shared by render_rays_fast / count_fast_samples: M uniform
    probe depths per ray + their FINE-grid occupancy (bool), looked up
    through a bit-packed uint32 table (fast gather tier, exact selection)."""
    from avatarcraft_tpu.ops.occupancy import (
        occupancy_lookup_bits,
        pack_occupancy_bits,
    )

    t = jnp.linspace(0.0, 1.0, cfg.n_probes, dtype=rays_o.dtype)
    z_probe = near + (far - near) * t[None, :]
    p_probe = rays_o[:, None, :] + rays_d[:, None, :] * z_probe[..., None]
    thresh = jnp.minimum(cfg.occ_threshold, jnp.mean(density_grid))
    packed = pack_occupancy_bits(density_grid, thresh)
    occupied = occupancy_lookup_bits(
        packed, density_grid.shape[0], p_probe, cfg.bound
    )
    return z_probe, occupied


def count_fast_samples(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cfg: FastRenderConfig,
    density_grid: jnp.ndarray,
) -> jnp.ndarray:
    """Number of grid-occupied samples the fast path would evaluate for this
    ray batch — the probe+selection stage only, no field evals. Used to
    derive ``cfg.sample_budget`` from the actual scene/grid instead of a
    hand-measured constant (bench.py), and as the zero-clip check on every
    published render (VERDICT r3 Next #1a)."""
    from avatarcraft_tpu.ops.occupancy import select_occupied_samples

    near, far = near_far_from_bound(rays_o, rays_d, cfg.bound, kind="cube")
    z_probe, occupied = _probe_occupied(rays_o, rays_d, near, far, cfg, density_grid)
    _, valid = select_occupied_samples(z_probe, occupied, cfg.k_samples, 0.5)
    return valid.sum()


def render_rays_fast(
    params: dict,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    fcfg: FieldConfig,
    cfg: FastRenderConfig,
    density_grid: jnp.ndarray,
    bg_color: jnp.ndarray | float = 1.0,
    field: FieldFns | None = None,
    near_far: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    warp_fn: WarpFn | None = None,
) -> dict:
    """Occupancy-culled NeuS render. Same compositing math as render_rays but
    the network only runs on K grid-occupied samples per ray (static shapes;
    the CUDA marcher's atomic compaction becomes evenly-spaced selection +
    optional global compaction).

    ``warp_fn``: posed->canonical warp for animation. The density grid must
    then be a POSED-space grid (ops.occupancy.voxelize_verts of the posed
    SMPL mesh); selected samples are warped before the field evaluates, and
    off-mesh samples are masked like the reference's alpha masking
    (models/instant_nsr.py:245-248). With a sample budget, the (expensive
    kNN) warp runs only on the compacted survivors."""
    from avatarcraft_tpu.ops.occupancy import (
        compact_indices,
        scatter_to_flat,
        select_occupied_samples,
    )

    N = rays_o.shape[0]
    bound = cfg.bound
    if field is None:
        field = network_field_fns(params, fcfg, bound)

    near, far = near_far_from_bound(rays_o, rays_d, bound, kind="cube")
    if near_far is not None:
        ng, fg = near_far
        near = jnp.where(jnp.isinf(ng), near, ng)
        far = jnp.where(jnp.isinf(fg), far, fg)

    # probe pass: cheap bit-packed fine-grid occupancy lookups, no network
    z_probe, occupied = _probe_occupied(rays_o, rays_d, near, far, cfg, density_grid)
    z_sel, valid = select_occupied_samples(z_probe, occupied, cfg.k_samples, 0.5)

    # field pass on the K survivors
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_sel[..., None]
    pts = jnp.clip(pts, -bound, bound)
    flat = pts.reshape(-1, 3)
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape).reshape(-1, 3)
    T = flat.shape[0]

    if cfg.sample_budget and cfg.sample_budget < T:
        # adaptive K: the field only runs on the globally-compacted valid
        # samples; results scatter back to the padded [N, K] layout
        sel, kept = compact_indices(valid.reshape(-1), cfg.sample_budget)
        n_kept = kept.sum()
        flat_c, dirs_c = flat[sel], dirs[sel]
        if warp_fn is not None:
            # compacted points have no per-ray structure; warp as one
            # pseudo-ray (kNN/mask are per-point; canonical dirs are only
            # meaningful ray-wise and are not consumed by this path)
            wp, _, wm = warp_fn(flat_c[None])
            flat_c = jnp.clip(wp[0], -bound, bound)
            wmask_c = wm.reshape(-1, 1).astype(jnp.float32)
        sdf_c, feat_c, grad_c = field_sdf_grad(
            field, flat_c, bound, cfg.fd_epsilon, cfg.normal_mode
        )
        normal_c = grad_c / (1e-5 + _safe_norm(grad_c))
        color_c = field.color(flat_c, dirs_c, normal_c, feat_c)
        norm_c = jnp.linalg.norm(flat_c, axis=-1, keepdims=True)
        sdf = scatter_to_flat(sdf_c, sel, T, n_kept)
        grad = scatter_to_flat(grad_c, sel, T, n_kept)
        normal = scatter_to_flat(normal_c, sel, T, n_kept)
        color = scatter_to_flat(color_c, sel, T, n_kept)
        pts_norm_flat = scatter_to_flat(norm_c, sel, T, n_kept)[:, 0]
        valid = kept.reshape(N, cfg.k_samples)
        if warp_fn is not None:
            wmask_full = scatter_to_flat(wmask_c, sel, T, n_kept)[:, 0]
            valid = valid & (wmask_full.reshape(N, cfg.k_samples) > 0.5)
    else:
        if warp_fn is not None:
            wp, _, wm = warp_fn(pts)  # [N, K, 3] ray-structured
            flat = jnp.clip(wp.reshape(-1, 3), -bound, bound)
            valid = valid & wm.reshape(N, cfg.k_samples)
        sdf, feat, grad = field_sdf_grad(
            field, flat, bound, cfg.fd_epsilon, cfg.normal_mode
        )
        normal = grad / (1e-5 + _safe_norm(grad))
        color = field.color(flat, dirs, normal, feat)
        pts_norm_flat = jnp.linalg.norm(flat, axis=-1)
    inv_s = field.inv_s()

    # Invalid (unoccupied) slots sit after the valid ones but carry arbitrary
    # probe depths, so a raw diff would give the deepest valid sample a large
    # negative delta (zeroing its alpha). Any transition into an invalid slot
    # falls back to the probe spacing; the invalid slots' own alphas are
    # masked by `valid` below.
    spacing = (far - near) / cfg.n_probes
    diffs = jnp.where(valid[:, 1:], z_sel[:, 1:] - z_sel[:, :-1], spacing)
    deltas = jnp.concatenate([diffs, spacing], axis=-1)
    true_cos = jnp.sum(dirs * normal, axis=-1, keepdims=True)
    iter_cos = -(
        _softplus100(-true_cos * 0.5 + 0.5) * (1.0 - cfg.cos_anneal_ratio)
        + _softplus100(-true_cos) * cfg.cos_anneal_ratio
    )
    fd = deltas.reshape(-1, 1)
    prev_cdf = jax.nn.sigmoid((sdf - iter_cos * fd * 0.5) * inv_s)
    next_cdf = jax.nn.sigmoid((sdf + iter_cos * fd * 0.5) * inv_s)
    alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)
    alpha = alpha.reshape(N, cfg.k_samples) * valid.astype(alpha.dtype)

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((N, 1), alpha.dtype), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1,
    )[:, :-1]
    weights = alpha * trans
    weights_sum = weights.sum(axis=-1, keepdims=True)

    color = color.reshape(N, cfg.k_samples, 3)
    image = (color * weights[:, :, None]).sum(axis=1)
    normal_map = (normal.reshape(N, cfg.k_samples, 3) * weights[:, :, None]).sum(axis=1)
    depth = jnp.sum(weights * jnp.clip((z_sel - near) / (far - near), 0, 1), axis=-1)

    bg = bg_color if not isinstance(bg_color, (int, float)) else jnp.asarray(bg_color)
    image = image + (1.0 - weights_sum) * bg

    # eikonal over valid samples in the relaxed inside-sphere region
    pts_norm = pts_norm_flat.reshape(N, cfg.k_samples)
    relax = jax.lax.stop_gradient(
        ((pts_norm < 1.2) & valid).astype(jnp.float32)
    )
    gerr = (_safe_norm(grad.reshape(N, cfg.k_samples, 3), keepdims=False) - 1.0) ** 2
    gradient_error = (relax * gerr).sum() / (relax.sum() + 1e-5)

    return {
        "rgb": image,
        "depth": depth,
        "weights": weights,
        "weight_sum": weights_sum,
        "normal": normal_map,
        "gradient_error": gradient_error,
    }


# ---------------------------------------------------------------------------
# Geometry extraction (reference: models/instant_nsr.py:706-764)
# ---------------------------------------------------------------------------


def extract_sdf_grid(
    params: dict,
    fcfg: FieldConfig,
    bound: float,
    resolution: int,
    block: int = 128,
) -> np.ndarray:
    """Evaluate the SDF on a dense grid, blockwise on device -> host ndarray."""
    xs = np.linspace(-bound, bound, resolution, dtype=np.float32)
    out = np.empty((resolution,) * 3, dtype=np.float32)

    eval_fn = jax.jit(
        lambda pts: density(params, pts, fcfg, bound), static_argnums=()
    )
    for i0 in range(0, resolution, block):
        xi = xs[i0 : i0 + block]
        gx, gy, gz = np.meshgrid(xi, xs, xs, indexing="ij")
        pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        vals = np.asarray(eval_fn(jnp.asarray(pts)))
        out[i0 : i0 + block] = vals.reshape(len(xi), resolution, resolution)
    return out


def extract_geometry(
    params: dict,
    fcfg: FieldConfig,
    bound: float,
    resolution: int,
    threshold: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Marching cubes over -SDF (host), matching the reference mesh export."""
    u = -extract_sdf_grid(params, fcfg, bound, resolution)
    from avatarcraft_tpu.utils.marching_cubes import marching_cubes

    verts, tris = marching_cubes(u, threshold)
    verts = verts / (resolution - 1.0) * (2 * bound) - bound
    return verts.astype(np.float32), tris
