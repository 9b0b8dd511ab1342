"""Posed-space -> canonical-space sample warping, fully on-device.

The reference ships every sample batch to the CPU and runs libigl
point-to-mesh queries inside the render loop
(reference: utils/ray_utils.py:62-90 called from models/instant_nsr.py:166-172
-- a device->host->device round trip per batch). The TPU-native re-design:

1. **nearest vertices** -- a [block, V] squared-distance matrix computed as
   ``|p|^2 + |v|^2 - 2 p.v`` (one MXU matmul against the 6890 SMPL vertices),
   top-k over the vertex axis;
2. **candidate faces** -- a static per-topology vertex->incident-face table
   (host-precomputed once) gathers <= k*max_valence candidate triangles;
3. **exact point-triangle closest point** (Ericson's region algorithm,
   vectorized) over the candidates, min-reduced -> closest face, closest
   point, barycentric coordinates. Near-exact equivalent of igl's global
   closest-point query: it can only differ when the true closest face has all
   three corners outside the k nearest vertices, which does not occur for
   k >= 4 on SMPL-scale meshes of well-shaped triangles;
4. **transform blend** -- barycentric blend of the per-vertex 4x4 forward
   transforms, batched 4x4 inverse, applied to homogeneous points
   (reference math: utils/ray_utils.py:76-82);
5. canonical ray directions re-derived by finite differences along the ray
   (reference: utils/ray_utils.py:86-88) and the ``dist^2 < threshold`` alpha
   mask (reference: utils/ray_utils.py:74).

Everything is static-shape and differentiable; ``lax.map`` blocks the point
axis so the distance matrix stays in a ~100 MB envelope.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.constants import DEFAULT_GEO_THRESH


def build_vertex_face_table(faces: np.ndarray, n_verts: int) -> np.ndarray:
    """[V, K] face indices incident to each vertex, padded with the vertex's
    first face (so gathers stay in-bounds and duplicates are harmless)."""
    faces = np.asarray(faces)
    incident: list[list[int]] = [[] for _ in range(n_verts)]
    for f_idx, tri in enumerate(faces[:, :3]):
        for v in tri:
            incident[int(v)].append(f_idx)
    K = max((len(l) for l in incident), default=1)
    table = np.zeros((n_verts, K), np.int32)
    for v, l in enumerate(incident):
        if not l:
            l = [0]
        table[v] = (l + [l[0]] * K)[:K]
    return table


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WarpData:
    """Per-frame warp inputs (a pytree; build once per animation frame)."""

    verts: jnp.ndarray  # [V, 3] posed vertices (world space)
    faces: jnp.ndarray  # [F, 3] int32
    Ts: jnp.ndarray  # [V(+J), 4, 4] per-vertex canonical->posed transforms
    vert2face: jnp.ndarray  # [V, K] int32 incident-face table

    @classmethod
    def create(cls, verts, faces, Ts) -> "WarpData":
        faces = np.asarray(faces)[:, :3].astype(np.int32)
        table = build_vertex_face_table(faces, np.asarray(verts).shape[0])
        return cls(
            verts=jnp.asarray(verts, jnp.float32),
            faces=jnp.asarray(faces),
            Ts=jnp.asarray(Ts, jnp.float32),
            vert2face=jnp.asarray(table),
        )


def closest_point_on_triangles(
    p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact closest point on triangle(s) (Ericson, RTCD 5.1.5), vectorized.

    p, a, b, c: broadcastable [..., 3]. Returns (closest [..., 3],
    barycentric [..., 3] = (u, v, w) with closest = u*a + v*b + w*c).
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    eps = 1e-12
    # interior (default)
    denom = va + vb + vc
    v_in = vb / jnp.where(jnp.abs(denom) < eps, 1.0, denom)
    w_in = vc / jnp.where(jnp.abs(denom) < eps, 1.0, denom)
    v, w = v_in, w_in

    # edge BC region
    t_bc = (d4 - d3) / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) < eps, 1.0, (d4 - d3) + (d5 - d6))
    in_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    v = jnp.where(in_bc, 1.0 - t_bc, v)
    w = jnp.where(in_bc, t_bc, w)

    # edge AC region
    t_ac = d2 / jnp.where(jnp.abs(d2 - d6) < eps, 1.0, d2 - d6)
    in_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    v = jnp.where(in_ac, 0.0, v)
    w = jnp.where(in_ac, t_ac, w)

    # edge AB region
    t_ab = d1 / jnp.where(jnp.abs(d1 - d3) < eps, 1.0, d1 - d3)
    in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    v = jnp.where(in_ab, t_ab, v)
    w = jnp.where(in_ab, 0.0, w)

    # vertex regions (highest priority)
    in_c = (d6 >= 0) & (d5 <= d6)
    v = jnp.where(in_c, 0.0, v)
    w = jnp.where(in_c, 1.0, w)
    in_b = (d3 >= 0) & (d4 <= d3)
    v = jnp.where(in_b, 1.0, v)
    w = jnp.where(in_b, 0.0, w)
    in_a = (d1 <= 0) & (d2 <= 0)
    v = jnp.where(in_a, 0.0, v)
    w = jnp.where(in_a, 0.0, w)

    u = 1.0 - v - w
    closest = u[..., None] * a + v[..., None] * b + w[..., None] * c
    return closest, jnp.stack([u, v, w], axis=-1)


def _closest_face_block(
    pts: jnp.ndarray, data: WarpData, k_verts: int, tri_packed: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """For a [B,3] block: (dist2 [B], f_id [B], closest [B,3], bary [B,3]).

    ``tri_packed``: [F, 9] per-face corner coordinates packed into one wide
    row (hoisted out of the block loop), so fetching a candidate triangle is
    ONE 9-wide row gather instead of three narrow [V,3] gathers — gathers,
    not flops, dominate this stage (benchmarks/bench_warp_internals.py)."""
    verts = data.verts
    # [B, V] squared distances via one matmul
    d2 = (
        jnp.sum(pts**2, -1, keepdims=True)
        - 2.0 * pts @ verts.T
        + jnp.sum(verts**2, -1)[None, :]
    )
    _, knn_idx = jax.lax.top_k(-d2, k_verts)  # [B, k]

    cand = data.vert2face[knn_idx]  # [B, k, K]
    B = pts.shape[0]
    cand = cand.reshape(B, -1)  # [B, k*K] candidate faces (dupes ok)

    tri = tri_packed[cand].reshape(B, cand.shape[1], 3, 3)  # [B, C, 3, 3]
    closest, bary = closest_point_on_triangles(
        pts[:, None, :], tri[:, :, 0], tri[:, :, 1], tri[:, :, 2]
    )  # [B, C, 3], [B, C, 3]
    cd2 = jnp.sum((closest - pts[:, None, :]) ** 2, -1)  # [B, C]
    best = jnp.argmin(cd2, axis=-1)  # [B]
    take = lambda x: jnp.take_along_axis(
        x, best[:, None, None] if x.ndim == 3 else best[:, None], axis=1
    ).squeeze(1)
    return take(cd2[..., None]).squeeze(-1), take(cand[..., None]).squeeze(-1), take(closest), take(bary)


def warp_samples_to_canonical(
    pts: jnp.ndarray,
    data: WarpData,
    threshold: float = DEFAULT_GEO_THRESH,
    *,
    k_verts: int = 4,
    block: int = 4096,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Warp posed-space samples into the canonical field.

    Args:
        pts: [num_rays, num_samples, 3] posed-space points.
        data: WarpData for the current frame.
        threshold: squared-distance alpha-mask threshold
            (reference: utils/ray_utils.py:74 -- note the reference compares
            dist^2 against DEFAULT_GEO_THRESH=0.05 directly).

    Returns (can_pts [N,T,3], can_dirs [N,T,3], closest [N,T,3], mask [N,T]).
    """
    N, T, _ = pts.shape
    flat = pts.reshape(-1, 3)
    M = flat.shape[0]
    pad = (-M) % block
    flat_p = jnp.concatenate([flat, jnp.zeros((pad, 3), flat.dtype)], axis=0)

    # per-frame packed gathers, hoisted out of the block loop: one wide row
    # per face instead of narrow per-vertex fetches
    tri_packed = data.verts[data.faces.reshape(-1)].reshape(-1, 9)  # [F, 9]
    fn = partial(_closest_face_block, data=data, k_verts=k_verts,
                 tri_packed=tri_packed)
    d2, f_id, closest, bary = jax.lax.map(
        fn, flat_p.reshape(-1, block, 3)
    )
    d2 = d2.reshape(-1)[:M]
    f_id = f_id.reshape(-1)[:M]
    closest = closest.reshape(-1, 3)[:M]
    bary = bary.reshape(-1, 3)[:M]

    mask = d2 < threshold

    # barycentric blend of per-vertex transforms, then invert. The corner
    # transforms are packed [F, 3*16] so the per-sample fetch is one wide
    # row gather. Every T has bottom row [0, 0, 0, s] (rigid chains from
    # models/smpl.verts_transformations, possibly uniformly scaled by
    # SMPL_SCALE, reference: render_warp.py:200-204), so the blend does too,
    # and the homogeneous inverse-apply has the closed form
    #   (T^-1 [p;1])[:3] = A^-1 (p - t/s),  A = T[:3,:3], t = T[:3,3]
    # via the 3x3 cofactor inverse — batched jnp.linalg.inv (LU) was ~45%
    # of the whole warp cost on TPU (benchmarks/bench_warp_internals.py)
    T_packed = data.Ts[data.faces.reshape(-1)].reshape(-1, 48)  # [F, 48]
    corner_T = T_packed[f_id].reshape(M, 3, 4, 4)
    T_interp = jnp.sum(corner_T * bary[:, :, None, None], axis=1)  # [M,4,4]
    A = T_interp[:, :3, :3]
    s = T_interp[:, 3:4, 3]
    t = T_interp[:, :3, 3] / jnp.where(jnp.abs(s) < 1e-20, 1.0, s)
    r0, r1, r2 = A[:, 0], A[:, 1], A[:, 2]
    det = jnp.sum(r0 * jnp.cross(r1, r2), axis=-1, keepdims=True)
    inv_a = jnp.stack(
        [jnp.cross(r1, r2), jnp.cross(r2, r0), jnp.cross(r0, r1)], axis=-1
    ) / jnp.where(jnp.abs(det) < 1e-20, 1.0, det)[..., None]
    can = jnp.einsum("mij,mj->mi", inv_a, flat - t)

    can_pts = can.reshape(N, T, 3)
    closest = closest.reshape(N, T, 3)

    can_dirs = can_pts[:, 1:] - can_pts[:, :-1]
    can_dirs = jnp.concatenate([can_dirs, can_dirs[:, -1:]], axis=1)
    # sqrt(sum+eps): finite gradient when consecutive warped points coincide
    can_dirs = can_dirs / jnp.sqrt(
        jnp.sum(can_dirs * can_dirs, axis=2, keepdims=True) + 1e-12
    )
    return can_pts, can_dirs, closest, mask.reshape(N, T)


def make_warp_fn(data: WarpData, threshold: float = DEFAULT_GEO_THRESH, **kw):
    """Adapter for render_rays(warp_fn=...): [N,T,3] -> (pts, dirs, mask)."""

    def warp_fn(pts):
        can_pts, can_dirs, _, mask = warp_samples_to_canonical(
            pts, data, threshold, **kw
        )
        return can_pts, can_dirs, mask

    return warp_fn


def geometry_guided_near_far(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    verts: jnp.ndarray,
    geo_threshold: float = DEFAULT_GEO_THRESH,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-vertex-sphere slab test (reference: utils/ray_utils.py:277-294).

    Returns (near [N,1], far [N,1]); +-inf where the ray misses every sphere
    (callers fall back to the cube bounds, models/instant_nsr.py:152-153).
    """
    ov = verts[None, :, :] - rays_o[:, None, :]  # [N, V, 3]
    z0 = jnp.einsum("nvc,nc->nv", ov, rays_d)
    disc = geo_threshold**2 - (jnp.sum(ov * ov, -1) - z0**2)
    dz = jnp.sqrt(jnp.maximum(disc, 0.0))
    hit = disc >= 0.0
    near = jnp.where(hit, z0 - dz, jnp.inf).min(axis=1, keepdims=True)
    far = jnp.where(hit, z0 + dz, -jnp.inf).max(axis=1, keepdims=True)
    return near, far
