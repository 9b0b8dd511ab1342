"""Occupancy (density) grid: maintenance + static-shape sample culling.

The reference ships an instant-NGP CUDA ray marcher against a 129^3 density
grid that is DORMANT (constructed with cuda_ray=False and missing run_cuda;
SURVEY.md 2.3). This module makes the capability real, TPU-style:

* :func:`update_density_grid` -- the reference's grid refresh semantics
  (logistic density from SDF at inv_s=512, 2x maxpool smoothing, EMA-max
  decay 0.95; reference: models/instant_nsr.py:303-356) as one jitted program;
* :func:`select_occupied_samples` -- the static-shape replacement for the
  CUDA marcher's atomic compaction: probe M uniform samples per ray against
  the grid, keep the top-K occupied (z-ordered), mask the rest. Rays keep a
  fixed [K] sample budget so XLA sees static shapes; empty rays composite to
  background through the mask exactly like the reference's alpha masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def density_from_sdf(sdf: jnp.ndarray, inv_s: float = 512.0) -> jnp.ndarray:
    """Logistic density of NeuS (reference: models/instant_nsr.py:332-338).

    = inv_s * sigmoid(-inv_s * sdf) computed in the numerically-stable
    two-branch form the reference uses."""
    return inv_s * jax.nn.sigmoid(-inv_s * sdf)


def update_density_grid(
    sdf_fn,
    grid: jnp.ndarray,
    bound: float,
    *,
    decay: float = 0.95,
    inv_s: float = 512.0,
    block: int = 1,
) -> jnp.ndarray:
    """Refresh a [R,R,R] density grid from the SDF and EMA-max with decay.

    ``sdf_fn``: [N,3] -> [N] SDF values (pass a packed-table closure).
    Evaluates the full lattice in ``block`` x-slabs via lax.map.
    """
    R = grid.shape[0]
    xs = jnp.linspace(-bound, bound, R)

    def slab(x_idx):
        gx = jnp.broadcast_to(xs[x_idx][:, None, None], (block, R, R))
        gy = jnp.broadcast_to(xs[None, :, None], (block, R, R))
        gz = jnp.broadcast_to(xs[None, None, :], (block, R, R))
        pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        sdf = sdf_fn(pts)
        return density_from_sdf(sdf, inv_s).reshape(block, R, R)

    assert R % block == 0
    idx = jnp.arange(R).reshape(R // block, block)
    new = jax.lax.map(slab, idx).reshape(R, R, R)

    # 2x maxpool smoothing with edge padding (models/instant_nsr.py:342-343)
    p = jnp.pad(new, ((0, 1), (0, 1), (0, 1)), mode="edge")
    pooled = jnp.maximum(
        jnp.maximum(
            jnp.maximum(p[:-1, :-1, :-1], p[1:, :-1, :-1]),
            jnp.maximum(p[:-1, 1:, :-1], p[1:, 1:, :-1]),
        ),
        jnp.maximum(
            jnp.maximum(p[:-1, :-1, 1:], p[1:, :-1, 1:]),
            jnp.maximum(p[:-1, 1:, 1:], p[1:, 1:, 1:]),
        ),
    )
    return jnp.maximum(grid * decay, pooled)


def voxelize_verts(
    verts: jnp.ndarray,
    bound: float,
    resolution: int = 129,
    dilate: int = 2,
    value: float = 100.0,
) -> jnp.ndarray:
    """Posed-space occupancy grid from mesh vertices: mark vertex cells, then
    dilate ``dilate`` cells (one 3^3 max-pool per round). The fast-path
    analogue of geometry_guided_near_far (reference: utils/ray_utils.py:270):
    at 129^3 over +-1.6, two dilation rounds cover the 0.05 geo-threshold
    around the SMPL surface (vertex spacing ~1 cell)."""
    R = resolution
    idx = jnp.clip(
        jnp.round((verts + bound) / (2 * bound) * (R - 1)).astype(jnp.int32), 0, R - 1
    )
    flat = (idx[:, 0] * R + idx[:, 1]) * R + idx[:, 2]
    grid = jnp.zeros((R * R * R,), jnp.float32).at[flat].set(value).reshape(R, R, R)
    for _ in range(dilate):
        p = jnp.pad(grid, ((1, 1),) * 3)
        out = grid
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                for dz in (0, 1, 2):
                    out = jnp.maximum(out, p[dx : dx + R, dy : dy + R, dz : dz + R])
        grid = out
    return grid


def flood_fill_occupancy(
    occ: jnp.ndarray, seed: jnp.ndarray, max_iters: int | None = None
) -> jnp.ndarray:
    """Grow ``seed`` within ``occ`` to its full 26-connected component(s).

    Fully on-device (no scipy, no host round trip): iterated 3^3 binary
    dilation masked by ``occ`` under ``lax.while_loop``, converging when a
    sweep adds no cells (bounded by ``max_iters``, default 3R — a worst-case
    serpentine path). occ/seed: [R,R,R] bool; returns [R,R,R] bool.
    """
    R = occ.shape[0]
    if max_iters is None:
        max_iters = 3 * R

    def dilate(m):
        # 3^3 max-pool, stride 1, SAME: one step of 26-connected growth
        return jax.lax.reduce_window(
            m, False, jax.lax.bitwise_or, (3, 3, 3), (1, 1, 1), "SAME"
        )

    def cond(state):
        _, grew, it = state
        return jnp.logical_and(grew, it < max_iters)

    def body(state):
        m, _, it = state
        nxt = jnp.logical_and(dilate(m), occ)
        return nxt, jnp.any(nxt != m), it + 1

    seed = jnp.logical_and(seed, occ)
    filled, _, _ = jax.lax.while_loop(
        cond, body, (seed, jnp.any(seed), jnp.int32(0))
    )
    return filled


def prune_grid_floaters(
    grid: jnp.ndarray, prev_grid: jnp.ndarray, occ_threshold: float = 10.0
) -> jnp.ndarray:
    """In-loop SDS floater control: keep only the occupied components of
    ``grid`` connected to the PREVIOUS grid's occupancy (temporal-coherence
    seed), zero the rest.

    SDS stylization grows isolated floater cells that saturate the same
    density cap as the body, so no threshold separates them — but they ARE
    separable topologically (docs/PERFORMANCE.md "occupancy-grid inflation":
    0.41% -> 1.59% occupied over the lava schedule). The avatar evolves
    continuously from the trusted pre-stylize reconstruction grid, so
    flood-filling the fresh occupancy from its intersection with the previous
    occupancy keeps the (possibly reshaped) body and drops disconnected
    blobs — the reference fights the same floaters with its opacity loss
    alone (reference: stylize.py:176-193, weight 1e5); this prunes the
    sampling structure on top of it. If the seed intersection is empty
    (shouldn't happen mid-training), the grid passes through unpruned.
    """
    thresh_new = jnp.minimum(occ_threshold, jnp.mean(grid))
    thresh_old = jnp.minimum(occ_threshold, jnp.mean(prev_grid))
    occ = grid > thresh_new
    seed = jnp.logical_and(occ, prev_grid > thresh_old)
    filled = flood_fill_occupancy(occ, seed)
    keep = jnp.where(jnp.any(seed), filled, occ)
    return jnp.where(keep, grid, 0.0)


def pool_grid(grid: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Conservative max-pool of a [R,R,R] grid to ceil(R/factor)^3: every
    coarse cell covers (and dominates) its fine neighborhood, so occupancy
    never reports a false negative. Used to probe against a SMALL table
    (~275k rows at 65^3 instead of 2.1M at 129^3 — the fast gather tier)."""
    R = grid.shape[0]
    pad = (-R) % factor
    g = jnp.pad(grid, ((0, pad),) * 3, mode="edge")
    Rp = g.shape[0]
    # window = 2*factor-1 centered on each stride-factor cell: include the
    # +-(factor-1) fine neighbors so boundary cells stay conservative
    w = factor
    g = g.reshape(Rp // w, w, Rp // w, w, Rp // w, w).max(axis=(1, 3, 5))
    # one-cell dilation at the coarse level
    p = jnp.pad(g, ((1, 1),) * 3, mode="edge")
    out = g
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                R2 = g.shape[0]
                out = jnp.maximum(out, p[dx : dx + R2, dy : dy + R2, dz : dz + R2])
    return out


def init_density_grid(resolution: int = 129) -> jnp.ndarray:
    """Zeros [R,R,R] (reference: models/instant_nsr.py:102)."""
    return jnp.zeros((resolution,) * 3, jnp.float32)


def occupancy_lookup(grid: jnp.ndarray, pts: jnp.ndarray, bound: float) -> jnp.ndarray:
    """Nearest-cell density at pts ([..., 3] in [-bound, bound]) -> [...]."""
    R = grid.shape[0]
    x01 = jnp.clip((pts + bound) / (2 * bound), 0.0, 1.0)
    idx = jnp.clip(jnp.round(x01 * (R - 1)).astype(jnp.int32), 0, R - 1)
    flat = (idx[..., 0] * R + idx[..., 1]) * R + idx[..., 2]
    return jnp.take(grid.reshape(-1), flat.reshape(-1)).reshape(pts.shape[:-1])


def pack_occupancy_bits(
    grid: jnp.ndarray, threshold: jnp.ndarray | float
) -> jnp.ndarray:
    """Bit-pack the FINE grid's occupancy (grid > threshold) along z into a
    uint32 table [R*R*ceil(R/32)].

    Rationale (round 4): probing the fine 129^3 grid directly pays the
    multi-M-row gather tier (~115-185 M rows/s), while the 65^3 max-pooled
    grid is fast to gather but inflates *selection* ~2.9x (most
    pooled-selected samples sit in empty fine cells and waste field evals).
    Packing 32 z-cells per uint32 row shrinks the table to ~83k rows — the
    fast gather tier (~340 M rows/s) — at EXACT fine-grid selection, so the
    derived sample budget stays tight and nothing ever clips.
    """
    R = grid.shape[0]
    z32 = (R + 31) // 32
    occ = (grid > threshold).astype(jnp.uint32)
    occ = jnp.pad(occ, ((0, 0), (0, 0), (0, z32 * 32 - R)))
    weights = jnp.left_shift(
        jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32)
    )
    packed = jnp.sum(
        occ.reshape(R, R, z32, 32) * weights, axis=-1, dtype=jnp.uint32
    )
    return packed.reshape(R * R * z32)


def occupancy_lookup_bits(
    packed: jnp.ndarray, resolution: int, pts: jnp.ndarray, bound: float
) -> jnp.ndarray:
    """Nearest-cell occupancy bool at pts from a pack_occupancy_bits table.

    Bit-exact against ``occupancy_lookup(grid, pts, bound) > threshold`` for
    the (grid, threshold) the table was packed from."""
    R = resolution
    z32 = (R + 31) // 32
    x01 = jnp.clip((pts + bound) / (2 * bound), 0.0, 1.0)
    idx = jnp.clip(jnp.round(x01 * (R - 1)).astype(jnp.int32), 0, R - 1)
    row = (idx[..., 0] * R + idx[..., 1]) * z32 + (idx[..., 2] >> 5)
    bit = (idx[..., 2] & 31).astype(jnp.uint32)
    words = jnp.take(packed, row.reshape(-1)).reshape(row.shape)
    return (jnp.right_shift(words, bit) & jnp.uint32(1)).astype(bool)


def compact_indices(
    valid_flat: jnp.ndarray, budget: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic stream compaction (the CUDA marcher's atomicAdd
    compaction, reference: raymarching.cu:156-221, as cumsum + scatter).

    Returns (sel [budget] int32 indices into the flat array, kept [T] bool).
    ``kept`` marks entries that made it into the budget; entries beyond the
    budget are dropped in flat order. Invalid slots of ``sel`` (when fewer
    than ``budget`` entries are valid) point at index 0 — mask downstream
    with ``kept`` / slot validity, both deterministic under XLA.
    """
    T = valid_flat.shape[0]
    pos = jnp.cumsum(valid_flat.astype(jnp.int32)) - 1  # rank among valid
    kept = valid_flat & (pos < budget)
    write = jnp.where(kept, pos, budget)  # overflow/invalid -> sink slot
    idx = jnp.arange(T, dtype=jnp.int32)
    sel = (
        jnp.zeros((budget + 1,), jnp.int32).at[write].set(idx, mode="drop")[:budget]
    )
    return sel, kept


def scatter_to_flat(
    vals: jnp.ndarray, sel: jnp.ndarray, total: int, n_valid_slots: jnp.ndarray
) -> jnp.ndarray:
    """Inverse of the compaction gather: place vals [budget, ...] back at
    their flat positions ([total, ...], zeros elsewhere). Slots of ``sel``
    beyond ``n_valid_slots`` are routed to a sink row and dropped."""
    budget = sel.shape[0]
    slot_ok = jnp.arange(budget) < n_valid_slots
    dest = jnp.where(slot_ok, sel, total)
    out_shape = (total + 1,) + vals.shape[1:]
    return jnp.zeros(out_shape, vals.dtype).at[dest].set(vals, mode="drop")[:total]


def select_occupied_samples(
    z_vals: jnp.ndarray,  # [N, M] probe depths
    occ: jnp.ndarray,  # [N, M] densities at the probes
    k: int,
    threshold: jnp.ndarray | float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k occupied probes per ray, EVENLY SPACED across the occupied extent.

    Returns (z_sel [N,k], valid [N,k] bool), z-ordered. Matches the CUDA
    marcher's semantics (dt ~ span/steps with empty voxels skipped,
    reference: raymarching/src/raymarching.cu:100-149): when more than k
    probes are occupied, the budget spreads evenly over ALL of them — taking
    the k nearest instead would confine sampling to the near fraction of the
    ray whenever the grid is dense (e.g. a freshly-initialized saturated
    grid), so the subject would never be sampled. Rays with fewer than k
    occupied probes use them all front-to-back and mask the remaining slots.
    """
    N, M = z_vals.shape
    occupied = occ if occ.dtype == jnp.bool_ else occ > threshold
    cum = jnp.cumsum(occupied.astype(jnp.int32), axis=-1)  # [N, M]
    n_occ = cum[:, -1:]  # [N, 1]
    i = jnp.arange(k, dtype=jnp.int32)[None, :]  # [1, k]
    spread = ((i.astype(jnp.float32) + 0.5) * n_occ.astype(jnp.float32) / k).astype(
        jnp.int32
    )
    r = jnp.where(n_occ > k, spread, jnp.minimum(i, jnp.maximum(n_occ - 1, 0)))
    valid = i < n_occ
    # index of the (r+1)-th occupied probe: first j with cum[j] >= r+1, i.e.
    # #{j : cum[j] < r+1} — a branch-free comparison-sum (VPU-friendly,
    # [N, M, k] bools) instead of a vmapped binary search
    j = jnp.sum(cum[:, :, None] < (r + 1)[:, None, :], axis=1, dtype=jnp.int32)
    j = jnp.clip(j, 0, M - 1)
    z_sel = jnp.take_along_axis(z_vals, j, axis=-1)
    return z_sel, valid
