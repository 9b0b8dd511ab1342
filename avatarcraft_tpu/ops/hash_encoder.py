"""Multiresolution hash-grid encoder (instant-NGP) as a pure-XLA program.

TPU-native re-design of the reference CUDA extension
(reference: encoder/hashencoder/src/hashencoder.cu:36-219 for the forward
semantics, encoder/hashencoder/hashgrid.py:80-143 for the module wrapper):

* one flat embedding table ``[total_params, level_dim]`` with per-level offsets
  (dense indexing for coarse levels, XOR-prime hashing for fine levels),
* per-(point, level) trilinear interpolation over the 2^D corner features,
* out-of-bound inputs produce zero features,
* backward = scatter-add into the table. On TPU this is the autodiff transpose
  of the corner gather, which XLA lowers to a deterministic scatter-add
  (no atomics needed, unlike the CUDA ``atomicAdd`` path in
  encoder/hashencoder/src/hashencoder.cu:298-305).

All level constants (scales, resolutions, offsets, hash-vs-dense flags) are
computed at trace time from a hashable :class:`HashGridSpec`, so the whole
encoder is a single static-shape XLA computation: elementwise index math on
``[L, N, 3]`` blocks plus one big gather, which fuses with the downstream MLP.
"""

from __future__ import annotations

import dataclasses
import math
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

# XOR-hash primes (reference: encoder/hashencoder/src/hashencoder.cu:43)
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static configuration of the multiresolution hash grid.

    Defaults follow the reference instant-NSR config
    (reference: models/instant_nsr.py:505-515): 16 levels x 2 dims, base
    resolution 16, 2^19-entry tables, finest resolution 2048.
    """

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: int | None = 2048
    per_level_scale: float = 2.0

    def __post_init__(self):
        if self.desired_resolution is not None:
            # desired_resolution overrides per_level_scale
            # (reference: encoder/hashencoder/hashgrid.py:84-85)
            scale = float(
                np.exp2(
                    np.log2(self.desired_resolution / self.base_resolution)
                    / (self.num_levels - 1)
                )
            )
            object.__setattr__(self, "per_level_scale", scale)

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @cached_property
    def level_constants(self):
        """Per-level (scale, resolution, offset, hashmap_size, use_hash).

        Table layout mirrors encoder/hashencoder/hashgrid.py:99-112; index math
        mirrors encoder/hashencoder/src/hashencoder.cu:121-123 (scale/resolution)
        and :54-70 (dense-or-hash index).
        """
        max_params = 2**self.log2_hashmap_size
        scales, resolutions, offsets, sizes, use_hash = [], [], [0], [], []
        s_log2 = math.log2(self.per_level_scale)
        for lvl in range(self.num_levels):
            scale = math.exp2(lvl * s_log2) * self.base_resolution - 1.0
            resolution = int(math.ceil(scale)) + 1
            params_in_level = min(max_params, (resolution + 1) ** self.input_dim)
            scales.append(scale)
            resolutions.append(resolution)
            sizes.append(params_in_level)
            use_hash.append((resolution + 1) ** self.input_dim > params_in_level)
            offsets.append(offsets[-1] + params_in_level)
        return (
            tuple(scales),
            tuple(resolutions),
            tuple(offsets),
            tuple(sizes),
            tuple(use_hash),
        )

    @property
    def total_params(self) -> int:
        return self.level_constants[2][-1]


def init_hash_table(key: jax.Array, spec: HashGridSpec, dtype=jnp.float32) -> jax.Array:
    """U(-1e-4, 1e-4) init (reference: encoder/hashencoder/hashgrid.py:119-121)."""
    return jax.random.uniform(
        key, (spec.total_params, spec.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


def _corner_indices(spec: HashGridSpec, pos_grid: jax.Array) -> jax.Array:
    """Flat table indices for integer grid coords ``pos_grid`` of one corner.

    pos_grid: [L, N, 3] uint32 grid coordinates per level.
    Returns [L, N] int32 indices into the flat table (offset included).
    """
    scales, resolutions, offsets, sizes, use_hash = spec.level_constants
    L = spec.num_levels

    res1 = jnp.asarray([r + 1 for r in resolutions], jnp.uint32)[:, None]
    size = jnp.asarray(sizes, jnp.uint32)[:, None]
    off = jnp.asarray(offsets[:-1], jnp.uint32)[:, None]
    hash_mask = jnp.asarray(use_hash, jnp.bool_)[:, None]

    # Dense index: x + y*(res+1) + z*(res+1)^2 (hashencoder.cu:54-64)
    dense = (
        pos_grid[..., 0]
        + pos_grid[..., 1] * res1
        + pos_grid[..., 2] * res1 * res1
    )
    # XOR-prime hash (hashencoder.cu:36-51); uint32 arithmetic wraps mod 2^32.
    hashed = (
        pos_grid[..., 0] * jnp.uint32(_PRIMES[0])
        ^ pos_grid[..., 1] * jnp.uint32(_PRIMES[1])
        ^ pos_grid[..., 2] * jnp.uint32(_PRIMES[2])
    )
    idx = jnp.where(hash_mask, hashed, dense) % size + off
    return idx.astype(jnp.int32)


def pack_dense_cells(table: jax.Array, spec: HashGridSpec) -> dict:
    """Cell-packed tables for the DENSE (non-hashed) levels.

    For a dense level, the 8 corner rows of every interpolation cell are
    known addresses, so they can be pre-gathered into one wide row
    ``P[cell] = concat(T[corner_0] ... T[corner_7])`` (8*C floats — well
    under the 128-byte row width that gathers fetch for free on TPU,
    docs/PERFORMANCE.md). The encoder then needs ONE gather per (point,
    dense level) instead of 8. Hashed levels cannot be packed: their cells
    are virtual and the XOR hash (reference:
    encoder/hashencoder/src/hashencoder.cu:36-51) scatters a cell's corners
    with data-dependent strides.

    Returns {level: packed [n_cells, 8*C]}; build once per table update
    (rendering: once per loaded checkpoint).
    """
    scales, resolutions, offsets, sizes, use_hash = spec.level_constants
    C = spec.level_dim
    packed = {}
    for lvl in range(spec.num_levels):
        if use_hash[lvl]:
            continue
        R = resolutions[lvl]  # cells per axis (max corner index = R)
        r1 = R + 1
        tbl = jax.lax.slice_in_dim(table, offsets[lvl], offsets[lvl + 1])
        bx, by, bz = jnp.meshgrid(
            jnp.arange(R), jnp.arange(R), jnp.arange(R), indexing="ij"
        )
        base = (bx + by * r1 + bz * r1 * r1).reshape(-1)  # [R^3]
        corners = []
        for corner in range(8):
            dx, dy, dz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
            idx = base + dx + dy * r1 + dz * r1 * r1
            corners.append(jnp.take(tbl, idx, axis=0))  # [R^3, C]
        packed[lvl] = jnp.concatenate(corners, axis=1)  # [R^3, 8C]
    return packed


def hash_encode(
    table: jax.Array,
    x: jax.Array,
    spec: HashGridSpec,
    *,
    size: float = 1.0,
    layout: str = "leveled",
    packed_cells: dict | None = None,
) -> jax.Array:
    """Encode positions through the multiresolution hash grid.

    Args:
        table: flat embedding table ``[spec.total_params, spec.level_dim]``.
        x: positions ``[..., 3]`` in ``[-size, size]``
           (mapping mirrors encoder/hashencoder/hashgrid.py:126-137).
        spec: static grid configuration.
        layout: gather grouping — numerically identical, different speed:
          * "leveled": one gather per LEVEL from that level's table slice
            (≤2^19 rows). TPU row-gather throughput is ~2-3x higher on
            sub-M-row tables than on the 6.1M-row flat table (page/TLB
            effects, docs/PERFORMANCE.md), so this is the default.
          * "flat": one gather per CORNER over the whole flat table
            (the round-1 formulation; kept for A/B benchmarking).

    Returns:
        features ``[..., num_levels * level_dim]``, zero for out-of-bound inputs
        (reference: encoder/hashencoder/src/hashencoder.cu:94-119).
    """
    if spec.input_dim != 3:
        raise NotImplementedError("hash_encode currently supports 3-D inputs")
    prefix = x.shape[:-1]
    x = x.reshape(-1, 3)
    x01 = (x + size) / (2.0 * size)

    scales, resolutions, offsets, sizes, use_hash = spec.level_constants
    L, N, C = spec.num_levels, x01.shape[0], spec.level_dim

    oob = jnp.any((x01 < 0.0) | (x01 > 1.0), axis=-1)  # [N]

    if layout == "leveled":
        level_outs = []
        for lvl in range(L):
            # pos = x*scale + 0.5 (hashencoder.cu:127-131)
            pos = x01 * jnp.asarray(scales[lvl], x01.dtype) + 0.5  # [N,3]
            pos_floor = jnp.floor(pos)
            frac = pos - pos_floor
            base = pos_floor.astype(jnp.uint32)
            if packed_cells is not None and lvl in packed_cells:
                # dense level with a cell-packed table: ONE row gather
                # fetches all 8 corners (pack_dense_cells); weights applied
                # per packed slice so the gather fuses into the reduction
                R = jnp.uint32(resolutions[lvl])
                cell = (base[:, 0] * R * R + base[:, 1] * R + base[:, 2]).astype(
                    jnp.int32
                )
                rows = jnp.take(packed_cells[lvl], cell, axis=0)  # [N, 8C]
                lvl_out = jnp.zeros((N, C), table.dtype)
                for corner in range(8):
                    bits = jnp.asarray(
                        [(corner >> d) & 1 for d in range(3)], jnp.uint32
                    )
                    w = jnp.prod(
                        jnp.where(bits[None, :] == 1, frac, 1.0 - frac), axis=-1
                    )
                    lvl_out = lvl_out + w[:, None].astype(table.dtype) * rows[
                        :, corner * C : (corner + 1) * C
                    ]
                level_outs.append(lvl_out)
                continue
            tbl = jax.lax.slice_in_dim(table, offsets[lvl], offsets[lvl + 1])
            # One narrow gather PER CORNER, accumulated immediately: the
            # gather output ([N, C], C as small as 2) then fuses into the
            # weighted add and never materializes. A combined [N*8, C]
            # gather looks tidier but its fusion output pads C up to the
            # 128-lane tile on TPU — a 64x memory blowup that OOMs at
            # render-chunk sizes.
            lvl_out = jnp.zeros((N, C), table.dtype)
            for corner in range(8):
                bits = jnp.asarray(
                    [(corner >> d) & 1 for d in range(3)], jnp.uint32
                )
                pg = base + bits[None, :]  # [N,3]
                w = jnp.prod(
                    jnp.where(bits[None, :] == 1, frac, 1.0 - frac), axis=-1
                )  # [N]
                if use_hash[lvl]:
                    # XOR-prime hash (hashencoder.cu:36-51); uint32 wraps
                    idx = (
                        pg[..., 0] * jnp.uint32(_PRIMES[0])
                        ^ pg[..., 1] * jnp.uint32(_PRIMES[1])
                        ^ pg[..., 2] * jnp.uint32(_PRIMES[2])
                    )
                else:
                    # dense: x + y*(res+1) + z*(res+1)^2 (hashencoder.cu:54-64)
                    r1 = jnp.uint32(resolutions[lvl] + 1)
                    idx = pg[..., 0] + pg[..., 1] * r1 + pg[..., 2] * r1 * r1
                idx = (idx % jnp.uint32(sizes[lvl])).astype(jnp.int32)  # [N]
                feats = jnp.take(tbl, idx, axis=0)  # [N, C]
                lvl_out = lvl_out + w[:, None].astype(table.dtype) * feats
            level_outs.append(lvl_out)
        out = jnp.stack(level_outs, axis=1)  # [N,L,C]
        out = jnp.where(oob[:, None, None], 0.0, out).reshape(N, L * C)
        return out.reshape(*prefix, spec.output_dim)

    scale = jnp.asarray(scales, x01.dtype)[:, None, None]  # [L,1,1]
    # pos = x*scale + 0.5 (hashencoder.cu:127-131)
    pos = x01[None, :, :] * scale + 0.5  # [L,N,3]
    pos_floor = jnp.floor(pos)
    frac = pos - pos_floor
    base = pos_floor.astype(jnp.uint32)  # [L,N,3]

    out = jnp.zeros((L, N, C), dtype=table.dtype)
    for corner in range(8):
        bits = jnp.asarray(
            [(corner >> d) & 1 for d in range(3)], jnp.uint32
        )  # [3]
        pg = base + bits[None, None, :]
        w = jnp.prod(
            jnp.where(bits[None, None, :] == 1, frac, 1.0 - frac), axis=-1
        )  # [L,N]
        idx = _corner_indices(spec, pg)  # [L,N]
        feats = jnp.take(table, idx.reshape(-1), axis=0).reshape(L, N, C)
        out = out + w[..., None].astype(table.dtype) * feats

    out = jnp.where(oob[None, :, None], 0.0, out)
    # [L,N,C] -> [N, L*C] (layout matches hashgrid.py:41)
    out = jnp.transpose(out, (1, 0, 2)).reshape(N, L * C)
    return out.reshape(*prefix, spec.output_dim)
