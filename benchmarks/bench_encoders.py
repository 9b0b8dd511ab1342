"""Encoder micro-benchmarks: hash vs pyramid, points/sec on the current chip.

Usage: python benchmarks/bench_encoders.py [n_points]

Relay-safe methodology (see docs/PERFORMANCE.md): distinct inputs per timed
call, forced scalar readback, first two calls discarded.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def timeit(name, fn, argsets, work, unit="pts"):
    _ = float(fn(*argsets[0]))
    _ = float(fn(*argsets[1]))
    ts = []
    for a in argsets[2:]:
        t0 = time.perf_counter()
        _ = float(fn(*a))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:42s} {dt*1e3:9.1f} ms   {work/dt/1e6:8.1f} M {unit}/s")


def main(n=1_000_000):
    from avatarcraft_tpu.ops.grid_encoder import (
        PyramidSpec,
        init_pyramid_params,
        materialize_packed,
        pyramid_encode,
    )
    from avatarcraft_tpu.ops.hash_encoder import (
        HashGridSpec,
        hash_encode,
        init_hash_table,
    )

    xs = [
        jax.random.uniform(jax.random.PRNGKey(10 + i), (n, 3), minval=-1.6, maxval=1.6)
        for i in range(5)
    ]

    hspec = HashGridSpec()
    table = init_hash_table(jax.random.PRNGKey(0), hspec)
    f_hash = jax.jit(lambda t, x: hash_encode(t, x, hspec, size=1.6).sum())
    timeit(f"hash encode ({hspec.num_levels}x8 = 128 gathers/pt)", f_hash, [(table, x) for x in xs], n)

    pspec = PyramidSpec()
    pparams = init_pyramid_params(jax.random.PRNGKey(1), pspec)
    packed = jax.jit(
        lambda p: jax.tree_util.tree_map(
            lambda t: t.astype(jnp.bfloat16), materialize_packed(p, pspec)
        )
    )(pparams)
    jax.block_until_ready(packed)
    f_pyr = jax.jit(lambda pk, x: pyramid_encode(pk, x, pspec, size=1.6).sum())
    timeit(
        f"pyramid encode ({pspec.gathers_per_point} gathers/pt, pre-packed)",
        f_pyr, [(packed, x) for x in xs], n,
    )

    # packing overhead (per training/render step)
    packfn = jax.jit(
        lambda p: jax.tree_util.tree_map(
            lambda t: t.astype(jnp.bfloat16), materialize_packed(p, pspec)
        )
    )
    variants = [
        jax.tree_util.tree_map(lambda t: t * (1.0 + 1e-6 * i), pparams) for i in range(5)
    ]

    def pack_and_touch(p):
        pk = packfn(p)
        return pk["grids"][0].astype(jnp.float32).sum()

    timeit("packed-table materialization", jax.jit(pack_and_touch), [(v,) for v in variants], 1, unit="steps")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
