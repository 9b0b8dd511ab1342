"""Scatter-add strategies for the encoder-table backward (the measured
training bottleneck: freezing the tables lifts the train step 2.66 ->
14.9 steps/s, so ~80% of step time is table-gradient scatter-adds).

The backward of a row-gather ``take(table, idx)`` must accumulate row
gradients at duplicate indices. Candidate formulations at training shapes
(N = batch*K sample rows into each of ~12 tables/step):

  a) autodiff transpose of jnp.take (what the train step does today),
  b) explicit table.at[idx].add(g),
  c) sort-by-index + segment_sum(indices_are_sorted=True),
  d) (c) but keeping the sort permutation shared across tables
     (one argsort per step, 12 applications) -- modeled by timing the
     apply-only cost with a precomputed order.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_scatter_add.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def timeit(name, fn, argsets):
    _ = jax.block_until_ready(fn(*argsets[0]))
    _ = jax.block_until_ready(fn(*argsets[1]))
    ts = []
    for a in argsets[2:]:
        t0 = time.perf_counter()
        out = fn(*a)
        # force a fresh scalar readback (relay memoization safety)
        _ = float(out.ravel()[0])
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:58s} {dt*1e3:9.2f} ms")
    return dt


def main():
    shapes = [
        ("plane 2048 (4.2M rows x 16)", 2047 * 2047, 16),
        ("grid 128 (2.0M rows x 32)", 127 ** 3, 32),
        ("grid 32 (30k rows x 32)", 31 ** 3, 32),
    ]
    N = 131_072  # 4096 rays x K=32 sample rows

    for label, rows, width in shapes:
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        idx_sets = [
            jax.random.randint(jax.random.PRNGKey(10 + i), (N,), 0, rows, jnp.int32)
            for i in range(6)
        ]
        g_sets = [
            jax.random.normal(jax.random.PRNGKey(20 + i), (N, width), jnp.float32)
            for i in range(6)
        ]
        table = jax.random.normal(k2, (rows, width), jnp.float32)

        print(f"-- {label}, N={N}")

        vjp = jax.jit(
            lambda t, idx, g: jax.grad(
                lambda tt: (jnp.take(tt, idx, axis=0) * g).sum()
            )(t)
        )
        timeit("a) vjp of jnp.take", vjp, [(table, i, g) for i, g in zip(idx_sets, g_sets)])

        at_add = jax.jit(
            lambda idx, g: jnp.zeros((rows, width), jnp.float32).at[idx].add(g)
        )
        timeit("b) zeros.at[idx].add(g)", at_add, list(zip(idx_sets, g_sets)))

        seg_sorted = jax.jit(
            lambda idx, g: jax.ops.segment_sum(
                g[jnp.argsort(idx)], jnp.sort(idx), num_segments=rows,
                indices_are_sorted=True,
            )
        )
        timeit("c) argsort + segment_sum(sorted)", seg_sorted,
               list(zip(idx_sets, g_sets)))

        order_sets = [jnp.argsort(i) for i in idx_sets]
        seg_apply = jax.jit(
            lambda idx, g, order: jax.ops.segment_sum(
                g[order], idx[order], num_segments=rows, indices_are_sorted=True
            )
        )
        timeit("d) segment_sum with precomputed order", seg_apply,
               [(i, g, o) for (i, g), o in zip(zip(idx_sets, g_sets), order_sets)])

        sort_only = jax.jit(lambda idx: jnp.argsort(idx))
        timeit("   (argsort alone)", sort_only, [(i,) for i in idx_sets])


if __name__ == "__main__":
    main()
