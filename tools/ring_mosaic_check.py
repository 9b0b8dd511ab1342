"""Prove the Pallas ICI ring kernel lowers through the REAL Mosaic compiler.

Round-2 VERDICT item 6: interpret-mode execution (with race detection)
validated the ring's logic, but never the actual TPU lowering of
``make_async_remote_copy``/semaphore code. This container has ONE chip, so:

* build a 1-device TPU mesh and run ``ring_all_gather`` under shard_map —
  the n=1 ring is degenerate at runtime (zero RDMA steps execute) but the
  kernel body, including the remote-DMA construction, the semaphore
  signal/wait pair, and the 2-slot VMEM staging, is fully compiled by
  Mosaic (lax.fori_loop lowers its body regardless of trip count);
* assert the gathered output equals the input;
* run a sharded-table TRAINING microtest: a tiny embedding-lookup loss whose
  table is reassembled by ``all_gather_table``'s Pallas path
  (``ring_all_gather_grad``: Pallas forward, reduce-scatter backward) — the
  gradient must match the pure-XLA computation.

Writes a log suitable for committing under docs/ (run:
``python tools/ring_mosaic_check.py | tee docs/ring_mosaic_check.log``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from avatarcraft_tpu.parallel.mesh import make_mesh
    from avatarcraft_tpu.parallel.ring import (
        all_gather_table,
        ring_all_gather,
        ring_all_gather_grad,
    )

    devs = jax.devices()
    print(f"devices: {devs}")
    assert devs[0].platform == "tpu", "this check must run on the real TPU"
    mesh = make_mesh(1)
    axis = mesh.axis_names[0]

    # ---- 1. Mosaic lowering + execution of the kernel itself --------------
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    fn = jax.jit(
        jax.shard_map(
            lambda s: ring_all_gather(s, axis),
            mesh=mesh, in_specs=P(axis, None), out_specs=P(),
            check_vma=False,
        )
    )
    lowered = fn.lower(x)
    stablehlo = lowered.as_text()
    assert "tpu_custom_call" in stablehlo or "custom_call" in stablehlo, (
        "expected the pallas kernel as a custom call in the lowering"
    )
    print("lowering contains the Mosaic custom call: OK")
    out = np.asarray(fn(x))
    np.testing.assert_allclose(out, np.asarray(x))
    print("ring_all_gather executed through Mosaic on TPU (n=1 ring): OK")

    # ---- 2. sharded-table training microtest ------------------------------
    T, F = 64, 128
    table = jnp.asarray(
        np.random.default_rng(0).normal(size=(T, F)).astype(np.float32)
    )
    idx = jnp.asarray(np.random.default_rng(1).integers(0, T, 32))
    tgt = jnp.asarray(np.random.default_rng(2).normal(size=(32, F)).astype(np.float32))

    def loss_sharded(tbl):
        full = all_gather_table(tbl, mesh, use_pallas=True)
        return jnp.mean((full[idx] - tgt) ** 2)

    def loss_plain(tbl):
        return jnp.mean((tbl[idx] - tgt) ** 2)

    g_sharded = jax.jit(jax.grad(loss_sharded))(table)
    g_plain = jax.jit(jax.grad(loss_plain))(table)
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_plain), atol=1e-6
    )
    print("sharded-table training gradient through the Pallas ring == plain: OK")
    print("ALL RING MOSAIC CHECKS PASSED")


if __name__ == "__main__":
    main()
