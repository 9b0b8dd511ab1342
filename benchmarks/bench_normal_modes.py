"""Render-path micro-benchmarks: hash gather layouts + normal modes.

Measures, on the current chip (relay-safe: distinct inputs, forced scalar
readback, first two calls discarded):

  1. hash_encode layout="flat" vs "leveled" (points/sec),
  2. parity render (64+64 importance) under fd7 / analytic normals (rays/sec),
  3. fast-path render (192 probes -> 32 samples) under fd4 / analytic,
  4. fast-path TRAIN step (fwd+bwd+adam) under fd4 / analytic (steps/sec).

Usage: python benchmarks/bench_normal_modes.py [section ...]
       sections: encode parity fast train   (default: encode fast train)
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp


def timeit(name, fn, argsets, work, unit):
    _ = float(fn(*argsets[0]))
    _ = float(fn(*argsets[1]))
    ts = []
    for a in argsets[2:]:
        t0 = time.perf_counter()
        _ = float(fn(*a))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:52s} {dt*1e3:9.1f} ms   {work/dt:12.0f} {unit}/s")
    return work / dt


def rays_front(n, key):
    ro = jnp.concatenate(
        [jax.random.uniform(key, (n, 2), minval=-0.3, maxval=0.3),
         jnp.full((n, 1), -2.0)], axis=1)
    rd = jnp.concatenate([jnp.zeros((n, 2)), jnp.ones((n, 1))], axis=1)
    return ro, rd


def main(sections):
    from avatarcraft_tpu.models.instant_nsr import (
        FastRenderConfig,
        FieldConfig,
        RenderConfig,
        init_field_params,
        render_rays,
        render_rays_fast,
    )
    from avatarcraft_tpu.ops.hash_encoder import HashGridSpec, hash_encode, init_hash_table

    if "encode" in sections:
        # n capped so the [n*levels*8, 2] gather intermediate stays well under
        # HBM after TPU (8,128) tile padding (a [64M,2] f32 intermediate pads
        # 64x to 32 GiB and OOMs the chip)
        n = 262_144
        hspec = HashGridSpec()
        table = init_hash_table(jax.random.PRNGKey(0), hspec)
        xs = [jax.random.uniform(jax.random.PRNGKey(10 + i), (n, 3), minval=-1.6, maxval=1.6)
              for i in range(6)]
        for layout in ("flat", "leveled"):
            f = jax.jit(lambda t, x, lo=layout: hash_encode(t, x, hspec, size=1.6, layout=lo).sum())
            timeit(f"hash encode layout={layout}", f, [(table, x) for x in xs], n, "pts")

    fcfg_h = FieldConfig(encoder="hashgrid")
    params_h = init_field_params(jax.random.PRNGKey(0), fcfg_h)
    fcfg_p = FieldConfig(encoder="tpu_pyramid")
    params_p = init_field_params(jax.random.PRNGKey(1), fcfg_p)

    if "parity" in sections:
        n = 4096
        raysets = [rays_front(n, jax.random.PRNGKey(20 + i)) for i in range(5)]
        for mode in ("fd7", "analytic"):
            rcfg = RenderConfig(num_steps=64, upsample_steps=64, bound=1.6, normal_mode=mode)
            f = jax.jit(lambda p, ro, rd: render_rays(
                p, ro, rd, jax.random.PRNGKey(0), fcfg_h, rcfg, 1.0)["rgb"].sum())
            timeit(f"parity render 64+64 hashgrid normal={mode}", f,
                   [(params_h, ro, rd) for ro, rd in raysets], n, "rays")

    if "fast" in sections:
        n = 65536
        grid = jnp.full((129,) * 3, 100.0, jnp.float32)
        raysets = [rays_front(n, jax.random.PRNGKey(30 + i)) for i in range(5)]
        for enc, fc, pp in (("pyramid", fcfg_p, params_p), ("hashgrid", fcfg_h, params_h)):
            for mode in ("fd4", "analytic"):
                # sample budget caps the field pass at 12 samples/ray average
                # (production bench.py sizing); without it the saturated grid
                # sends all 2.1M slots through the field and the hashgrid
                # configs OOM on the [slots*levels*8, 2] gather intermediate
                cfg = FastRenderConfig(n_probes=192, k_samples=32, bound=1.6,
                                       normal_mode=mode, sample_budget=n * 12)
                f = jax.jit(lambda p, ro, rd, fc=fc, cfg=cfg: render_rays_fast(
                    p, ro, rd, fc, cfg, grid, 1.0)["rgb"].sum())
                timeit(f"fast render {enc} K=32 normal={mode}", f,
                       [(pp, ro, rd) for ro, rd in raysets], n, "rays")

    if "train" in sections:
        import numpy as np
        import optax

        from avatarcraft_tpu.data import SMPLMultiviewDataset
        from avatarcraft_tpu.workloads.reconstruct import (
            ReconstructConfig,
            make_batch_ray_fn,
            make_optimizer,
            make_train_step_fast,
        )

        ds = SMPLMultiviewDataset("/root/reference/data/smpl_da_512")
        cfg = ReconstructConfig(batch_size=4096)
        tx = make_optimizer(cfg, 1000)
        ray_fn = make_batch_ray_fn(ds.K, ds.H, ds.W)
        poses = jnp.asarray(ds.poses)
        grid = jnp.full((129,) * 3, 100.0, jnp.float32)
        rng = np.random.default_rng(0)

        for mode in ("fd4", "analytic"):
            fast_cfg = FastRenderConfig(n_probes=128, k_samples=32, bound=1.6, normal_mode=mode)
            step_fn = make_train_step_fast(fcfg_p, fast_cfg, tx, ray_fn, 0.1, 1.0)
            params = init_field_params(jax.random.PRNGKey(0), fcfg_p)
            opt_state = tx.init(params)

            def run(vi, pi, gt, key):
                nonlocal params, opt_state
                params, opt_state, loss, _ = step_fn(
                    params, opt_state, poses, vi, pi, gt, grid, key, jnp.float32(1.0))
                return loss

            argsets = []
            for i in range(6):
                vi = jnp.asarray(rng.integers(0, ds.n_images, 4096), jnp.int32)
                pi = jnp.asarray(rng.integers(0, ds.H * ds.W, 4096), jnp.int32)
                gt = jnp.asarray(ds.gather_rgb(np.asarray(vi), np.asarray(pi)))
                argsets.append((vi, pi, gt, jax.random.PRNGKey(100 + i)))
            timeit(f"fast TRAIN step b=4096 pyramid normal={mode}", run, argsets, 1, "steps")


if __name__ == "__main__":
    main(sys.argv[1:] or ["encode", "fast", "train"])
