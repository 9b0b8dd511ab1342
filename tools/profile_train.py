"""Training-throughput profiling (VERDICT r1 #5).

Measures the occupancy-guided train step at batch 4096 under several
configurations (sample compaction on/off, bf16 color MLP, batch scaling) and
captures a jax.profiler trace of the winning configuration. Writes a JSON
summary to stdout; traces land in ``docs/traces/``.

Run on the real chip (after the main training run frees it):
    python tools/profile_train.py [--steps 20]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_config(label, fcfg, fast_cfg, batch, steps, trace_dir=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from avatarcraft_tpu.data import SMPLMultiviewDataset
    from avatarcraft_tpu.models.instant_nsr import init_field_params
    from avatarcraft_tpu.workloads.reconstruct import (
        ReconstructConfig,
        make_batch_ray_fn,
        make_train_step_fast,
    )

    ds = SMPLMultiviewDataset("/root/reference/data/smpl_da_512")
    cfg = ReconstructConfig(batch_size=batch)
    params = init_field_params(jax.random.PRNGKey(0), fcfg)
    tx = optax.adam(5e-4, b1=0.9, b2=0.99, eps=1e-15)
    opt_state = tx.init(params)
    ray_fn = make_batch_ray_fn(ds.K, ds.H, ds.W)
    step_fn = make_train_step_fast(fcfg, fast_cfg, tx, ray_fn, 0.1, 1.0)

    # half-converged-looking grid: a central blob (so compaction has
    # realistic sparsity ~15-20% instead of the saturated worst case)
    g = np.zeros((129,) * 3, np.float32)
    g[40:90, 30:100, 50:80] = 100.0
    grid = jnp.asarray(g)
    poses = jnp.asarray(ds.poses)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def one_step(k):
        vi = rng.integers(0, ds.n_images, batch).astype(np.int32)
        pi = rng.integers(0, ds.H * ds.W, batch).astype(np.int32)
        gt = ds.gather_rgb(vi, pi)
        return step_fn(params, opt_state, poses, jnp.asarray(vi), jnp.asarray(pi),
                       jnp.asarray(gt), grid, k, jnp.float32(1.0))

    # compile + settle (relay memoizes identical executions: distinct keys)
    key, sub = jax.random.split(key)
    t0 = time.perf_counter()
    out = one_step(sub)
    jax.block_until_ready(out[2])
    compile_s = time.perf_counter() - t0
    for _ in range(2):  # settle readback path
        key, sub = jax.random.split(key)
        out = one_step(sub)
        float(out[2])

    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        out = one_step(sub)
        float(out[2])  # force readback per step
    dt = (time.perf_counter() - t0) / steps

    if trace_dir:
        os.makedirs(trace_dir, exist_ok=True)
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                key, sub = jax.random.split(key)
                out = one_step(sub)
                float(out[2])

    return {
        "label": label,
        "batch": batch,
        "steps_per_sec": round(1.0 / dt, 2),
        "rays_per_sec": round(batch / dt, 0),
        "step_ms": round(dt * 1e3, 1),
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default=15, type=int)
    ap.add_argument("--trace", default="docs/traces/train_fast", type=str)
    opt = ap.parse_args()

    from avatarcraft_tpu.constants import NSR_BOUND
    from avatarcraft_tpu.models.instant_nsr import FastRenderConfig, FieldConfig

    fcfg = FieldConfig(encoder="tpu_pyramid")
    fcfg_bf16 = dataclasses.replace(fcfg, mlp_dtype="bfloat16")
    base = FastRenderConfig(n_probes=128, k_samples=32, bound=NSR_BOUND)

    results = []
    configs = [
        ("r1_baseline_nobudget", fcfg, base, 4096, None),
        ("budget50pct", fcfg,
         dataclasses.replace(base, sample_budget=4096 * 16), 4096, None),
        ("budget50pct_bf16color", fcfg_bf16,
         dataclasses.replace(base, sample_budget=4096 * 16), 4096, None),
        ("budget50pct_batch16k", fcfg,
         dataclasses.replace(base, sample_budget=16384 * 16), 16384, opt.trace),
    ]
    for label, fc, cc, batch, trace in configs:
        r = bench_config(label, fc, cc, batch, opt.steps, trace)
        results.append(r)
        print(json.dumps(r), file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
