"""Sweep the fast-path render configuration on the CONVERGED artifact.

Grid over (sample_budget, normal_mode) for the headline
256-squared canonical frame, using artifacts/canonical (field + trained
occupancy grid). Decides bench.py's default configuration with data.

Relay-safe timing: distinct camera per frame, forced scalar readback, first
call discarded per config.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_fast_configs.py
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarcraft_tpu.cameras import pose_spherical, pose2rays
    from avatarcraft_tpu.constants import CANONICAL_CAMERA_DIST_VAL, NSR_BOUND
    from avatarcraft_tpu.models.instant_nsr import FastRenderConfig, render_rays_fast
    from avatarcraft_tpu.utils.checkpoint import load_params_with_config

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, fcfg = load_params_with_config(
        os.path.join(root, "artifacts/canonical/bare_smpl_tpu.pth.tar")
    )
    grid = jnp.asarray(np.load(os.path.join(root, "artifacts/canonical/grid.npy")))

    H = W = 256
    frames = [
        pose2rays(H, W, pose_spherical(10.0 + 67.0 * i, 0.0, CANONICAL_CAMERA_DIST_VAL))
        for i in range(5)
    ]

    results = []
    # probe_pool axis retired in round 4 (selection is always fine-grid-exact
    # through the bit-packed table); the honest budget axis replaces it
    for budget_mult, mode in itertools.product((12, 5), ("fd4", "analytic")):
        cfg = FastRenderConfig(
            n_probes=192, k_samples=32, bound=NSR_BOUND,
            sample_budget=H * W * budget_mult, normal_mode=mode,
        )
        f = jax.jit(
            lambda p, ro, rd, g, cfg=cfg: render_rays_fast(
                p, ro, rd, fcfg, cfg, g, 1.0
            )["rgb"].sum()
        )
        t0 = time.perf_counter()
        _ = float(f(params, *frames[0], grid))
        compile_s = time.perf_counter() - t0
        ts = []
        for ro, rd in frames[1:]:
            t0 = time.perf_counter()
            _ = float(f(params, ro, rd, grid))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        r = {
            "budget": H * W * budget_mult, "normal_mode": mode,
            "frame_ms": round(dt * 1e3, 1), "rays_per_sec": round(H * W / dt),
            "compile_s": round(compile_s, 1),
        }
        results.append(r)
        print(json.dumps(r), flush=True)
    best = max(results, key=lambda r: r["rays_per_sec"])
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
