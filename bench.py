"""Headline benchmark: canonical 256x256 render throughput on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "rays/sec", "vs_baseline": N}

Flagship configuration (the TPU-native path):
  * pyramid/triplane encoder (12 wide row-gathers per point instead of the
    hash encoder's 128 narrow ones),
  * occupancy-grid culled sampling: 192 grid probes -> 32 field samples/ray,
  * 4-tap tetrahedral FD normals (4 network evals per sample vs 7).

The bench is CONSERVATIVE: the density grid is set fully occupied, so every
ray pays the full 32-sample budget (a real avatar scene is sparser and
faster). The reference-parity path (hash encoder + 64+64 stratified/
importance sampling + 7-eval central differences) can be benched with
--path=parity.

vs_baseline: the reference publishes no numbers (BASELINE.md); we normalize
against an estimated 30,000 rays/sec for the reference pipeline on A100-80G
(4096-ray batches, fp16 hash encoding + MLPs, ~2.2 s per 256^2 frame — in
line with instant-NSR-class renderers at 128 samples/ray). The BASELINE.json
target is vs_baseline > 5.

NOTE on timing: this environment's remote-execution relay memoizes identical
(executable, args) pairs and can return early from block_until_ready on fresh
results — every timed frame uses distinct rays and a forced scalar readback.
"""

from __future__ import annotations

import json
import sys
import time

A100_BASELINE_RAYS_PER_SEC = 30_000.0


def main(path: str = "fast"):
    import jax
    import jax.numpy as jnp

    from avatarcraft_tpu.cameras import pose_spherical, pose2rays
    from avatarcraft_tpu.constants import CANONICAL_CAMERA_DIST_VAL, NSR_BOUND
    from avatarcraft_tpu.models.instant_nsr import (
        FastRenderConfig,
        FieldConfig,
        RenderConfig,
        init_field_params,
        render_rays_chunked,
        render_rays_fast,
    )

    H = W = 256
    n_frames = 3
    frames = []
    for i in range(1 + n_frames):
        c2w = pose_spherical(10.0 + 72.0 * i, 0.0, CANONICAL_CAMERA_DIST_VAL)
        frames.append(pose2rays(H, W, c2w))

    if path == "parity":
        fcfg = FieldConfig(encoder="hashgrid")
        rcfg = RenderConfig(num_steps=64, upsample_steps=64, bound=NSR_BOUND)
        params = init_field_params(jax.random.PRNGKey(0), fcfg)
        render = jax.jit(
            lambda p, ro, rd, k: render_rays_chunked(
                p, ro, rd, k, fcfg, rcfg, 1.0, chunk=8192
            )["rgb"].sum()
        )
        args = lambda i: (params, *frames[i], jax.random.PRNGKey(i))
        metric = "canonical_render_256_rays_per_sec_per_chip_parity"
    else:
        fcfg = FieldConfig(encoder="tpu_pyramid")
        fast_cfg = FastRenderConfig(n_probes=192, k_samples=32, bound=NSR_BOUND)
        params = init_field_params(jax.random.PRNGKey(0), fcfg)
        # conservative: fully-occupied grid -> every ray pays k_samples
        grid = jnp.ones((129, 129, 129), jnp.float32)

        def _render(p, ro, rd, g):
            out = render_rays_fast(p, ro, rd, fcfg, fast_cfg, g, 1.0)
            return out["rgb"].sum()

        render = jax.jit(_render)
        args = lambda i: (params, *frames[i], grid)
        metric = "canonical_render_256_rays_per_sec_per_chip"

    _ = float(render(*args(0)))  # compile + settle

    t0 = time.perf_counter()
    for i in range(1, 1 + n_frames):
        _ = float(render(*args(i)))
    dt = (time.perf_counter() - t0) / n_frames

    rays_per_sec = H * W / dt
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(rays_per_sec, 1),
                "unit": "rays/sec",
                "vs_baseline": round(rays_per_sec / A100_BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "fast")
