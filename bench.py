"""Headline benchmark: canonical 256x256 render throughput on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "rays/sec", "vs_baseline": N}

Workload parity with the reference's canonical render: 65,536 rays, 64
uniform + 64 importance samples per ray, NeuS alpha compositing with
finite-difference normals (7 SDF evals per sample), full production hash-grid
config (16 levels, 2^19 tables, finest res 2048).

vs_baseline: the reference publishes no numbers (BASELINE.md); we normalize
against an estimated 30,000 rays/sec for the reference pipeline on A100-80G
(4096-ray batches, fp16 hash encoding + MLPs, ~2.2 s per 256^2 frame — in
line with instant-NSR-class renderers at 128 samples/ray). The BASELINE.json
target is vs_baseline > 5.
"""

from __future__ import annotations

import json
import time

A100_BASELINE_RAYS_PER_SEC = 30_000.0


def main():
    import jax

    from avatarcraft_tpu.cameras import pose_spherical, pose2rays
    from avatarcraft_tpu.constants import CANONICAL_CAMERA_DIST_VAL, NSR_BOUND
    from avatarcraft_tpu.models.instant_nsr import (
        FieldConfig,
        RenderConfig,
        init_field_params,
        render_rays_chunked,
    )

    H = W = 256
    fcfg = FieldConfig()
    rcfg = RenderConfig(num_steps=64, upsample_steps=64, bound=NSR_BOUND)
    params = init_field_params(jax.random.PRNGKey(0), fcfg)

    chunk = 8192
    render = jax.jit(
        lambda p, ro, rd, k: render_rays_chunked(
            p, ro, rd, k, fcfg, rcfg, 1.0, chunk=chunk
        )["rgb"]
    )

    # distinct camera per frame: identical (executable, args) pairs can be
    # result-deduped by the remote execution relay and would fake the timing
    frames = []
    for i in range(4):
        c2w = pose_spherical(10.0 + 72.0 * i, 0.0, CANONICAL_CAMERA_DIST_VAL)
        frames.append(pose2rays(H, W, c2w))

    # warm-up / compile. NOTE: this environment's remote-execution relay can
    # return early from block_until_ready on a fresh result and memoizes
    # identical (executable, args) pairs — so every timed frame uses distinct
    # rays AND forces a host readback of a reduction.
    _ = float(render(params, *frames[0], jax.random.PRNGKey(1)).sum())

    n_frames = 3
    t0 = time.perf_counter()
    for i in range(n_frames):
        out = render(params, *frames[1 + i], jax.random.PRNGKey(2 + i))
        _ = float(out.sum())  # hard sync
    dt = (time.perf_counter() - t0) / n_frames

    rays_per_sec = H * W / dt
    print(
        json.dumps(
            {
                "metric": "canonical_render_256_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/sec",
                "vs_baseline": round(rays_per_sec / A100_BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
