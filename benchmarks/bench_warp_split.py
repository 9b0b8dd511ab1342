"""Decompose the warped-frame render cost: probe/select vs kNN warp vs field.

Times the full fast warp frame against ablations (warp disabled; kNN-only;
budget sweep) on the real chip. Relay-safe: distinct frame per timed call,
forced scalar readback.

Usage: python benchmarks/bench_warp_split.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from avatarcraft_tpu.cameras import pose_spherical, pose2rays
    from avatarcraft_tpu.constants import CANONICAL_CAMERA_DIST_VAL
    from avatarcraft_tpu.data.amass import load_pose_sequence
    from avatarcraft_tpu.models.smpl import load_smpl
    from avatarcraft_tpu.utils.checkpoint import load_params_with_config
    from avatarcraft_tpu.warp import WarpData, warp_samples_to_canonical
    from avatarcraft_tpu.workloads.warp_render import (
        WarpRenderSettings,
        calc_local_trans,
        make_warp_frame_renderer_fast,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = os.path.join(root, "artifacts", "canonical")
    params, fcfg = load_params_with_config(
        os.path.join(art, "bare_smpl_tpu.pth.tar")
    )
    model = load_smpl(os.path.join(art, "demo_body_rig.npz"))
    poses = load_pose_sequence(os.path.join(art, "demo_poses.npy"))
    world_verts, Ts, _ = calc_local_trans(
        model, render_type="animate", poses=poses, max_frames=8, rest_pose="zero"
    )
    frames = [
        WarpData.create(world_verts[i], model.faces, Ts[i]) for i in range(8)
    ]
    H = W = 256
    ro, rd = pose2rays(H, W, pose_spherical(30.0, -5.0, CANONICAL_CAMERA_DIST_VAL))

    def timed(name, fn, args_for):
        _ = float(fn(*args_for(0)))  # compile
        _ = float(fn(*args_for(1)))  # settle
        ts = []
        for i in (2, 3):
            t0 = time.perf_counter()
            _ = float(fn(*args_for(i)))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(json.dumps({"what": name, "ms": round(dt * 1e3, 1),
                          "rays_per_sec": round(H * W / dt)}), flush=True)
        return dt

    # full fast warp frame (bench.py warp config)
    rf = make_warp_frame_renderer_fast(fcfg, WarpRenderSettings(), 1.0)
    f_full = jax.jit(lambda p, o, d, wd: rf(p, o, d, wd).sum())
    timed("full_warp_frame", f_full, lambda i: (params, ro, rd, frames[i]))

    # kNN warp alone on the same sample volume (8 chunks x 98304 budget)
    n_samples = 8192 * 12

    def warp_only(wd, key):
        pts = jax.random.uniform(key, (n_samples // 64, 64, 3), minval=-1.0, maxval=1.0)
        cp, cd, _, m = warp_samples_to_canonical(pts, wd)
        return cp.sum() + m.sum()

    f_warp = jax.jit(lambda wd, k: warp_only(wd, k) * 1.0)
    keys = [jax.random.PRNGKey(i) for i in range(4)]
    dt_w = timed("knn_warp_98k_samples", f_warp, lambda i: (frames[i], keys[i]))
    print(json.dumps({"what": "knn_warp_per_frame_x8", "ms": round(dt_w * 8e3, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
