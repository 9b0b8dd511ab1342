"""Speed-of-light (MFU-analogue) accounting for the flagship paths
(VERDICT r4 Next #2): per timed frame/step, count the field evaluations,
MXU FLOPs and gather rows from the live configs, divide by the MEASURED
hardware ceilings (docs/PERFORMANCE.md "Measured hardware facts":
~160 TF/s bf16 MXU, ~340 M rows/s row-gather on <=250k-row tables,
~115 M rows/s on multi-M-row tables), and print the implied floor time vs
the measured frame time — a utilization figure that does not depend on the
estimated A100 baseline.

    python benchmarks/speed_of_light.py [fast|warp|train|all]

The parity path already has this analysis (docs/PERFORMANCE.md
"Parity-pipeline speed of light"); this covers canonical-fast, warp, and
the scan trainer. Reference contrast: the reference publishes no utilization
accounting for raymarching.cu.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MXU_FLOPS = 160e12  # measured bf16 matmul ceiling; fp32 MLPs see ~1/2
MXU_FLOPS_FP32 = 80e12
GATHER_FAST = 340e6  # rows/s, tables <= ~250k rows
# multi-M-row tables measured 115-185 M rows/s; floors use the OPTIMISTIC
# end so the published utilization is conservative (never inflated by a
# pessimistic ceiling)
GATHER_SLOW = 185e6

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "canonical")


def mlp_flops(fcfg) -> tuple[float, float]:
    """(sdf_flops, color_flops) per point, 2*in*out per layer."""
    sdf_dims = [fcfg.sdf_in_dim] + [fcfg.hidden_dim] * (fcfg.num_layers - 1) + [
        1 + fcfg.geo_feat_dim
    ]
    sdf = sum(2 * a * b for a, b in zip(sdf_dims[:-1], sdf_dims[1:]))
    col_dims = [fcfg.color_in_dim] + [fcfg.hidden_dim_color] * (
        fcfg.num_layers_color - 1
    ) + [3]
    col = sum(2 * a * b for a, b in zip(col_dims[:-1], col_dims[1:]))
    return float(sdf), float(col)


def account_fast(fcfg, fast_cfg, n_rays: int, budget: int, normal_mode: str):
    """FLOP + gather-row accounting for one canonical-fast frame.

    Per-sample cost by normal estimator: fd4/fd7 run the encoder+SDF at
    4/7 stencil points; analytic is ONE encoder pass (the jvp reuses the
    primal's gathered rows) with ~2x the SDF MLP FLOPs (primal+tangent)."""
    enc_passes = {"fd4": 4, "fd7": 7, "analytic": 1}[normal_mode]
    sdf_evals = {"fd4": 4, "fd7": 7, "analytic": 2}[normal_mode]
    sdf_f, col_f = mlp_flops(fcfg)
    n_samples = budget if budget else n_rays * fast_cfg.k_samples

    # encoder: gathers_per_point wide row-gathers; pyramid plane tables at
    # 512-2048^2 rows are the slow tier, grids (<=128^3 packed cells) fast
    g_grid = len(fcfg.pyramid.grid_resolutions)
    g_plane = 3 * len(fcfg.pyramid.plane_resolutions)
    enc_points = n_samples * enc_passes
    rows_fast = enc_points * g_grid
    rows_slow = enc_points * g_plane
    # probe pass: bit-packed uint32 fine-grid table (~83k rows = fast tier)
    rows_fast += n_rays * fast_cfg.n_probes

    flops = n_samples * (sdf_evals * sdf_f + col_f)
    return {
        "samples": n_samples,
        "flops": flops,
        "rows_fast": rows_fast,
        "rows_slow": rows_slow,
        # NOT counted (VPU/infrastructure work with no measured ceiling):
        # per-ray top_k over the probes, the cumsum+scatter compaction,
        # NeuS compositing math, chunking overheads — the floor is
        # gather + MXU only, so published utilization is a LOWER bound.
        "floor_ms": {
            "mxu(fp32 mlp)": flops / MXU_FLOPS_FP32 * 1e3,
            "gather_fast_tier": rows_fast / GATHER_FAST * 1e3,
            "gather_slow_tier": rows_slow / GATHER_SLOW * 1e3,
        },
    }


def account_warp(fcfg, n_rays: int, budget_per_chunk: int, n_chunks: int,
                 n_verts: int, incident_k: int, k_verts: int = 4):
    """One warped frame: fast-path accounting + the kNN warp on every
    compacted sample."""
    # field part: same as fast path with fd4 over the budget
    from avatarcraft_tpu.models.instant_nsr import FastRenderConfig

    fast_cfg = FastRenderConfig(n_probes=128, k_samples=32)
    acc = account_fast(fcfg, fast_cfg, n_rays, budget_per_chunk * n_chunks, "fd4")
    n_samples = acc["samples"]
    # kNN warp per sample: distance matmul [B,V] (2*3*V flops), top-k,
    # candidate fetch = k_verts * ([F,9] + [F,48] packed rows, fast tier),
    # Ericson closest-point ~200 flops/candidate (VPU, not counted), blend
    # gathers k_verts rows of [V,48] transforms
    acc["flops"] += n_samples * 2 * 3 * n_verts
    acc["rows_fast"] += n_samples * (k_verts * incident_k * 2 + k_verts)
    acc["floor_ms"] = {
        "mxu(fp32 mlp)": acc["flops"] / MXU_FLOPS_FP32 * 1e3,
        "gather_fast_tier": acc["rows_fast"] / GATHER_FAST * 1e3,
        "gather_slow_tier": acc["rows_slow"] / GATHER_SLOW * 1e3,
    }
    return acc


def account_train(fcfg, fast_cfg, batch: int, budget: int):
    """One scan-trainer step: forward + backward. Matmul bwd = 2x fwd
    (dgrad+wgrad); encoder gather bwd = scatter-add of the same row count."""
    acc = account_fast(fcfg, fast_cfg, batch, budget, "fd4")
    acc["flops"] *= 3.0
    acc["rows_fast"] *= 2.0
    acc["rows_slow"] *= 2.0
    acc["floor_ms"] = {
        "mxu(fp32 mlp)": acc["flops"] / MXU_FLOPS_FP32 * 1e3,
        "gather_fast_tier": acc["rows_fast"] / GATHER_FAST * 1e3,
        "gather_slow_tier": acc["rows_slow"] / GATHER_SLOW * 1e3,
    }
    return acc


def measured_fast_frame_ms():
    """Time the canonical-fast frame exactly like bench.py (4-frame scan
    groups, distinct cameras, forced readbacks)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from avatarcraft_tpu.cameras import pose2rays, pose_spherical
    from avatarcraft_tpu.constants import CANONICAL_CAMERA_DIST_VAL, NSR_BOUND
    from avatarcraft_tpu.models.instant_nsr import (
        FastRenderConfig,
        count_fast_samples,
        render_rays_fast,
    )
    from avatarcraft_tpu.utils.checkpoint import load_params_with_config

    params, fcfg = load_params_with_config(os.path.join(ART, "bare_smpl_tpu.pth.tar"))
    grid = jnp.asarray(np.load(os.path.join(ART, "grid.npy")))
    H = W = 256
    n_frames, n_groups = 4, 4
    groups = []
    for g in range(n_groups):
        fs = [pose2rays(H, W, pose_spherical(
            11.0 + 91.0 * i + 23.0 * g, -3.0 * g, CANONICAL_CAMERA_DIST_VAL))
            for i in range(n_frames)]
        groups.append((jnp.stack([f[0] for f in fs]), jnp.stack([f[1] for f in fs])))

    probe_cfg = FastRenderConfig(n_probes=192, k_samples=32, bound=NSR_BOUND)
    counter = jax.jit(lambda ro, rd, g: count_fast_samples(ro, rd, probe_cfg, g))
    worst = max(int(counter(groups[g][0][i], groups[g][1][i], grid))
                for g in range(n_groups) for i in range(n_frames))
    budget = int(worst * 1.02)

    normal_mode = "fd4"
    prov = os.path.join(ART, "PROVENANCE.json")
    if os.path.exists(prov):
        normal_mode = json.load(open(prov)).get("normal_mode", "fd4")
    fast_cfg = FastRenderConfig(
        n_probes=192, k_samples=32, bound=NSR_BOUND, sample_budget=budget,
        normal_mode=normal_mode,
    )

    def _group(p, ros, rds, g):
        def body(c, xr):
            out = render_rays_fast(p, xr[0], xr[1], fcfg, fast_cfg, g, 1.0)
            return c + out["rgb"].sum(), None
        import jax as _j
        return _j.lax.scan(body, 0.0, (ros, rds))[0]

    render = jax.jit(_group)
    _ = float(render(params, *groups[0], grid))
    _ = float(render(params, *groups[1], grid))
    ts = []
    for g in (2, 3):
        t0 = time.perf_counter()
        _ = float(render(params, *groups[g], grid))
        ts.append(time.perf_counter() - t0)
    return min(ts) / n_frames * 1e3, fcfg, fast_cfg, budget, H * W, normal_mode


def main(which: str = "all"):
    out = {}
    if which in ("fast", "all"):
        ms, fcfg, fast_cfg, budget, n_rays, normal_mode = measured_fast_frame_ms()
        acc = account_fast(fcfg, fast_cfg, n_rays, budget, normal_mode)
        floor = max(acc["floor_ms"].values())
        out["canonical_fast"] = {
            "measured_ms": round(ms, 1),
            "budget": budget,
            "normal_mode": normal_mode,
            **{k: round(v, 1) for k, v in acc["floor_ms"].items()},
            "binding": max(acc["floor_ms"], key=acc["floor_ms"].get),
            "floor_ms": round(floor, 1),
            "pct_of_ceiling": round(100 * floor / ms, 1),
            "rays_per_s": round(n_rays / (ms / 1e3)),
        }
        print(json.dumps({"canonical_fast": out["canonical_fast"]}), flush=True)
    if which in ("warp", "all"):
        import jax
        import numpy as np

        from avatarcraft_tpu.data.amass import load_pose_sequence
        from avatarcraft_tpu.models.smpl import load_smpl
        from avatarcraft_tpu.utils.checkpoint import load_params_with_config
        from avatarcraft_tpu.warp import WarpData
        from avatarcraft_tpu.workloads.warp_render import (
            WarpRenderSettings,
            calc_local_trans,
            derive_warp_budget,
            make_warp_frame_renderer_fast,
        )
        from avatarcraft_tpu.cameras import pose2rays, pose_spherical
        from avatarcraft_tpu.constants import CANONICAL_CAMERA_DIST_VAL

        params, fcfg = load_params_with_config(
            os.path.join(ART, "bare_smpl_tpu.pth.tar"))
        model = load_smpl(os.path.join(ART, "demo_body_rig.npz"))
        poses = load_pose_sequence(os.path.join(ART, "demo_poses.npy"))
        wv, Ts, _ = calc_local_trans(model, render_type="animate", poses=poses,
                                     max_frames=4, rest_pose="zero")
        frames = [WarpData.create(wv[i], model.faces, Ts[i]) for i in range(4)]
        H = W = 256
        ro, rd = pose2rays(H, W, pose_spherical(30.0, -5.0, CANONICAL_CAMERA_DIST_VAL))
        wset = WarpRenderSettings()
        budget = derive_warp_budget(wv[:4], ro, rd, wset)
        render = make_warp_frame_renderer_fast(fcfg, wset, 1.0, sample_budget=budget)
        rf = jax.jit(lambda p, o, d, w: render(p, o, d, w).sum())
        _ = float(rf(params, ro, rd, frames[0]))
        _ = float(rf(params, ro, rd, frames[1]))
        ts = []
        for i in (2, 3):
            t0 = time.perf_counter()
            _ = float(rf(params, ro, rd, frames[i]))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3
        n_chunks = H * W // min(wset.chunk, H * W)
        incident_k = int(frames[0].vert2face.shape[1])
        acc = account_warp(fcfg, H * W, budget, n_chunks,
                           model.n_verts, incident_k)
        floor = max(acc["floor_ms"].values())
        out["warp"] = {
            "measured_ms": round(ms, 1),
            "budget_per_chunk": budget,
            "n_verts": model.n_verts,
            "incident_k": incident_k,
            **{k: round(v, 1) for k, v in acc["floor_ms"].items()},
            "binding": max(acc["floor_ms"], key=acc["floor_ms"].get),
            "floor_ms": round(floor, 1),
            "pct_of_ceiling": round(100 * floor / ms, 1),
            "rays_per_s": round(H * W / (ms / 1e3)),
        }
        print(json.dumps({"warp": out["warp"]}), flush=True)
    if which in ("train", "all"):
        # accounting only, against the documented 79.3 steps/s scan-trainer
        # run (docs/PERFORMANCE.md "The scanned trainer": batch 4096,
        # budget 16k — random-pixel training rays select FAR fewer occupied
        # samples than coherent frame rays)
        from avatarcraft_tpu.models.instant_nsr import FastRenderConfig
        from avatarcraft_tpu.utils.checkpoint import load_params_with_config

        _, fcfg = load_params_with_config(os.path.join(ART, "bare_smpl_tpu.pth.tar"))
        batch = 4096
        fast_cfg = FastRenderConfig(n_probes=192, k_samples=32)
        budget = 16384  # the measured run's configured compaction budget
        acc = account_train(fcfg, fast_cfg, batch, budget)
        measured_ms = 1e3 / 79.3
        floor = max(acc["floor_ms"].values())
        out["train_step"] = {
            "measured_ms": round(measured_ms, 2),
            "assumed_budget": budget,
            **{k: round(v, 2) for k, v in acc["floor_ms"].items()},
            "binding": max(acc["floor_ms"], key=acc["floor_ms"].get),
            "floor_ms": round(floor, 2),
            "pct_of_ceiling": round(100 * floor / measured_ms, 1),
        }
        print(json.dumps({"train_step": out["train_step"]}), flush=True)
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
