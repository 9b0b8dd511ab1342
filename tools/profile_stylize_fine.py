"""Measure fine-phase stylize throughput with in-loop floater control.

VERDICT r3 Next #6: round 3 measured ~0.1 steps/s at the 32,768-ray fine
patch config because SDS-grown floaters inflated the occupancy grid ~4x,
compaction (correctly) disabled itself, and every ray paid full K. Round 4
wires `prune_grid_floaters` + the reference's w_opacity=1e5 into the
trainer; this tool measures the fine phase as actually configured —
coarse_epochs=0 so every step is a full-256^2 phase A + patch-wise phase B
— and reports steps/s, the grid occupancy trajectory across refreshes, and
whether compaction stayed enabled (the clip guard prints loudly if not).

Usage:
    python tools/profile_stylize_fine.py [--steps 40] [--batch 32768]
        [--no_prune] [--style lava]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights_path", default="artifacts/canonical/bare_smpl_tpu.pth.tar")
    ap.add_argument("--grid_path", default="artifacts/canonical/grid.npy")
    ap.add_argument("--toy_weights", default="artifacts/toy_guidance")
    ap.add_argument("--style", default="lava")
    ap.add_argument("--steps", default=40, type=int)
    ap.add_argument("--batch", default=32768, type=int)
    ap.add_argument("--grid_update_every", default=10, type=int,
                    help="refresh cadence, scaled down so a short profile "
                         "crosses several refreshes (production: 200)")
    ap.add_argument("--no_prune", action="store_true")
    ap.add_argument("--normal_mode", default="fd4",
                    choices=["fd7", "fd4", "analytic"],
                    help="normal estimator for the fast sampler; analytic "
                         "(exact jvp gradient) is the cheapest and is a "
                         "legitimate SDS-training lever (the style field "
                         "retrains its color net against it)")
    ap.add_argument("--budget_per_ray", default=-1, type=int,
                    help="-1 = auto-derive from the live grid over the first "
                         "epoch's poses (the stylize CLI default)")
    ap.add_argument("--platform", default="default", choices=["cpu", "default"])
    opt = ap.parse_args(argv)

    import jax

    if opt.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from avatarcraft_tpu.constants import NSR_BOUND
    from avatarcraft_tpu.models.diffusion import SDSGuidance
    from avatarcraft_tpu.models.instant_nsr import (
        FastRenderConfig,
        count_fast_samples,
    )
    from avatarcraft_tpu.models.toy_guidance import load_toy_guidance, make_toy_modules
    from avatarcraft_tpu.utils.checkpoint import load_params_with_config
    from avatarcraft_tpu.workloads.stylize import StylizeConfig, StylizeTrainer

    params_gt, fcfg = load_params_with_config(opt.weights_path)
    grid = jnp.asarray(np.load(opt.grid_path))
    tparams, tcfg = load_toy_guidance(opt.toy_weights)
    guidance = SDSGuidance(make_toy_modules(tparams, tcfg))

    cfg = StylizeConfig(
        tgt_text=opt.style,
        coarse_epochs=0,  # straight to the fine phase: stride 1, full 256^2
        fine_epochs=10_000,
        batch_size=opt.batch,
        sampler="fast",
        grid_update_every=opt.grid_update_every,
        prune_floaters=not opt.no_prune,
    )

    # budget: same derivation as the stylize CLI — worst probe count over
    # one epoch's (noise-augmented) poses against the live grid
    probe_cfg = FastRenderConfig(n_probes=192, k_samples=32, bound=NSR_BOUND)
    if opt.budget_per_ray < 0:
        from avatarcraft_tpu.cameras import pose2rays, style_360_path
        from avatarcraft_tpu.constants import (
            CAN_HEAD_CAMERA_DIST,
            CAN_HEAD_OFFSET,
            CANONICAL_CAMERA_DIST_TRAIN,
        )

        rng = np.random.default_rng(0)
        poses, _ = style_360_path(
            np.zeros(3), np.array([0.0, 1.0, 0.0]), CANONICAL_CAMERA_DIST_TRAIN,
            20, add_noise=True, style_head=True, head_offset=CAN_HEAD_OFFSET,
            head_rate=0.5, head_dist=CAN_HEAD_CAMERA_DIST, rng=rng,
        )
        counter = jax.jit(
            lambda ro, rd, g: count_fast_samples(ro, rd, probe_cfg, g)
        )
        worst = 0
        for pose in poses:
            ro, rd = pose2rays(cfg.H, cfg.W, pose)
            for i in range(0, cfg.H * cfg.W - opt.batch + 1, opt.batch):
                worst = max(
                    worst, int(counter(ro[i:i + opt.batch], rd[i:i + opt.batch], grid))
                )
        budget = int(worst * 1.1)
        print(f"[fine] derived budget {budget}/patch (worst {worst})",
              file=sys.stderr, flush=True)
    else:
        budget = opt.batch * opt.budget_per_ray
    fast_cfg = FastRenderConfig(
        n_probes=192, k_samples=32, bound=NSR_BOUND, sample_budget=budget,
        normal_mode=opt.normal_mode,
    )

    trainer = StylizeTrainer(
        cfg, fcfg, guidance,
        params_style=jax.tree_util.tree_map(lambda x: x.copy(), params_gt),
        params_gt=params_gt, grid=grid, fast_cfg=fast_cfg,
    )

    def occ_frac(g):
        thresh = jnp.minimum(10.0, jnp.mean(g))
        return float(jnp.mean(g > thresh))

    occ0 = occ_frac(trainer.grid)
    times = []
    t_prev = None

    def on_step(step, _params):
        nonlocal t_prev
        now = time.perf_counter()
        if t_prev is not None:
            times.append(now - t_prev)
        t_prev = now
        if (step + 1) % 10 == 0:
            tail = times[-9:]
            print(f"[fine] step {step + 1}: {len(tail) / sum(tail):.3f} steps/s "
                  f"(occ {occ_frac(trainer.grid) * 100:.2f}%, "
                  f"compaction={'on' if trainer.fast_cfg.sample_budget else 'OFF'})",
                  file=sys.stderr, flush=True)

    trainer.train(max_steps=opt.steps, on_step=on_step)

    steady = times[5:]
    result = {
        "config": {"batch": opt.batch, "prune_floaters": not opt.no_prune,
                   "budget": budget, "steps": opt.steps,
                   "grid_update_every": opt.grid_update_every,
                   "normal_mode": opt.normal_mode},
        "steps_per_sec": round(len(steady) / sum(steady), 3) if steady else None,
        "first_step_s": round(times[0], 1) if times else None,
        "occ_frac_start": round(occ0, 5),
        "occ_frac_end": round(occ_frac(trainer.grid), 5),
        "compaction_still_on": bool(trainer.fast_cfg.sample_budget),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
