"""Multi-prompt batched avatar creation demo (SURVEY §2.5 / BASELINE config 5).

Creates SEVERAL styled avatars in ONE run: the style-field parameters are
stacked [P, ...], phase A/B are vmapped over the prompt axis (the MXU sees
P-fold batches), and the guidance denoiser evaluates all prompts' CFG pairs
together — workloads/multi_stylize.MultiPromptTrainer. The reference can
only create one avatar per process (stylize.py trains a single net_style).

Uses the in-env trained toy guidance (models/toy_guidance), same as the
single-prompt stylize demonstration.

Usage:
    python tools/run_multi_stylize.py --steps 600 \
        [--prompts lava,emerald,porcelain] [--out style/toy/multi]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights_path", default="artifacts/canonical/bare_smpl_tpu.pth.tar")
    ap.add_argument("--toy_weights", default="artifacts/toy_guidance")
    ap.add_argument("--prompts", default="lava,emerald,porcelain")
    ap.add_argument("--steps", default=600, type=int,
                    help="coarse-stage SDS steps (stride subsample_scale)")
    ap.add_argument("--fine_steps", default=0, type=int,
                    help="fine-stage SDS steps (stride 1, full-res frames — "
                         "the reference schedule's second stage)")
    ap.add_argument("--batch_size", default=4096, type=int)
    ap.add_argument("--out", default="style/toy/multi")
    ap.add_argument("--i_save", default=0, type=int, help="0 = final only")
    ap.add_argument("--hw", default=256, type=int, help="train render size (smoke: 32)")
    ap.add_argument("--n_cap", default=100, type=int)
    ap.add_argument("--platform", default="default", choices=["cpu", "default"])
    ap.add_argument("--resume_step", default=0, type=int,
                    help="resume from the i_save checkpoints at this step "
                         "(multi_<prompt>_<step:04d>.pth.tar + grids in "
                         "--out); the remaining schedule and save numbering "
                         "continue from there. The TPU relay can stall "
                         "silently mid-run — this makes restarts cheap")
    ap.add_argument("--sample_budget", default=-1, type=int,
                    help="-1 = auto-derive the compaction budget from the "
                         "schedule's pose distribution vs the live grids "
                         "(zero-clip, guarded at every grid refresh); 0 = "
                         "off (every ray pays k_samples)")
    ap.add_argument("--normal_mode", default="fd4",
                    choices=["fd7", "fd4", "analytic"],
                    help="fast-sampler normal estimator; analytic (exact jvp "
                         "gradient) measured ~2.9x faster in the fine phase "
                         "(docs/PERFORMANCE.md) — a legitimate SDS lever "
                         "since the style field retrains its color net")
    ap.add_argument("--log_every", default=25, type=int,
                    help="per-step liveness log cadence (first 5 steps always "
                         "logged; the TPU relay can stall silently mid-run)")
    opt = ap.parse_args(argv)

    import jax

    if opt.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from avatarcraft_tpu.constants import NSR_BOUND
    from avatarcraft_tpu.models.diffusion import SDSGuidance
    from avatarcraft_tpu.models.instant_nsr import FastRenderConfig
    from avatarcraft_tpu.models.toy_guidance import load_toy_guidance, make_toy_modules
    from avatarcraft_tpu.utils.checkpoint import (
        load_params_with_config,
        save_params_with_config,
    )
    from avatarcraft_tpu.workloads.multi_stylize import (
        MultiPromptTrainer,
        stack_params,
        unstack_params,
    )
    from avatarcraft_tpu.workloads.stylize import StylizeConfig

    prompts = [p.strip() for p in opt.prompts.split(",") if p.strip()]
    params_gt, fcfg = load_params_with_config(opt.weights_path)
    tparams, tcfg = load_toy_guidance(opt.toy_weights)
    guidance = SDSGuidance(make_toy_modules(tparams, tcfg))
    print(f"[multi] {len(prompts)} prompts {prompts}; field encoder={fcfg.encoder}",
          file=sys.stderr)

    done0 = opt.resume_step
    rem_coarse = max(0, opt.steps - done0)
    rem_fine = opt.fine_steps - max(0, done0 - opt.steps)
    cfg = StylizeConfig(
        H=opt.hw,
        W=opt.hw,
        batch_size=opt.batch_size,
        n_cap=opt.n_cap,
        sampler="fast",
        # epoch granularity: the coarse->fine stride switch happens at an
        # epoch boundary, so point --steps at a multiple of --n_cap
        coarse_epochs=-(-rem_coarse // opt.n_cap),
        fine_epochs=-(-rem_fine // opt.n_cap),
    )
    if done0:
        srcs = [
            os.path.join(opt.out, f"multi_{p}_{done0:04d}.pth.tar") for p in prompts
        ]
        stacked = stack_params([load_params_with_config(s)[0] for s in srcs])
        print(f"[multi] resuming from step {done0} checkpoints in {opt.out}",
              file=sys.stderr, flush=True)
    else:
        stacked = stack_params(
            [jax.tree_util.tree_map(lambda x: x.copy(), params_gt) for _ in prompts]
        )
    print("[multi] building trainer (vmapped grid init + text embeds)...",
          file=sys.stderr, flush=True)
    t_init = time.perf_counter()
    trainer = MultiPromptTrainer(
        cfg, fcfg, guidance, prompts, stacked, params_gt,
        fast_cfg=FastRenderConfig(n_probes=192, k_samples=32, bound=NSR_BOUND,
                                  normal_mode=opt.normal_mode),
    )
    print(f"[multi] trainer ready in {time.perf_counter() - t_init:.0f}s",
          file=sys.stderr, flush=True)

    if opt.sample_budget < 0:
        b = trainer.derive_budget()
        print(f"[multi] auto-derived compaction budget {b}/chunk "
              f"({b / opt.batch_size:.1f} samples/ray; clip-guarded at every "
              f"grid refresh)", file=sys.stderr, flush=True)
    elif opt.sample_budget > 0:
        import dataclasses as _dc

        trainer.fast_cfg = _dc.replace(
            trainer.fast_cfg, sample_budget=opt.sample_budget
        )

    os.makedirs(opt.out, exist_ok=True)
    if done0:
        # restore the saved (pruned) per-prompt grids; the trainer's fresh
        # refresh lacks the temporal-coherence pruning seed
        import jax.numpy as jnp

        trainer.grids = jnp.stack([
            jnp.asarray(np.load(os.path.join(opt.out, f"multi_{p}_grid.npy")))
            for p in prompts
        ])
    total = rem_coarse + rem_fine
    grand_total = opt.steps + opt.fine_steps

    def _save(done, stacked_params, tag=None):
        for i, (prompt, p) in enumerate(
            zip(prompts, unstack_params(stacked_params, len(prompts)))
        ):
            name = tag or f"{done:04d}"
            path = os.path.join(opt.out, f"multi_{prompt}_{name}.pth.tar")
            save_params_with_config(jax.device_get(p), path, fcfg)
            np.save(os.path.join(opt.out, f"multi_{prompt}_grid.npy"),
                    np.asarray(jax.device_get(trainer.grids[i])))
            print(f"[multi] saved {path}", file=sys.stderr, flush=True)

    # liveness logging + periodic crash-insurance saves through on_step (one
    # train() call keeps the coarse->fine epoch schedule intact; restarting
    # train() per save chunk would reset the epoch counter to coarse)
    _step_t = {"t": time.perf_counter(), "t0": time.perf_counter()}

    def _on_step(step, stacked_params):
        g = done0 + step
        if step <= 5 or (opt.log_every and g % opt.log_every == 0):
            now = time.perf_counter()
            rate = step / (now - _step_t["t0"])
            phase = "coarse" if g <= opt.steps else "fine"
            print(f"[multi] step {g}/{grand_total} [{phase}] (+{now - _step_t['t']:.1f}s, "
                  f"avg {rate:.3f} steps/s x {len(prompts)} prompts)",
                  file=sys.stderr, flush=True)
            _step_t["t"] = now
        if opt.i_save and g % opt.i_save == 0 and g < grand_total:
            _save(g, stacked_params)

    done = trainer.train(max_steps=total, on_step=_on_step)
    _save(done0 + done, trainer.params_style, tag="final")
    print(json.dumps({
        "prompts": prompts, "steps": done0 + done, "coarse": opt.steps,
        "fine": opt.fine_steps, "resumed_from": done0, "out": opt.out,
    }))


if __name__ == "__main__":
    main()
