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
    ap.add_argument("--steps", default=600, type=int)
    ap.add_argument("--batch_size", default=4096, type=int)
    ap.add_argument("--out", default="style/toy/multi")
    ap.add_argument("--i_save", default=0, type=int, help="0 = final only")
    ap.add_argument("--hw", default=256, type=int, help="train render size (smoke: 32)")
    ap.add_argument("--n_cap", default=100, type=int)
    ap.add_argument("--platform", default="default", choices=["cpu", "default"])
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

    cfg = StylizeConfig(
        H=opt.hw,
        W=opt.hw,
        batch_size=opt.batch_size,
        n_cap=opt.n_cap,
        sampler="fast",
        coarse_epochs=10_000,  # capped by --steps
        fine_epochs=0,
    )
    stacked = stack_params(
        [jax.tree_util.tree_map(lambda x: x.copy(), params_gt) for _ in prompts]
    )
    print("[multi] building trainer (vmapped grid init + text embeds)...",
          file=sys.stderr, flush=True)
    t_init = time.perf_counter()
    trainer = MultiPromptTrainer(
        cfg, fcfg, guidance, prompts, stacked, params_gt,
        fast_cfg=FastRenderConfig(n_probes=192, k_samples=32, bound=NSR_BOUND),
    )
    print(f"[multi] trainer ready in {time.perf_counter() - t_init:.0f}s",
          file=sys.stderr, flush=True)

    # per-step liveness logging via a wrapped train_view
    _orig_train_view = trainer.train_view
    _step_t = {"n": 0, "t": time.perf_counter()}

    def _logged_train_view(pose, epoch):
        _orig_train_view(pose, epoch)
        _step_t["n"] += 1
        n = _step_t["n"]
        if n <= 5 or (opt.log_every and n % opt.log_every == 0):
            now = time.perf_counter()
            print(f"[multi] step {n} (+{now - _step_t['t']:.1f}s)",
                  file=sys.stderr, flush=True)
            _step_t["t"] = now

    trainer.train_view = _logged_train_view

    os.makedirs(opt.out, exist_ok=True)

    t0, last = None, 0
    done = 0
    remaining = opt.steps
    chunk_steps = opt.i_save or opt.steps
    while remaining > 0:
        n = min(chunk_steps, remaining)
        trainer.train(max_steps=n)
        done += n
        remaining -= n
        if t0 is None:
            t0 = time.perf_counter()
            last = done
        else:
            rate = (done - last) / (time.perf_counter() - t0)
            print(f"[multi] step {done} ({rate:.2f} steps/s x {len(prompts)} prompts)",
                  file=sys.stderr)
        for i, (prompt, p) in enumerate(
            zip(prompts, unstack_params(trainer.params_style, len(prompts)))
        ):
            path = os.path.join(opt.out, f"multi_{prompt}_{done:04d}.pth.tar")
            save_params_with_config(jax.device_get(p), path, fcfg)
            np.save(os.path.join(opt.out, f"multi_{prompt}_grid.npy"),
                    np.asarray(jax.device_get(trainer.grids[i])))
            print(f"[multi] saved {path}", file=sys.stderr)

    print(json.dumps({"prompts": prompts, "steps": done, "out": opt.out}))


if __name__ == "__main__":
    main()
