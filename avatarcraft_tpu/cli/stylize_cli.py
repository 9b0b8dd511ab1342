"""CLI: SDS avatar creation (reference: stylize.py entry point).

Flag names preserved. The diffusion guidance loads real Stable Diffusion
weights when ``--sd_weights`` points at a converted checkpoint (see
avatarcraft_tpu.models.sd); otherwise a deterministic stand-in guidance is
used so the pipeline remains runnable in closed environments (clearly
logged -- it will not produce meaningful styles).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from avatarcraft_tpu.cli import options
from avatarcraft_tpu.constants import NSR_BOUND


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    options.set_general_option(parser)
    options.set_nerf_option(parser)
    options.set_pe_option(parser)
    options.set_render_option(parser)
    options.set_trajectory_option(parser)
    parser.add_argument("--guidance_type", default="diffusion",
                        choices=["clip", "diffusion", "toy"],
                        help="toy = the in-env trained conditional denoiser "
                             "(models/toy_guidance; tools/train_toy_guidance.py)")
    parser.add_argument("--toy_weights", default="artifacts/toy_guidance", type=str,
                        help="toy-guidance checkpoint dir (--guidance_type toy)")
    parser.add_argument("--tgt_text", default="zombie", type=str)
    parser.add_argument("--subsample_scale", default=4, type=int)
    parser.add_argument("--stylize_head", default=True, type=options.str2bool)
    parser.add_argument("--implicit_model", default="instant_nsr", choices=["neus", "instant_nsr"])
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--guidance_scale", default=100, type=float)
    parser.add_argument("--sd_version", default="1.5", type=str, choices=["1.5", "2.0"])
    parser.add_argument("--sd_weights", default=None, type=str,
                        help="path to converted Stable Diffusion weights (torch dir or file)")
    parser.add_argument("--use_opacity", default=True, type=options.str2bool)
    parser.add_argument("--w_opacity", default=1e5, type=float,
                        help="opacity-loss weight (reference: stylize.py:193)")
    parser.add_argument("--w_eikonal", default=0.01, type=float)
    parser.add_argument("--exp_name", type=str, default="zombie")
    parser.add_argument("--epochs", default=2, type=int)
    parser.add_argument("--coarse_epochs", default=40, type=int)
    parser.add_argument("--fine_epochs", default=20, type=int)
    parser.add_argument("--lr", default=5e-3, type=float)
    parser.add_argument("--i_val", default=100, type=int)
    parser.add_argument("--i_save", default=1000, type=int)
    parser.add_argument("--i_mesh", default=1000, type=int)
    parser.add_argument("--augment_bkg", default=True, type=options.str2bool)
    parser.add_argument("--augment_cam", default=True, type=options.str2bool)
    parser.add_argument("--augment_text", default=True, type=options.str2bool)
    parser.add_argument("--coarse_head", default=0.2, type=float)
    parser.add_argument("--fine_head", default=0.5, type=float)
    parser.add_argument("--max_steps", default=None, type=int)
    parser.add_argument("--out_dir", default="./style/canonical_360", type=str)
    parser.add_argument("--sampler", default="parity", choices=["parity", "fast"],
                        help="fast = occupancy-guided K-sample SDS (TPU flagship)")
    parser.add_argument("--grid_path", default=None, type=str,
                        help="density grid .npy from reconstruct (fast sampler; "
                             "refreshed from the field when omitted)")
    parser.add_argument("--encoder", default=None, choices=["hashgrid", "tpu_pyramid"],
                        help="override the checkpoint's (inferred) encoder")
    parser.add_argument("--normal_mode", default=None,
                        choices=["fd7", "fd4", "analytic"],
                        help="normal estimator for the fast sampler (default "
                             "fd4; analytic = exact jvp gradient, fastest)")
    parser.add_argument("--sample_budget", default=-1, type=int,
                        help="fast sampler: global per-call sample compaction "
                             "budget. -1 = derive from the schedule's own pose "
                             "distribution against the current grid (+35%% "
                             "margin); 0 = off (every ray pays k_samples)")
    return parser


def derive_sample_budget(cfg, grid, probe_cfg, chunk):
    """Max probe-selected sample count over the stylize pose distribution,
    measured per ``chunk``-ray contiguous slice (the phase-A/B call unit),
    +35% margin for SDS geometry drift, rounded to 4096.

    The bench derives the same quantity for its orbit (bench.py); here the
    sweep must include the head-box closeups (head fills the frame at dist
    0.5 -- far higher occupied-sample counts than body views)."""
    import jax
    import jax.numpy as jnp

    from avatarcraft_tpu.cameras import style_360_path
    from avatarcraft_tpu.constants import (
        CAN_HEAD_CAMERA_DIST,
        CAN_HEAD_OFFSET,
        CANONICAL_CAMERA_DIST_TRAIN,
    )
    from avatarcraft_tpu.models.instant_nsr import count_fast_samples

    rng = np.random.default_rng(123)
    center, up = np.zeros(3), np.array([0.0, 1.0, 0.0])
    poses = []
    for head_rate in (cfg.coarse_head, cfg.fine_head):
        p, _ = style_360_path(
            center, up, CANONICAL_CAMERA_DIST_TRAIN, 24,
            add_noise=cfg.augment_cam, noise_scale=2.0 if cfg.augment_cam else 1.0,
            style_head=cfg.stylize_head, head_offset=CAN_HEAD_OFFSET,
            head_rate=max(head_rate, 0.5) if cfg.stylize_head else 0.0,
            head_dist=CAN_HEAD_CAMERA_DIST, rng=rng,
        )
        poses.extend(p)

    from avatarcraft_tpu.cameras import pose2rays

    counter = jax.jit(lambda ro, rd, g: count_fast_samples(ro, rd, probe_cfg, g))
    worst = 0
    for pose in poses:
        ro, rd = pose2rays(cfg.H, cfg.W, pose)
        n = ro.shape[0]
        c = min(chunk, n)
        for i in range(0, n - c + 1, c):
            worst = max(worst, int(counter(
                jnp.asarray(ro[i:i + c]), jnp.asarray(rd[i:i + c]), grid)))
    budget = -(-int(worst * 1.35) // 4096) * 4096
    if budget >= chunk * probe_cfg.k_samples:
        return 0  # compaction would not drop anything; run unbudgeted
    return budget


def build_guidance(opt):
    from avatarcraft_tpu.models.diffusion import SDSGuidance, make_dummy_modules

    if opt.guidance_type == "toy":
        from avatarcraft_tpu.models.toy_guidance import (
            STYLES,
            load_toy_guidance,
            make_toy_modules,
            style_index,
        )

        params, tcfg = load_toy_guidance(opt.toy_weights)
        if style_index(opt.tgt_text) < 0:
            raise SystemExit(
                f"--tgt_text must name a trained toy style ({', '.join(STYLES)})"
            )
        modules = make_toy_modules(params, tcfg)
        print(f"[stylize] toy guidance from {opt.toy_weights} "
              f"(styles: {', '.join(tcfg.styles)})")
    elif opt.sd_weights:
        from avatarcraft_tpu.models.sd import load_stable_diffusion_modules

        modules = load_stable_diffusion_modules(opt.sd_weights, version=opt.sd_version)
        print(f"[stylize] loaded Stable Diffusion {opt.sd_version} from {opt.sd_weights}")
    else:
        modules = make_dummy_modules(image_size=512)
        print(
            "[stylize] WARNING: no --sd_weights given; using the deterministic "
            "stand-in guidance (pipeline smoke mode, no meaningful styles)."
        )
    return SDSGuidance(modules)


def main(argv=None):
    opt = build_parser().parse_args(argv)
    options.apply_platform(opt)
    options.print_opt(opt, os.path.join(opt.out_dir, opt.exp_name))

    import imageio.v2 as imageio
    import jax

    from avatarcraft_tpu.cameras import default_360_path, pose2rays
    from avatarcraft_tpu.constants import CANONICAL_CAMERA_DIST_VAL
    from avatarcraft_tpu.models.instant_nsr import (
        FieldConfig,
        RenderConfig,
        extract_geometry,
        render_rays_chunked,
    )
    from avatarcraft_tpu.utils.checkpoint import save_params_with_config
    from avatarcraft_tpu.utils.mesh_export import save_ply
    from avatarcraft_tpu.utils.metrics import integerify_img
    from avatarcraft_tpu.workloads.stylize import StylizeConfig, StylizeTrainer

    if opt.guidance_type == "clip":
        raise NotImplementedError("CLIP guidance is dead in the reference too")
    if opt.guidance_type == "toy":
        # fail on a typo'd style NOW, not after minutes of grid refresh +
        # budget derivation (build_guidance re-checks at trainer setup)
        from avatarcraft_tpu.models.toy_guidance import STYLES, style_index

        if style_index(opt.tgt_text) < 0:
            raise SystemExit(
                f"--tgt_text must name a trained toy style ({', '.join(STYLES)})"
            )

    from avatarcraft_tpu.utils.checkpoint import load_params_with_config

    assert opt.weights_path, "--weights_path (pretrained canonical field) is required"
    params_gt, fcfg = load_params_with_config(opt.weights_path)
    if opt.encoder and opt.encoder != fcfg.encoder:
        import dataclasses as _dc

        fcfg = _dc.replace(fcfg, encoder=opt.encoder)
    print(f"[stylize] field: encoder={fcfg.encoder}")
    params_style = jax.tree_util.tree_map(lambda x: x.copy(), params_gt)

    cfg = StylizeConfig(
        tgt_text=opt.tgt_text,
        guidance_scale=opt.guidance_scale,
        coarse_epochs=opt.coarse_epochs,
        fine_epochs=opt.fine_epochs,
        subsample_scale=opt.subsample_scale,
        batch_size=opt.batch_size,
        lr=opt.lr,
        w_eikonal=opt.w_eikonal,
        w_opacity=opt.w_opacity,
        use_opacity=opt.use_opacity,
        stylize_head=opt.stylize_head,
        coarse_head=opt.coarse_head,
        fine_head=opt.fine_head,
        augment_bkg=opt.augment_bkg,
        augment_cam=opt.augment_cam,
        augment_text=opt.augment_text,
        white_bkg=opt.white_bkg,
        sampler=opt.sampler,
    )

    grid = None
    fast_cfg = None
    if opt.sampler == "fast" and opt.grid_path:
        import jax.numpy as jnp

        grid = jnp.asarray(np.load(opt.grid_path))
    if opt.sampler == "fast" and opt.normal_mode is None:
        # honor the normal estimator the baked artifact was trained with
        from avatarcraft_tpu.utils.checkpoint import artifact_normal_mode

        baked = artifact_normal_mode(opt.weights_path)
        if baked:
            print(f"[stylize] normal_mode={baked} (from artifact provenance)")
            opt.normal_mode = baked
    if opt.sampler == "fast":
        import dataclasses as _dc

        import jax.numpy as jnp

        from avatarcraft_tpu.models.instant_nsr import FastRenderConfig

        fast_cfg = FastRenderConfig(
            bound=NSR_BOUND,
            normal_mode=opt.normal_mode or "fd4",
        )
        if grid is None:
            # the trainer would refresh it anyway; do it here so the budget
            # derivation below can probe against the real occupancy
            from avatarcraft_tpu.workloads.reconstruct import make_grid_update_fn

            grid = make_grid_update_fn(fcfg, NSR_BOUND)(
                params_style, jnp.zeros((129,) * 3, jnp.float32)
            )
        if opt.sample_budget < 0:
            budget = derive_sample_budget(cfg, grid, fast_cfg, opt.batch_size)
            print(f"[stylize] derived sample budget: {budget} "
                  f"(0 = compaction off)", flush=True)
        else:
            budget = opt.sample_budget
        fast_cfg = _dc.replace(fast_cfg, sample_budget=budget)
    trainer = StylizeTrainer(
        cfg, fcfg, build_guidance(opt), params_style, params_gt, grid=grid,
        fast_cfg=fast_cfg,
    )
    exp_dir = os.path.join(opt.out_dir, opt.exp_name)
    os.makedirs(exp_dir, exist_ok=True)

    if opt.sampler == "fast":
        # validation rides the fast sampler against the trainer's live grid:
        # the 64+64 parity render would cost ~1 min/frame plus a multi-minute
        # remote compile just for logging
        from avatarcraft_tpu.models.instant_nsr import render_rays_fast

        _val_fast = jax.jit(
            lambda p, ro, rd, g: render_rays_fast(
                p, ro, rd, fcfg, trainer.fast_cfg, g, 1.0
            )["rgb"]
        )
        # budget-safe: the derived sample budget is sized per batch_size-ray
        # call, so the val render must use the same chunk size
        _val_chunk = opt.batch_size

        def val_render(p, ro, rd):
            # host-side chunk loop: reuses one small-shape executable instead
            # of compiling a full-frame single-shot program (a multi-minute
            # compile that looks like a stall to run supervisors)
            n = ro.shape[0]
            pad = (-n) % _val_chunk
            if pad:
                ro = np.concatenate([ro, np.zeros((pad, 3), ro.dtype)])
                rd = np.concatenate([rd, np.tile(rd[-1:], (pad, 1))])
            outs = [
                _val_fast(p, ro[i : i + _val_chunk], rd[i : i + _val_chunk], trainer.grid)
                for i in range(0, n + pad, _val_chunk)
            ]
            return np.concatenate([np.asarray(o) for o in outs])[:n]
    else:
        rcfg_val = RenderConfig(num_steps=64, upsample_steps=64, bound=NSR_BOUND)
        val_render = jax.jit(
            lambda p, ro, rd: render_rays_chunked(
                p, ro, rd, jax.random.PRNGKey(0), fcfg, rcfg_val, 1.0, chunk=opt.batch_size
            )["rgb"]
        )

    def log_img(step, params):
        poses, _ = default_360_path(
            np.zeros(3), np.array([0.0, 1.0, 0.0]), CANONICAL_CAMERA_DIST_VAL, cfg.n_cap
        )
        rays_o, rays_d = pose2rays(cfg.H, cfg.W, poses[0])
        rgb = val_render(params, rays_o, rays_d)
        img = integerify_img(np.asarray(rgb).reshape(cfg.H, cfg.W, 3))
        path = os.path.join(exp_dir, f"{opt.exp_name}_{step + 1:04d}_body.png")
        imageio.imwrite(path, img)
        print(f"image saved: {path}")

    import time as _time

    # rate baseline starts at the FIRST completed step, not process start:
    # the first phase-A/B executables take minutes of remote compile, which
    # would otherwise poison the steps/s readout for thousands of steps
    _clock = {"t0": None, "step0": 0}

    def on_step(step, params):
        if _clock["t0"] is None:
            jax.block_until_ready(params)
            _clock["t0"], _clock["step0"] = _time.time(), step + 1
        elif (step + 1) % 20 == 0:
            # block on the params so the printed step count is REAL device
            # progress (dispatch is async; without this the host races ahead
            # and the log goes silent while the backlog drains)
            jax.block_until_ready(params)
            rate = (step + 1 - _clock["step0"]) / (_time.time() - _clock["t0"])
            print(f"[stylize] step {step + 1} ({rate:.2f} steps/s)", flush=True)
        if (step + 1) % opt.i_val == 0:
            log_img(step, params)
        if (step + 1) % opt.i_save == 0:
            path = os.path.join(exp_dir, f"{opt.exp_name}_{step + 1:04d}.pth.tar")
            save_params_with_config(jax.device_get(params), path, fcfg)
            print(f"weights saved: {path}")
        if (step + 1) % opt.i_mesh == 0:
            verts, faces = extract_geometry(params, fcfg, NSR_BOUND, 512)
            save_ply(verts, faces, os.path.join(exp_dir, f"{opt.exp_name}_{step + 1:04d}.ply"))

    steps = trainer.train(max_steps=opt.max_steps, on_step=on_step)
    final = os.path.join(exp_dir, f"{opt.exp_name}_final.pth.tar")
    save_params_with_config(jax.device_get(trainer.params_style), final, fcfg)
    print(f"finished {steps} SDS steps; weights saved: {final}")


if __name__ == "__main__":
    main()
