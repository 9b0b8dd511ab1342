"""CLI: animation / shape-interpolation rendering
(reference: render_warp.py entry point)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from avatarcraft_tpu.cli import options


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    options.set_general_option(parser)
    options.set_nerf_option(parser)
    options.set_pe_option(parser)
    options.set_render_option(parser)
    options.set_trajectory_option(parser)
    parser.add_argument("--exp_name", default="exp", type=str)
    parser.add_argument("--implicit_model", default="instant_nsr",
                        choices=["neus", "nerf", "instant_nsr"])
    parser.add_argument("--poseseq_path", default=None, type=str)
    parser.add_argument("--render_type", default="animate", choices=["animate", "interp_shape"])
    parser.add_argument("--shape_from_path", type=str, default=None)
    parser.add_argument("--shape_to_path", type=str, default=None)
    parser.add_argument("--max_frames", default=20, type=int)
    parser.add_argument("--resolution", default=256, type=int, choices=[128, 256, 512])
    parser.add_argument("--render_view", default=58, type=int,
                        help="dataset camera index (reference uses 58/33/...)")
    parser.add_argument("--smpl_path", default="data/smplx/smpl", type=str,
                        help="SMPL_NEUTRAL.pkl dir (user-supplied, like the "
                             "reference); 'synthetic' uses the test-fixture "
                             "body for a pickle-free pipeline demo")
    parser.add_argument("--data_path", default="data/smpl_da_512", type=str)
    parser.add_argument("--out_dir", default="./demo", type=str)
    parser.add_argument("--sampler", default="parity", choices=["parity", "fast"],
                        help="fast = per-frame voxelized posed-space occupancy "
                             "+ compacted kNN warp (TPU flagship)")
    parser.add_argument("--rest_pose", default=None, choices=["da", "zero"],
                        help="pose the canonical field was trained in. "
                             "Default: 'da' (reference parity) for SMPL "
                             "bodies, 'zero' for mesh-derived demo bodies "
                             "(their template IS the da-posed surface)")
    return parser


def main(argv=None):
    opt = build_parser().parse_args(argv)
    options.apply_platform(opt)

    import imageio.v2 as imageio
    import jax

    from avatarcraft_tpu.data import SMPLMultiviewDataset
    from avatarcraft_tpu.data.amass import load_pose_sequence
    from avatarcraft_tpu.models.instant_nsr import FieldConfig
    from avatarcraft_tpu.models.smpl import load_smpl
    from avatarcraft_tpu.utils.checkpoint import load_params_with_config
    from avatarcraft_tpu.utils.metrics import integerify_img
    from avatarcraft_tpu.warp import WarpData
    from avatarcraft_tpu.workloads.warp_render import (
        WarpRenderSettings,
        calc_local_trans,
        make_warp_frame_renderer,
    )

    pose_seq = None
    if opt.poseseq_path is not None:
        pose_seq = load_pose_sequence(opt.poseseq_path)

    shape_from = np.load(opt.shape_from_path).astype(np.float32) if opt.shape_from_path else None
    shape_to = np.load(opt.shape_to_path).astype(np.float32) if opt.shape_to_path else None

    if opt.smpl_path == "synthetic":
        from avatarcraft_tpu.models.smpl import synthetic_smpl_params

        print("[render_warp] WARNING: synthetic SMPL body (demo mode; "
              "supply --smpl_path for real animation)")
        model = synthetic_smpl_params(0, n_verts=512, n_joints=24)
    else:
        model = load_smpl(opt.smpl_path)
    rest = opt.rest_pose
    if rest is None:
        # default from rig provenance, NOT file extension: real SMPL bodies
        # may also ship as .npz (models/smpl.py:53-57) and those are
        # da-pose-trained like the reference's pickle
        rest = "da"
        if opt.smpl_path.endswith(".npz"):
            with np.load(opt.smpl_path) as d:
                if "rest_pose" in d.files:
                    rest = str(d["rest_pose"])
                else:
                    print("[render_warp] WARNING: .npz body without a "
                          "rest_pose marker; assuming 'da' (reference "
                          "parity). Mesh-derived demo bodies from "
                          "tools/make_demo_body.py carry rest_pose='zero'; "
                          "pass --rest_pose to override.")
    world_verts, Ts, n_frames = calc_local_trans(
        model,
        render_type=opt.render_type,
        poses=pose_seq,
        shape_from=shape_from,
        shape_to=shape_to,
        max_frames=opt.max_frames,
        rest_pose=rest,
    )

    params, fcfg = load_params_with_config(opt.weights_path)
    print(f"[render_warp] field: encoder={fcfg.encoder}")

    ds = SMPLMultiviewDataset(opt.data_path)
    pose = ds.poses[opt.render_view]
    subsample = int(ds.H / opt.resolution)
    rays_o, rays_d = ds.gen_rays_pose(pose, subsample)

    settings = WarpRenderSettings()
    if opt.sampler == "fast":
        from avatarcraft_tpu.workloads.warp_render import (
            derive_warp_budget,
            make_warp_frame_renderer_fast,
        )

        # honest per-chunk sample budget from the pose sequence itself
        # (zero-clip discipline, same derivation as bench.py --path=warp):
        # the old fixed 12-samples/ray cap silently clipped converged fields
        budget = derive_warp_budget(world_verts, rays_o, rays_d, settings)
        print(f"[render_warp] derived sample budget: {budget}/chunk "
              f"(zero-clip over {n_frames} frames)")
        render_frame = make_warp_frame_renderer_fast(
            fcfg, settings, 1.0 if opt.white_bkg else 0.0,
            sample_budget=budget,
        )
    else:
        render_frame = make_warp_frame_renderer(
            fcfg, settings, 1.0 if opt.white_bkg else 0.0
        )

    exp_dir = os.path.join(opt.out_dir, "test_views", opt.exp_name)
    os.makedirs(exp_dir, exist_ok=True)
    preds = []
    for i in range(n_frames):
        data = WarpData.create(world_verts[i], model.faces, Ts[i])
        rgb = render_frame(params, rays_o, rays_d, data)
        img = integerify_img(
            np.asarray(rgb).reshape(opt.resolution, opt.resolution, 3)
        )
        path = os.path.join(exp_dir, f"{opt.exp_name}_{i:04d}.png")
        imageio.imwrite(path, img)
        print(f"image saved: {path}")
        preds.append(img)

    if opt.render_type == "interp_shape":
        preds = preds + preds[::-1]  # smoother loop (reference: render_warp.py:118-120)
    gif = os.path.join(exp_dir, f"{opt.exp_name}.gif")
    imageio.mimsave(gif, preds, fps=10, loop=0)
    print(f"gif saved: {gif}")


if __name__ == "__main__":
    main()
