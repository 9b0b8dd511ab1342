"""CLI: 360-degree canonical renders, body + head orbits
(reference: render_canonical.py:37-137)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from avatarcraft_tpu.cli import options
from avatarcraft_tpu.constants import (
    CAN_HEAD_CAMERA_DIST,
    CAN_HEAD_OFFSET,
    NSR_BOUND,
)

# reference overrides the module constant for the supplementary video
# (render_canonical.py:34)
CANONICAL_CAMERA_DIST_VAL = 1.7


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
    parser.add_argument("--log_extra", default=False, type=options.str2bool)
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--out_dir", default="./demo", type=str)
    return parser


def main(argv=None):
    opt = build_parser().parse_args(argv)
    options.apply_platform(opt)

    import imageio.v2 as imageio
    import jax

    from avatarcraft_tpu.cameras import default_360_path, pose2rays
    from avatarcraft_tpu.models.instant_nsr import (
        FieldConfig,
        RenderConfig,
        render_rays_chunked,
    )
    from avatarcraft_tpu.utils.checkpoint import safe_load_params
    from avatarcraft_tpu.utils.metrics import integerify_img

    h = opt.render_h or 256
    w = opt.render_w or 256
    fcfg = FieldConfig()
    rcfg = RenderConfig(num_steps=64, upsample_steps=64, bound=NSR_BOUND, perturb=False)
    params = safe_load_params(opt.weights_path)

    center, up = np.zeros(3), np.array([0.0, 1.0, 0.0])
    body_poses, _ = default_360_path(center, up, CANONICAL_CAMERA_DIST_VAL, opt.trajectory_resolution)
    head_poses, _ = default_360_path(
        center + np.array([0.0, 1.0, 0.0]) * CAN_HEAD_OFFSET, up,
        CAN_HEAD_CAMERA_DIST, opt.trajectory_resolution,
    )

    render = jax.jit(
        lambda p, ro, rd: render_rays_chunked(
            p, ro, rd, jax.random.PRNGKey(0), fcfg, rcfg,
            1.0 if opt.white_bkg else 0.0, chunk=opt.batch_size,
        )
    )

    exp_dir = os.path.join(opt.out_dir, "canonical_360", opt.exp_name)
    os.makedirs(exp_dir, exist_ok=True)

    for pose_name, poses in (("body", body_poses), ("head", head_poses)):
        imgs, extrinsics = [], []
        for i, c2w in enumerate(poses):
            rays_o, rays_d = pose2rays(h, w, c2w)
            out = render(params, rays_o, rays_d)
            img = integerify_img(np.asarray(out["rgb"]).reshape(h, w, 3))
            imgs.append(img)
            extrinsics.append(c2w)
            path = os.path.join(exp_dir, f"{opt.exp_name}_{pose_name}_can_{i:04d}.png")
            imageio.imwrite(path, img)
            print(f"image saved: {path}")
            if opt.log_extra:
                # JET-colormapped depth, empty pixels black
                # (reference: render_canonical.py:85-109)
                import cv2

                depth = np.asarray(out["depth"]).reshape(h, w, 1)
                mask = depth < 4e-1
                depth[mask] = 0.45
                depth = (depth - depth.min()) / max(depth.max() - depth.min(), 1e-8)
                depth8 = (depth * 255).astype(np.uint8)
                dimg = cv2.applyColorMap(depth8, cv2.COLORMAP_JET)
                dimg[mask.repeat(3, axis=2)] = 0
                dpath = os.path.join(
                    exp_dir, f"{opt.exp_name}_{pose_name}_can_{i:04d}_depth.png"
                )
                imageio.imwrite(dpath, dimg)

        gif = os.path.join(exp_dir, f"{opt.exp_name}_{pose_name}_can.gif")
        imageio.mimsave(gif, imgs, fps=15, loop=0)
        print(f"gif saved: {gif}")
        if opt.log_extra:
            import pickle

            from avatarcraft_tpu.cameras.rays import canonical_camera

            with open(os.path.join(exp_dir, f"{opt.exp_name}_{pose_name}_intrinsic.pkl"), "wb") as f:
                pickle.dump(canonical_camera(h, w).intrinsic, f)
            with open(os.path.join(exp_dir, f"{opt.exp_name}_{pose_name}_extrinsic.pkl"), "wb") as f:
                pickle.dump(np.stack(extrinsics), f)


if __name__ == "__main__":
    main()
