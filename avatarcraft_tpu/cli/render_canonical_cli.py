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
    parser.add_argument("--encoder", default=None, choices=["hashgrid", "tpu_pyramid"],
                        help="override the checkpoint's (inferred) encoder")
    parser.add_argument("--sampler", default="parity", choices=["parity", "fast"],
                        help="fast = occupancy-guided K-sample rendering")
    parser.add_argument("--grid_path", default=None, type=str,
                        help="density grid .npy for --sampler fast (from "
                             "reconstruct); omit = refresh from the SDF")
    parser.add_argument("--normal_mode", default=None,
                        choices=["fd7", "fd4", "analytic"],
                        help="normal estimator (default: fd7 for parity, fd4 "
                             "for fast; analytic = exact jvp gradient, "
                             "fastest)")
    parser.add_argument("--mesh_devices", default=0, type=int,
                        help="shard each render chunk's ray axis over an "
                             "N-device jax.sharding.Mesh (data parallel; "
                             "params replicated, XLA inserts the collectives). "
                             "0 = single-device. Validated vs replicated "
                             "renders by __graft_entry__.dryrun_multichip")
    return parser


def main(argv=None):
    opt = build_parser().parse_args(argv)
    options.apply_platform(opt)

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from avatarcraft_tpu.cameras import default_360_path, pose2rays
    from avatarcraft_tpu.models.instant_nsr import (
        RenderConfig,
        render_rays_chunked,
    )
    from avatarcraft_tpu.utils.checkpoint import load_params_with_config
    from avatarcraft_tpu.utils.metrics import integerify_img

    h = opt.render_h or 256
    w = opt.render_w or 256
    bg = 1.0 if opt.white_bkg else 0.0
    rcfg = RenderConfig(num_steps=64, upsample_steps=64, bound=NSR_BOUND, perturb=False,
                        normal_mode=opt.normal_mode or "fd7")

    # ---- field / render dispatch (--implicit_model, reference parity for
    # the legacy models the reference only half-supports) -------------------
    if opt.implicit_model == "nerf":
        from avatarcraft_tpu.models.nerf import (
            NeRFConfig,
            init_nerf_params,
            render_nerf_rays,
        )

        ncfg = NeRFConfig(mapping=opt.can_posenc)
        if opt.weights_path and os.path.isdir(opt.weights_path):
            from avatarcraft_tpu.utils.checkpoint import load_checkpoint

            params = load_checkpoint(opt.weights_path)
        else:
            print("[render] WARNING: no orbax NeRF checkpoint; random init")
            params = init_nerf_params(jax.random.PRNGKey(0), ncfg)

        render = jax.jit(
            lambda p, ro, rd: {
                "rgb": render_nerf_rays(p, ro, rd, ncfg, white_bkg=opt.white_bkg)["rgb"],
                "depth": render_nerf_rays(p, ro, rd, ncfg, white_bkg=opt.white_bkg)["depth"],
            }
        )
    elif opt.implicit_model == "neus":
        from avatarcraft_tpu.models.neus import (
            NeuSConfig,
            build_neus,
            init_neus_params,
        )

        ncfg = NeuSConfig()
        if opt.weights_path and os.path.isdir(opt.weights_path):
            from avatarcraft_tpu.utils.checkpoint import load_checkpoint

            params = load_checkpoint(opt.weights_path)
        else:
            print("[render] WARNING: no orbax NeuS checkpoint; SAL sphere init")
            params = init_neus_params(jax.random.PRNGKey(0), ncfg)
        from avatarcraft_tpu.models.instant_nsr import FieldConfig

        fcfg = FieldConfig()  # unused by the injected field
        render = jax.jit(
            lambda p, ro, rd: render_rays_chunked(
                {}, ro, rd, jax.random.PRNGKey(0), fcfg, rcfg, bg,
                chunk=opt.batch_size, field=build_neus(p, ncfg),
            )
        )
    else:
        params, fcfg = load_params_with_config(opt.weights_path)
        if opt.encoder and opt.encoder != fcfg.encoder:
            import dataclasses as _dc

            fcfg = _dc.replace(fcfg, encoder=opt.encoder)
        if opt.normal_mode is None:
            # baked artifacts record which estimator the color net was
            # trained against (PROVENANCE.json); honor it unless overridden
            from avatarcraft_tpu.utils.checkpoint import artifact_normal_mode

            baked = artifact_normal_mode(opt.weights_path)
            if baked:
                print(f"[render] normal_mode={baked} (from artifact provenance)")
                import dataclasses as _dc

                rcfg = _dc.replace(rcfg, normal_mode=baked)
                opt.normal_mode = baked
        print(f"[render] field: encoder={fcfg.encoder} use_viewdirs={fcfg.use_viewdirs}")

        if opt.sampler == "fast":
            from avatarcraft_tpu.models.instant_nsr import (
                FastRenderConfig,
                render_rays_fast,
            )

            if opt.grid_path:
                grid = jnp.asarray(np.load(opt.grid_path))
            else:
                print("[render] refreshing density grid from the SDF ...")
                # params must be a jit ARGUMENT: a closed-over param tree is
                # serialized into the remote-compile request (HTTP 413 at
                # full model size)
                from avatarcraft_tpu.workloads.reconstruct import make_grid_update_fn

                grid = make_grid_update_fn(fcfg, NSR_BOUND)(
                    params, jnp.zeros((129,) * 3, jnp.float32)
                )
            fast_cfg = FastRenderConfig(n_probes=192, k_samples=32, bound=NSR_BOUND,
                                        normal_mode=opt.normal_mode or "fd4")
            chunk = opt.batch_size * 4

            _fast = jax.jit(
                lambda p, ro, rd: render_rays_fast(p, ro, rd, fcfg, fast_cfg, grid, bg)
            )

            def render(p, ro, rd):
                outs = {"rgb": [], "depth": []}
                n = ro.shape[0]
                pad = (-n) % chunk
                ro = jnp.concatenate([ro, jnp.ones((pad, 3), ro.dtype)])
                rd = jnp.concatenate(
                    [rd, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))]
                )
                for i in range(0, n + pad, chunk):
                    o = _fast(p, ro[i : i + chunk], rd[i : i + chunk])
                    outs["rgb"].append(o["rgb"])
                    outs["depth"].append(o["depth"])
                return {
                    "rgb": jnp.concatenate(outs["rgb"])[:n],
                    "depth": jnp.concatenate(outs["depth"])[:n],
                }
        else:
            render = jax.jit(
                lambda p, ro, rd: render_rays_chunked(
                    p, ro, rd, jax.random.PRNGKey(0), fcfg, rcfg, bg,
                    chunk=opt.batch_size,
                )
            )

    if opt.mesh_devices and opt.mesh_devices > 1:
        # data-parallel frame rendering: rays sharded over the mesh, params
        # replicated; XLA partitions the render and gathers the frame
        # (equivalence vs replicated pinned by dryrun_multichip sharded-frame)
        from avatarcraft_tpu.parallel.mesh import data_sharding, make_mesh, replicate

        mesh = make_mesh(opt.mesh_devices)
        params = replicate(mesh, params)
        _sh2 = data_sharding(mesh, 2)
        _render_1dev = render

        def render(p, ro, rd, _inner=_render_1dev, _sh=_sh2):
            return _inner(p, jax.device_put(ro, _sh), jax.device_put(rd, _sh))

        print(f"[render] ray axis sharded over {opt.mesh_devices} devices")

    center, up = np.zeros(3), np.array([0.0, 1.0, 0.0])
    body_poses, _ = default_360_path(center, up, CANONICAL_CAMERA_DIST_VAL, opt.trajectory_resolution)
    head_poses, _ = default_360_path(
        center + np.array([0.0, 1.0, 0.0]) * CAN_HEAD_OFFSET, up,
        CAN_HEAD_CAMERA_DIST, opt.trajectory_resolution,
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
