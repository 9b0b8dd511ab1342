"""Build a mesh-derived demo body for pickle-free render_warp demos.

SMPL's model file is user-supplied in the reference (readme.md:40-47) and is
not bundled here either. The synthetic test fixture animates the pipeline but
its random-blob geometry produces speckled warps. This tool instead extracts
the CONVERGED avatar's surface from the baked artifact (marching tetrahedra
over the SDF) and wraps it in a trivial rig:

  * v_template = extracted surface / SMPL_SCALE (field space is SMPL x 0.9),
  * all skinning weight on the root joint (rigid under the da-pose),
  * shapedirs: beta_1 = vertical stretch, beta_2 = radial scale about the
    centroid -- so ``render_warp --render_type interp_shape`` morphs the real
    avatar smoothly (the reference's beta_2 = +-2 demo, render_warp.py:28-42),
  * zero posedirs.

Because the demo body's surface IS the avatar's surface, the warp's
dist^2 < 0.05 mask hugs the geometry and the morph renders clean.

Usage:
    python tools/make_demo_body.py [--ckpt artifacts/canonical/bare_smpl_tpu.pth.tar]
        [--out artifacts/canonical/demo_body.npz] [--resolution 128]
Then:
    python render_warp.py --smpl_path artifacts/canonical/demo_body.npz \
        --render_type interp_shape --sampler fast ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="artifacts/canonical/bare_smpl_tpu.pth.tar")
    ap.add_argument("--out", default="artifacts/canonical/demo_body.npz")
    ap.add_argument("--resolution", default=128, type=int)
    ap.add_argument("--n_betas", default=10, type=int)
    ap.add_argument("--n_joints", default=4, type=int,
                    help="--rig root only; the articulated rig is 7 joints")
    ap.add_argument("--rig", default="root", choices=["root", "articulated"],
                    help="root = rigid (interp_shape morphs); articulated = "
                         "7-joint body rig segmented from the da-pose "
                         "geometry (head/arms/legs animate; render_warp "
                         "--render_type animate demos)")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "default"])
    opt = ap.parse_args(argv)

    if opt.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from avatarcraft_tpu.constants import NSR_BOUND, SMPL_SCALE
    from avatarcraft_tpu.models.instant_nsr import extract_geometry
    from avatarcraft_tpu.utils.checkpoint import load_params_with_config

    params, fcfg = load_params_with_config(opt.ckpt)
    verts, faces = extract_geometry(params, fcfg, NSR_BOUND, opt.resolution)
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    print(f"extracted {len(verts)} verts / {len(faces)} faces "
          f"at {opt.resolution}^3", file=sys.stderr)

    v_template = verts / SMPL_SCALE
    center = v_template.mean(axis=0, keepdims=True)
    V, B = len(v_template), opt.n_betas

    shapedirs = np.zeros((V, 3, B), np.float32)
    shapedirs[:, 1, 0] = (v_template[:, 1] - center[0, 1]) * 0.05  # stretch
    shapedirs[:, :, 1] = (v_template - center) * 0.05  # radial scale

    if opt.rig == "articulated":
        # 7-joint rig segmented from the da-pose silhouette: root(pelvis),
        # spine, head, L/R arm, L/R leg. Smooth region weights (sigmoid
        # falloffs) keep the LBS deformation continuous where limbs meet the
        # torso; joints regress from vertices near hand-placed anchor points.
        x, y = v_template[:, 0], v_template[:, 1]
        y0, y1 = float(y.min()), float(y.max())
        H = y1 - y0
        y_pelvis = y0 + 0.42 * H
        y_neck = y0 + 0.80 * H
        x_sh = 0.16 * float(np.abs(x).max())

        def smooth(t):
            return 1.0 / (1.0 + np.exp(-t))

        w_head = smooth((y - y_neck) / (0.04 * H))
        upper = smooth((y - y_pelvis) / (0.04 * H))
        w_larm = smooth((x - x_sh) / (0.03)) * upper * (1 - w_head)
        w_rarm = smooth((-x - x_sh) / (0.03)) * upper * (1 - w_head)
        lower = 1.0 - upper
        side = smooth(x / 0.02)
        w_lleg = lower * side
        w_rleg = lower * (1 - side)
        w_spine = smooth((y - (y0 + 0.62 * H)) / (0.06 * H)) * (
            1 - w_head
        ) * (1 - np.clip(w_larm + w_rarm, 0, 1))
        w = np.stack(
            [np.zeros(V), w_spine, w_head, w_larm, w_rarm, w_lleg, w_rleg], 1
        ).astype(np.float32)
        w = np.clip(w, 0.0, 1.0)
        w[:, 0] = np.clip(1.0 - w[:, 1:].sum(1), 0.0, None)  # root remainder
        w /= w.sum(1, keepdims=True)

        anchors = np.array(
            [
                [0.0, y_pelvis, 0.0],                     # root
                [0.0, y0 + 0.62 * H, 0.0],                # spine/chest
                [0.0, y_neck, 0.0],                       # head (neck pivot)
                [x_sh, y0 + 0.72 * H, 0.0],               # L shoulder
                [-x_sh, y0 + 0.72 * H, 0.0],              # R shoulder
                [0.10 * H, y_pelvis, 0.0],                # L hip
                [-0.10 * H, y_pelvis, 0.0],               # R hip
            ],
            np.float32,
        )
        J = len(anchors)
        d2 = ((v_template[None] - anchors[:, None]) ** 2).sum(-1)  # [J, V]
        reg = np.exp(-d2 / (0.02 * H) ** 2)
        J_regressor = (reg / reg.sum(1, keepdims=True)).astype(np.float32)
        parents = np.array([-1, 0, 1, 1, 1, 0, 0], np.int32)
        lbs_weights = w
    else:
        J = opt.n_joints
        J_regressor = np.full((J, V), 1.0 / V, np.float32)
        parents = np.arange(-1, J - 1, dtype=np.int32)
        lbs_weights = np.concatenate(
            [np.ones((V, 1), np.float32), np.zeros((V, J - 1), np.float32)], axis=1
        )

    np.savez_compressed(
        opt.out,
        v_template=v_template,
        shapedirs=shapedirs,
        posedirs=np.zeros(((J - 1) * 9, V * 3), np.float32),
        J_regressor=J_regressor,
        parents=parents,
        lbs_weights=lbs_weights,
        faces=faces,
        # the template IS the da-posed surface -> warp rest pose is zero;
        # render_warp_cli reads this marker to pick --rest_pose
        rest_pose=np.array("zero"),
    )
    print(f"saved {opt.out} (rig={opt.rig}, J={J}, "
          f"{os.path.getsize(opt.out) / 2**20:.1f} MB)")


if __name__ == "__main__":
    main()
