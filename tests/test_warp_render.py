"""calc_local_trans + warped frame rendering on the synthetic SMPL."""

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.constants import SMPL_SCALE
from avatarcraft_tpu.data.amass import convert_amass_poses
from avatarcraft_tpu.models.smpl import synthetic_smpl_params
from avatarcraft_tpu.workloads.warp_render import calc_local_trans, da_pose

MODEL = synthetic_smpl_params(0, n_verts=48, n_joints=24)


def test_da_pose_layout():
    p = da_pose(72).reshape(24, 3)
    np.testing.assert_array_equal(p[1], [0, 0, 1.0])
    np.testing.assert_array_equal(p[2], [0, 0, -1.0])
    assert (p[3:] == 0).all() and (p[0] == 0).all()


def test_convert_amass():
    poses = np.random.default_rng(0).normal(size=(55, 156)).astype(np.float32)
    seq = convert_amass_poses(poses, stride=10)
    assert seq.shape == (6, 24, 3)
    np.testing.assert_array_equal(seq[0].reshape(-1)[:63], poses[0, :63])
    np.testing.assert_array_equal(seq[0].reshape(-1)[63:], 0)


def test_animate_with_da_pose_is_pure_scale():
    """Target pose == canonical da pose, beta=0 => T = I / SMPL_SCALE."""
    da = da_pose(72).reshape(1, 24, 3)
    world_verts, Ts, n = calc_local_trans(
        MODEL, render_type="animate", poses=da, max_frames=1
    )
    assert n == 1
    want = np.eye(4) / SMPL_SCALE
    want[3, 3] = 1.0 / SMPL_SCALE  # the reference scales the full matrix
    np.testing.assert_allclose(Ts[0], np.broadcast_to(want, Ts[0].shape), atol=1e-4)


def test_interp_shape_endpoints_and_count():
    world_verts, Ts, n = calc_local_trans(
        MODEL, render_type="interp_shape", n_interp=10, max_frames=5
    )
    assert n == 5
    assert len(world_verts) == 5 and len(Ts) == 5
    assert world_verts[0].shape == (MODEL.n_verts, 3)
    assert Ts[0].shape == (MODEL.n_verts + MODEL.n_joints, 4, 4)
    # shape morphing moves the vertices between frames
    assert not np.allclose(world_verts[0], world_verts[4], atol=1e-5)
    for T in Ts:
        assert np.isfinite(T).all()


def test_animate_frames_track_pose_sequence(rng):
    poses = rng.normal(scale=0.2, size=(3, 24, 3)).astype(np.float32)
    world_verts, Ts, n = calc_local_trans(
        MODEL, render_type="animate", poses=poses, max_frames=3
    )
    assert n == 3
    # different poses -> different posed vertices
    assert not np.allclose(world_verts[0], world_verts[1], atol=1e-5)
    # The warp applies Ts^-1 to posed points without dehomogenizing
    # (reference: utils/ray_utils.py:82); on the vertices themselves this must
    # land exactly on the SMPL_SCALE-shrunk canonical rest mesh -- i.e. the
    # coordinates the canonical field was trained in.
    from avatarcraft_tpu.models.smpl import smpl_forward
    from avatarcraft_tpu.workloads.warp_render import da_pose as dp

    rest = np.asarray(
        smpl_forward(MODEL, jnp.asarray(dp(72)), jnp.zeros((1, 10)))[0]
    )
    world_h = np.concatenate(
        [world_verts[0], np.ones((MODEL.n_verts, 1), np.float32)], axis=-1
    )
    T_inv = np.linalg.inv(Ts[0][: MODEL.n_verts])
    can = np.einsum("vij,vj->vi", T_inv, world_h)[:, :3]
    np.testing.assert_allclose(can, SMPL_SCALE * rest, atol=1e-3)


def test_golden_frame_calc_local_trans_and_warp():
    """Golden pin (VERDICT r1 #9): exact T_rest2pose entries, posed verts and
    warp outputs for one fixed synthetic pose. Any change to the SMPL LBS
    chain, calc_local_trans composition (T_t2pose . T_shape^-1 . T_t2rest^-1
    . I/SMPL_SCALE, reference: render_warp.py:171-204) or the kNN warp
    (reference: utils/ray_utils.py:62-90) trips this test."""
    from avatarcraft_tpu.warp import WarpData, make_warp_fn

    rng = np.random.default_rng(7)
    pose = rng.normal(scale=0.3, size=(1, 24, 3)).astype(np.float32)
    world_verts, Ts, n = calc_local_trans(
        MODEL, render_type="animate", poses=pose, max_frames=1
    )
    assert n == 1
    T = Ts[0]
    np.testing.assert_allclose(
        T[0, 0], [0.023374, 0.557706, 0.020922, -0.064532], atol=2e-5
    )
    np.testing.assert_allclose(
        T[10, 1], [-0.137501, -0.005743, -0.031638, 0.074049], atol=2e-5
    )
    np.testing.assert_allclose(
        world_verts[0][0], [-0.099688, 0.010991, 0.186265], atol=2e-5
    )
    np.testing.assert_allclose(
        world_verts[0][20], [-0.149553, 0.123837, 0.389621], atol=2e-5
    )

    faces = np.stack(
        [np.arange(46), np.arange(1, 47), np.arange(2, 48)], 1
    ).astype(np.int32)
    wd = WarpData.create(world_verts[0], faces, T[:48])
    wf = make_warp_fn(wd, 0.05)
    pts = jnp.asarray(world_verts[0][:4] + 0.01)[None, :, :]
    can_pts, can_dirs, mask = wf(pts)
    np.testing.assert_allclose(
        np.asarray(can_pts)[0],
        [
            [0.054133, -0.066407, 0.198854],
            [0.038344, -0.168733, 0.105164],
            [0.295241, 0.271273, 0.055329],
            [-0.323089, -0.235368, 0.025179],
        ],
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(can_dirs)[0, 0], [-0.113073, -0.732814, -0.670968], atol=5e-5
    )
    assert np.asarray(mask).all()


def test_fast_warp_render_matches_parity():
    """Occupancy fast path with warp (posed-space voxelized grid + compacted
    kNN warp) stays close to the parity warped render, and miss rays hit the
    background exactly."""
    from avatarcraft_tpu.models.instant_nsr import FieldConfig, init_field_params
    from avatarcraft_tpu.ops.grid_encoder import PyramidSpec
    from avatarcraft_tpu.warp import WarpData
    from avatarcraft_tpu.workloads.warp_render import (
        WarpRenderSettings,
        make_warp_frame_renderer,
        make_warp_frame_renderer_fast,
    )

    rng = np.random.default_rng(3)
    pose = rng.normal(scale=0.2, size=(1, 24, 3)).astype(np.float32)
    world_verts, Ts, _ = calc_local_trans(
        MODEL, render_type="animate", poses=pose, max_frames=1
    )
    data = WarpData.create(world_verts[0], MODEL.faces, Ts[0][: MODEL.n_verts])

    fcfg = FieldConfig(
        encoder="tpu_pyramid",
        pyramid=PyramidSpec(
            grid_resolutions=(8, 16), grid_dim=2, plane_resolutions=(33,), plane_dim=2
        ),
        packed_dtype="float32",
    )
    params = init_field_params(jax.random.PRNGKey(0), fcfg)

    # rays through the posed body + one clear miss
    center = np.asarray(world_verts[0]).mean(0)
    rays_o = np.array(
        [center + [0, 0, -2.0], center + [0.02, 0.01, -2.0], [1.5, 1.5, -2.0]],
        np.float32,
    )
    d = np.array([[0, 0, 1.0]] * 3, np.float32)
    rays_o, d = jnp.asarray(rays_o), jnp.asarray(d)

    settings = WarpRenderSettings(num_steps=16, upsample_steps=16, chunk=3)
    parity = make_warp_frame_renderer(fcfg, settings, bg_value=0.25)
    fast = make_warp_frame_renderer_fast(
        fcfg, settings, bg_value=0.25, k_samples=16, n_probes=64,
        sample_budget_per_ray=16, grid_resolution=65,
    )
    rgb_p = np.asarray(parity(params, rays_o, d, data))
    rgb_f = np.asarray(fast(params, rays_o, d, data))
    assert np.isfinite(rgb_f).all()
    # miss ray: exact background on both paths
    np.testing.assert_allclose(rgb_f[2], 0.25, atol=1e-3)
    np.testing.assert_allclose(rgb_p[2], 0.25, atol=1e-3)
    # body rays: same ballpark (random init field -> low-contrast renders)
    np.testing.assert_allclose(rgb_f[:2], rgb_p[:2], atol=0.15)


def test_voxelize_verts_marks_and_dilates():
    from avatarcraft_tpu.ops.occupancy import voxelize_verts

    verts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, -1.0, 0.5]])
    g = np.asarray(voxelize_verts(verts, bound=1.6, resolution=33, dilate=1))
    c = 16  # center cell
    assert g[c, c, c] > 10
    assert g[c + 1, c, c] > 10  # dilated neighbor
    assert g[c + 3, c, c] == 0  # beyond dilation
    assert (g > 10).sum() == 2 * 27  # two vertices, 3^3 each


def test_animate_zero_rest_pose_identity_and_golden():
    """Animate with rest_pose='zero' (mesh-derived demo bodies whose template
    IS the da-posed surface): the zero-delta frame is the identity, and a
    mid-wave frame of tools/make_demo_poseseq.make_wave_sequence is pinned
    (golden) through the full calc_local_trans composition."""
    import sys as _sys

    _sys.path.insert(0, ".")
    from tools.make_demo_poseseq import make_wave_sequence

    from avatarcraft_tpu.models.smpl import SMPLParams

    rng = np.random.default_rng(3)
    V, J, B = 60, 7, 4
    v = rng.uniform(-0.4, 0.4, (V, 3)).astype(np.float32)
    v[:, 1] = np.linspace(-0.8, 0.8, V)
    w = rng.dirichlet(np.ones(J) * 0.5, V).astype(np.float32)
    reg = rng.dirichlet(np.ones(V) * 0.5, J).astype(np.float32)
    model = SMPLParams(
        v_template=v,
        shapedirs=np.zeros((V, 3, B), np.float32),
        posedirs=np.zeros(((J - 1) * 9, V * 3), np.float32),
        J_regressor=reg,
        parents=np.array([-1, 0, 1, 1, 1, 0, 0], np.int32),
        lbs_weights=w,
        faces=np.stack(
            [np.arange(V - 2), np.arange(1, V - 1), np.arange(2, V)], 1
        ).astype(np.int32),
    )
    poses = make_wave_sequence(12)
    wv, Ts, n = calc_local_trans(
        model, render_type="animate", poses=poses, max_frames=12,
        rest_pose="zero",
    )
    assert n == 12
    # frame 0 has zero pose deltas -> the warp chain is the identity
    np.testing.assert_allclose(wv[0], v, atol=1e-6)
    # mid-wave golden frame
    np.testing.assert_allclose(
        wv[7][0], [-0.406849, -0.766187, 0.191712], atol=2e-5
    )
    np.testing.assert_allclose(
        wv[7][30], [0.147257, -0.002716, 0.082188], atol=2e-5
    )
    np.testing.assert_allclose(
        Ts[7][5, 0], [1.095582, 0.095794, -0.083089, 0.011829], atol=2e-5
    )
