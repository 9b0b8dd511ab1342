"""SMPL LBS kinematics on a synthetic model."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from avatarcraft_tpu.models.smpl import (
    batch_rigid_transform,
    batch_rodrigues,
    lbs,
    my_lbs,
    smpl_forward,
    synthetic_smpl_params,
    transform_mat,
    verts_transformations,
)

MODEL = synthetic_smpl_params(0, n_verts=32, n_joints=5)
NPOSE = MODEL.n_joints * 3


def test_rodrigues_vs_scipy(rng):
    vecs = rng.normal(size=(16, 3)).astype(np.float32)
    ours = np.asarray(batch_rodrigues(jnp.asarray(vecs)))
    want = R.from_rotvec(vecs).as_matrix()
    np.testing.assert_allclose(ours, want, atol=1e-5)


def test_zero_pose_is_identity():
    pose = jnp.zeros((1, NPOSE))
    betas = jnp.zeros((1, 10))
    T, v_posed, v_delta = lbs(MODEL, betas, pose, return_T=True)
    np.testing.assert_allclose(
        np.asarray(T), np.broadcast_to(np.eye(4), T.shape), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(v_posed[0]), MODEL.v_template, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_delta), 0.0, atol=1e-7)

    verts = smpl_forward(MODEL, pose, betas)
    np.testing.assert_allclose(np.asarray(verts[0]), MODEL.v_template, atol=1e-5)


def test_betas_shift_verts_linearly(rng):
    betas = jnp.asarray(rng.normal(size=(1, 10)).astype(np.float32))
    pose = jnp.zeros((1, NPOSE))
    verts1 = np.asarray(smpl_forward(MODEL, pose, betas))
    verts2 = np.asarray(smpl_forward(MODEL, pose, 2.0 * betas))
    base = np.asarray(smpl_forward(MODEL, pose, 0.0 * betas))
    np.testing.assert_allclose(verts2 - base, 2.0 * (verts1 - base), atol=1e-5)


def test_root_rotation_rotates_rigidly(rng):
    """Rotating only the root joint rigidly rotates the whole mesh about it."""
    rv = np.array([0.3, -0.2, 0.5], np.float32)
    pose = np.zeros((1, NPOSE), np.float32)
    pose[0, :3] = rv
    betas = jnp.zeros((1, 10))

    verts_rot, joints_rot = smpl_forward(MODEL, jnp.asarray(pose), betas, return_joints=True)
    verts0, joints0 = smpl_forward(MODEL, jnp.zeros((1, NPOSE)), betas, return_joints=True)

    Rm = R.from_rotvec(rv).as_matrix()
    root = np.asarray(joints0[0, 0])
    want = (np.asarray(verts0[0]) - root) @ Rm.T + root
    np.testing.assert_allclose(np.asarray(verts_rot[0]), want, atol=1e-4)


def test_transforms_reproduce_forward(rng):
    """forward verts == per-vertex T applied to v_posed (definition of T)."""
    pose = jnp.asarray(rng.normal(scale=0.2, size=(1, NPOSE)).astype(np.float32))
    betas = jnp.asarray(rng.normal(size=(1, 10)).astype(np.float32))
    T, v_posed, _ = lbs(MODEL, betas, pose, return_T=True)
    v_h = jnp.concatenate([v_posed, jnp.ones((1, v_posed.shape[1], 1))], axis=-1)
    verts_via_T = np.asarray(jnp.einsum("bvmn,bvn->bvm", T, v_h)[..., :3])
    verts = np.asarray(smpl_forward(MODEL, pose, betas))
    np.testing.assert_allclose(verts_via_T, verts, atol=1e-5)


def test_concat_joints_shapes(rng):
    pose = jnp.asarray(rng.normal(scale=0.1, size=(1, NPOSE)).astype(np.float32))
    betas = jnp.zeros((1, 10))
    verts, T, _ = verts_transformations(MODEL, pose, betas, concat_joints=True)
    V, J = MODEL.n_verts, MODEL.n_joints
    assert T.shape == (1, V + J, 4, 4)
    assert verts.shape == (1, V + J, 3)


def test_my_lbs_applies_pose_offsets(rng):
    pose = jnp.asarray(rng.normal(scale=0.3, size=(1, NPOSE)).astype(np.float32))
    v_shaped = jnp.asarray(MODEL.v_template)[None]
    verts_my, _ = my_lbs(MODEL, v_shaped, pose)
    verts_plain, _ = lbs(MODEL, jnp.zeros((1, 10)), pose)
    # pose blendshapes make them differ (lbs path skips them by design)
    assert not np.allclose(np.asarray(verts_my), np.asarray(verts_plain), atol=1e-6)
    # but only by the small posedir offsets
    assert np.abs(np.asarray(verts_my) - np.asarray(verts_plain)).max() < 0.05


def test_translation_in_verts_transformations(rng):
    pose = jnp.zeros((1, NPOSE))
    betas = jnp.zeros((1, 10))
    transl = jnp.asarray([[0.5, -0.2, 0.1]])
    _, T, _ = verts_transformations(MODEL, pose, betas, transl=transl)
    np.testing.assert_allclose(
        np.asarray(T[0, :, :3, 3]),
        np.broadcast_to([0.5, -0.2, 0.1], (MODEL.n_verts, 3)),
        atol=1e-6,
    )


def test_rigid_transform_chain_positions():
    """Posed joints from the chain match explicit forward kinematics."""
    rng = np.random.default_rng(1)
    B, J = 1, MODEL.n_joints
    joints = jnp.asarray(rng.normal(size=(B, J, 3)).astype(np.float32))
    rots = batch_rodrigues(
        jnp.asarray(rng.normal(scale=0.3, size=(B * J, 3)).astype(np.float32))
    ).reshape(B, J, 3, 3)
    posed, rel = batch_rigid_transform(rots, joints, MODEL.parents)

    # explicit recursion in numpy
    Rn = np.asarray(rots[0])
    Jn = np.asarray(joints[0])
    world = [None] * J
    world[0] = np.asarray(transform_mat(jnp.asarray(Rn[0]), jnp.asarray(Jn[0])))
    for i in range(1, J):
        local = np.asarray(
            transform_mat(jnp.asarray(Rn[i]), jnp.asarray(Jn[i] - Jn[MODEL.parents[i]]))
        )
        world[i] = world[MODEL.parents[i]] @ local
    want = np.stack([w[:3, 3] for w in world])
    np.testing.assert_allclose(np.asarray(posed[0]), want, atol=1e-5)
