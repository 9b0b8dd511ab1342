"""SMPL body model as pure vectorized JAX.

Re-implements the reference's ROMP-derived SMPL (reference: models/smpl.py:52-647)
functionally: Rodrigues rotations, kinematic-chain rigid transforms (static
unrolled loop over the 24 joints -- tiny, trace-time constant), blend shapes,
joint regression and skinning-weight blending of per-vertex 4x4 transforms.

Two LBS variants exist in the reference and both are kept:
* ``lbs``   -- verts_transformations path; NOTE it intentionally omits pose
  blendshape offsets from the returned vertices (v_posed = v_shaped,
  reference: models/smpl.py:420),
* ``my_lbs`` -- applies pose blendshapes (v_posed = pose_offsets + v_shaped,
  reference: models/smpl.py:478).

The SMPL_NEUTRAL.pkl asset is user-supplied (not distributable); tests use
:func:`synthetic_smpl_params`, a random-but-valid parameter set with the same
pytree structure.
"""

from __future__ import annotations

import dataclasses
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SMPLParams:
    """Static model data (a frozen pytree of numpy arrays)."""

    v_template: np.ndarray  # [V, 3]
    shapedirs: np.ndarray  # [V, 3, n_betas]
    posedirs: np.ndarray  # [(J-1)*9, V*3]
    J_regressor: np.ndarray  # [J, V]
    parents: np.ndarray  # [J] int, parents[0] == -1
    lbs_weights: np.ndarray  # [V, J]
    faces: np.ndarray  # [F, 3] int

    @property
    def n_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def n_joints(self) -> int:
        return self.J_regressor.shape[0]


def load_smpl(model_path: str, gender: str = "neutral") -> SMPLParams:
    """Load SMPL_<GENDER>.pkl (reference: models/smpl.py:52-105), or an .npz
    with the SMPLParams fields directly (e.g. tools/make_demo_body.py)."""
    if os.path.isdir(model_path):
        model_path = os.path.join(model_path, f"SMPL_{gender.upper()}.pkl")
    if model_path.endswith(".npz"):
        data = np.load(model_path)
        return SMPLParams(
            v_template=data["v_template"].astype(np.float32),
            shapedirs=data["shapedirs"].astype(np.float32),
            posedirs=data["posedirs"].astype(np.float32),
            J_regressor=data["J_regressor"].astype(np.float32),
            parents=data["parents"].astype(np.int32),
            lbs_weights=data["lbs_weights"].astype(np.float32),
            faces=data["faces"].astype(np.int32),
        )
    with open(model_path, "rb") as fh:
        data = pickle.load(fh, encoding="latin1")

    def to_np(x):
        if "scipy.sparse" in str(type(x)):
            x = x.todense()
        return np.array(x, dtype=np.float32)

    posedirs = to_np(data["posedirs"])
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # [207, V*3]
    parents = np.array(data["kintree_table"][0], dtype=np.int32)
    parents[0] = -1
    return SMPLParams(
        v_template=to_np(data["v_template"]),
        shapedirs=to_np(data["shapedirs"]),
        posedirs=posedirs,
        J_regressor=to_np(data["J_regressor"]),
        parents=parents,
        lbs_weights=to_np(data["weights"]),
        faces=np.array(data["f"], dtype=np.int32),
    )


def synthetic_smpl_params(
    key=0, n_verts: int = 64, n_joints: int = 6, n_betas: int = 10
) -> SMPLParams:
    """Random-but-valid SMPL-like model for tests (chain kinematics)."""
    rng = np.random.default_rng(key)
    v_template = rng.normal(scale=0.3, size=(n_verts, 3)).astype(np.float32)
    shapedirs = rng.normal(scale=0.01, size=(n_verts, 3, n_betas)).astype(np.float32)
    posedirs = rng.normal(scale=0.001, size=((n_joints - 1) * 9, n_verts * 3)).astype(
        np.float32
    )
    J_regressor = rng.random((n_joints, n_verts)).astype(np.float32)
    J_regressor /= J_regressor.sum(axis=1, keepdims=True)
    parents = np.arange(-1, n_joints - 1, dtype=np.int32)  # simple chain
    w = rng.random((n_verts, n_joints)).astype(np.float32) ** 4
    w /= w.sum(axis=1, keepdims=True)
    # fake triangles over consecutive vertices
    faces = np.stack(
        [np.arange(n_verts - 2), np.arange(1, n_verts - 1), np.arange(2, n_verts)],
        axis=-1,
    ).astype(np.int32)
    return SMPLParams(v_template, shapedirs, posedirs, J_regressor, parents, w, faces)


# ---------------------------------------------------------------------------
# Kinematics
# ---------------------------------------------------------------------------


def batch_rodrigues(rot_vecs: jnp.ndarray) -> jnp.ndarray:
    """[N,3] axis-angle -> [N,3,3] rotations (reference: models/smpl.py:549-580)."""
    angle = jnp.linalg.norm(rot_vecs + 1e-8, axis=1, keepdims=True)  # [N,1]
    rot_dir = rot_vecs / angle
    cos = angle[:, None, :] * 0 + jnp.cos(angle)[:, None, :]
    sin = jnp.sin(angle)[:, None, :]
    rx, ry, rz = rot_dir[:, 0], rot_dir[:, 1], rot_dir[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(-1, 3, 3)
    ident = jnp.eye(3)[None]
    return ident + sin * K + (1.0 - cos) * (K @ K)


def transform_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """([...,3,3], [...,3]) -> [...,4,4] homogeneous transforms."""
    pad = jnp.zeros(R.shape[:-2] + (1, 3), R.dtype)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.concatenate([pad, jnp.ones(R.shape[:-2] + (1, 1), R.dtype)], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def batch_rigid_transform(
    rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: np.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Kinematic-chain composition (reference: models/smpl.py:596-647).

    rot_mats: [B,J,3,3], joints: [B,J,3], parents: host int array.
    Returns (posed_joints [B,J,3], rel_transforms [B,J,4,4]).
    """
    B, J = joints.shape[:2]
    parents = np.asarray(parents)
    rel_joints = joints.at[:, 1:].add(-joints[:, parents[1:]])

    local = transform_mat(rot_mats, rel_joints)  # [B,J,4,4]

    # static unrolled chain over <=24 joints: trace-time constant
    chain = [local[:, 0]]
    for i in range(1, J):
        chain.append(chain[parents[i]] @ local[:, i])
    transforms = jnp.stack(chain, axis=1)  # [B,J,4,4]

    posed_joints = transforms[:, :, :3, 3]

    # rel_transforms = T - [0 | T @ [j;0]] (reference: models/smpl.py:642-645)
    joints_h = jnp.concatenate([joints, jnp.zeros((B, J, 1))], axis=-1)
    correction = jnp.einsum("bjmn,bjn->bjm", transforms, joints_h)
    rel = transforms.at[:, :, :3, 3].add(-correction[:, :, :3])
    return posed_joints, rel


def blend_shapes(betas: jnp.ndarray, shape_disps) -> jnp.ndarray:
    return jnp.einsum("bl,mkl->bmk", betas, jnp.asarray(shape_disps))


def vertices2joints(J_regressor, vertices: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("bik,ji->bjk", vertices, jnp.asarray(J_regressor))


# ---------------------------------------------------------------------------
# LBS variants
# ---------------------------------------------------------------------------


def lbs(
    model: SMPLParams,
    betas: jnp.ndarray,
    pose: jnp.ndarray,
    *,
    return_T: bool = False,
    concat_joints: bool = False,
):
    """verts_transformations-path LBS (reference: models/smpl.py:351-446).

    betas [B,10], pose [B,72] axis-angle.
    With return_T: (T [B,V(+J),4,4], verts [B,V(+J),3], v_delta [B,V,3]);
    else (verts [B,V,3], posed_joints [B,J,3]).
    """
    B = pose.shape[0]
    v_delta = blend_shapes(betas, model.shapedirs)
    v_shaped = jnp.asarray(model.v_template)[None] + v_delta
    J = vertices2joints(model.J_regressor, v_shaped)

    rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(B, -1, 3, 3)
    # NOTE: this path deliberately skips pose blendshape offsets
    # (v_posed = v_shaped, reference: models/smpl.py:420)
    v_posed = v_shaped

    J_transformed, A = batch_rigid_transform(rot_mats, J, model.parents)

    W = jnp.asarray(model.lbs_weights)
    T = jnp.einsum("vj,bjmn->bvmn", W, A)

    if return_T:
        if concat_joints:
            return (
                jnp.concatenate([T, A], axis=1),
                jnp.concatenate([v_posed, J], axis=1),
                v_delta,
            )
        return T, v_posed, v_delta

    v_h = jnp.concatenate([v_posed, jnp.ones((B, v_posed.shape[1], 1))], axis=-1)
    verts = jnp.einsum("bvmn,bvn->bvm", T, v_h)[..., :3]
    return verts, J_transformed


def my_lbs(
    model: SMPLParams,
    v_shaped: jnp.ndarray,
    pose: jnp.ndarray,
    *,
    return_T: bool = False,
    concat_joints: bool = False,
):
    """Shaped-vertex LBS with pose blendshapes (reference: models/smpl.py:448-503)."""
    B = pose.shape[0]
    J = vertices2joints(model.J_regressor, v_shaped)

    rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(B, -1, 3, 3)
    ident = jnp.eye(3)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
    pose_offsets = (pose_feature @ jnp.asarray(model.posedirs)).reshape(B, -1, 3)
    v_posed = pose_offsets + v_shaped

    J_transformed, A = batch_rigid_transform(rot_mats, J, model.parents)
    W = jnp.asarray(model.lbs_weights)
    T = jnp.einsum("vj,bjmn->bvmn", W, A)

    if return_T:
        if concat_joints:
            return jnp.concatenate([T, A], axis=1), jnp.concatenate([v_posed, J], axis=1)
        return T, v_posed

    v_h = jnp.concatenate([v_posed, jnp.ones((B, v_posed.shape[1], 1))], axis=-1)
    verts = jnp.einsum("bvmn,bvn->bvm", T, v_h)[..., :3]
    return verts, J_transformed


# ---------------------------------------------------------------------------
# Public API mirroring the reference SMPL module
# ---------------------------------------------------------------------------


def smpl_forward(
    model: SMPLParams,
    pose: jnp.ndarray,
    betas: jnp.ndarray,
    transl: jnp.ndarray | None = None,
    return_joints: bool = False,
):
    """SMPL.forward (reference: models/smpl.py:249-312): posed vertices."""
    verts, joints = lbs(model, betas, pose)
    if transl is not None:
        verts = verts + transl[:, None, :]
        joints = joints + transl[:, None, :]
    if return_joints:
        return verts, joints
    return verts


def verts_transformations(
    model: SMPLParams,
    pose: jnp.ndarray,
    betas: jnp.ndarray,
    transl: jnp.ndarray | None = None,
    concat_joints: bool = False,
):
    """SMPL.verts_transformations (reference: models/smpl.py:107-161).

    Returns (vertices [B,V(+J),3], T [B,V(+J),4,4], v_delta).
    """
    T, vertices, v_delta = lbs(
        model, betas, pose, return_T=True, concat_joints=concat_joints
    )
    if transl is not None:
        transl_mat = jnp.eye(4)[None].at[:, :3, 3].set(transl)
        T = jnp.einsum("bmn,bvnk->bvmk", transl_mat, T)
    return vertices, T, v_delta
