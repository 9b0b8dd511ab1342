"""Cross-implementation oracles: pin our JAX math against the reference's
OWN torch code executed directly (VERDICT r4 Next #5).

The reference's models/smpl.py is pure torch+pickle and imports on CPU;
models/neus.py carries the canonical NeRF sample_pdf but pulls in
CUDA-adjacent deps (igl/mcubes/encoder) that are stubbed out — we only
execute the pure-torch functions under test. These tests replace
transcription oracles with the reference implementation itself
(reference: models/smpl.py:107-161,351-647; models/neus.py:52-83).
"""

from __future__ import annotations

import importlib.util
import os
import pickle
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _load_ref_module(relpath: str, name: str, stubs: tuple[str, ...] = ()):
    """Import a reference file as a standalone module, stubbing heavy deps."""
    if not os.path.exists(os.path.join(REF, relpath)):
        pytest.skip(f"reference file {relpath} not present")
    inserted = []
    for s in stubs:
        if s not in sys.modules:
            mod = types.ModuleType(s)
            mod.__getattr__ = lambda _n: (lambda *a, **k: None)  # lazy no-op
            sys.modules[s] = mod
            inserted.append(s)
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    module = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(module)
    finally:
        for s in inserted:
            sys.modules.pop(s, None)
    return module


@pytest.fixture(scope="module")
def ref_smpl():
    return _load_ref_module("models/smpl.py", "ref_smpl")


@pytest.fixture(scope="module")
def ref_neus():
    return _load_ref_module(
        "models/neus.py",
        "ref_neus",
        stubs=("utils", "utils.ray_utils", "mcubes", "encoder"),
    )


def _synthetic(key=0, n_verts=128, n_joints=24, n_betas=10):
    from avatarcraft_tpu.models.smpl import synthetic_smpl_params

    return synthetic_smpl_params(key, n_verts=n_verts, n_joints=n_joints, n_betas=n_betas)


def _rand_pose(rng, n_joints, scale=0.6):
    return rng.normal(scale=scale, size=(1, n_joints * 3)).astype(np.float32)


def test_batch_rodrigues_vs_reference(ref_smpl):
    from avatarcraft_tpu.models.smpl import batch_rodrigues

    rng = np.random.default_rng(0)
    vecs = np.concatenate(
        [rng.normal(scale=1.5, size=(32, 3)), np.zeros((2, 3))]
    ).astype(np.float32)
    ours = np.asarray(batch_rodrigues(jnp.asarray(vecs)))
    ref = ref_smpl.batch_rodrigues(torch.from_numpy(vecs)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_batch_rigid_transform_vs_reference(ref_smpl):
    from avatarcraft_tpu.models.smpl import batch_rigid_transform, batch_rodrigues

    model = _synthetic(1)
    rng = np.random.default_rng(1)
    J = rng.normal(scale=0.5, size=(2, model.n_joints, 3)).astype(np.float32)
    pose = rng.normal(scale=0.7, size=(2, model.n_joints, 3)).astype(np.float32)
    rots = np.asarray(batch_rodrigues(jnp.asarray(pose.reshape(-1, 3)))).reshape(
        2, -1, 3, 3
    )
    ours_j, ours_a = batch_rigid_transform(
        jnp.asarray(rots), jnp.asarray(J), model.parents
    )
    # the reference indexes parents[1:] into joints; parents[0] == -1 is
    # never read on either side
    ref_j, ref_a = ref_smpl.batch_rigid_transform(
        torch.from_numpy(rots), torch.from_numpy(J),
        torch.from_numpy(model.parents.astype(np.int64)),
    )
    np.testing.assert_allclose(np.asarray(ours_j), ref_j.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours_a), ref_a.numpy(), atol=2e-5)


@pytest.mark.parametrize("concat_joints", [False, True])
def test_lbs_vs_reference(ref_smpl, concat_joints):
    """verts_transformations-path lbs incl. the v_posed=v_shaped quirk
    (reference: models/smpl.py:420 skips pose blendshape offsets)."""
    from avatarcraft_tpu.models.smpl import lbs

    model = _synthetic(2)
    rng = np.random.default_rng(2)
    betas = rng.normal(scale=1.0, size=(1, 10)).astype(np.float32)
    pose = _rand_pose(rng, model.n_joints)

    T_ours, v_ours, vd_ours = lbs(
        model, jnp.asarray(betas), jnp.asarray(pose),
        return_T=True, concat_joints=concat_joints,
    )
    T_ref, v_ref, vd_ref = ref_smpl.lbs(
        torch.from_numpy(betas), torch.from_numpy(pose),
        torch.from_numpy(model.v_template), torch.from_numpy(model.shapedirs),
        torch.from_numpy(model.posedirs), torch.from_numpy(model.J_regressor),
        torch.from_numpy(model.parents.astype(np.int64)),
        torch.from_numpy(model.lbs_weights),
        return_T=True, concat_joints=concat_joints,
    )
    np.testing.assert_allclose(np.asarray(T_ours), T_ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_ours), v_ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(vd_ours), vd_ref.numpy(), atol=2e-5)


def test_lbs_forward_verts_vs_reference(ref_smpl):
    from avatarcraft_tpu.models.smpl import lbs

    model = _synthetic(3)
    rng = np.random.default_rng(3)
    betas = rng.normal(scale=1.0, size=(1, 10)).astype(np.float32)
    pose = _rand_pose(rng, model.n_joints)
    v_ours, j_ours = lbs(model, jnp.asarray(betas), jnp.asarray(pose))
    v_ref, j_ref = ref_smpl.lbs(
        torch.from_numpy(betas), torch.from_numpy(pose),
        torch.from_numpy(model.v_template), torch.from_numpy(model.shapedirs),
        torch.from_numpy(model.posedirs), torch.from_numpy(model.J_regressor),
        torch.from_numpy(model.parents.astype(np.int64)),
        torch.from_numpy(model.lbs_weights),
    )
    np.testing.assert_allclose(np.asarray(v_ours), v_ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_ours), j_ref.numpy(), atol=2e-5)


@pytest.mark.parametrize("concat_joints", [False, True])
def test_my_lbs_vs_reference(ref_smpl, concat_joints):
    """Shaped-vertex lbs WITH pose blendshape offsets
    (reference: models/smpl.py:448-503)."""
    from avatarcraft_tpu.models.smpl import my_lbs

    model = _synthetic(4)
    rng = np.random.default_rng(4)
    v_shaped = (model.v_template + rng.normal(scale=0.02, size=model.v_template.shape)
                ).astype(np.float32)[None]
    pose = _rand_pose(rng, model.n_joints)
    T_ours, v_ours = my_lbs(
        model, jnp.asarray(v_shaped), jnp.asarray(pose),
        return_T=True, concat_joints=concat_joints,
    )
    T_ref, v_ref = ref_smpl.my_lbs(
        torch.from_numpy(v_shaped), torch.from_numpy(pose),
        torch.from_numpy(model.v_template), torch.from_numpy(model.shapedirs),
        torch.from_numpy(model.posedirs), torch.from_numpy(model.J_regressor),
        torch.from_numpy(model.parents.astype(np.int64)),
        torch.from_numpy(model.lbs_weights),
        return_T=True, concat_joints=concat_joints,
    )
    np.testing.assert_allclose(np.asarray(T_ours), T_ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_ours), v_ref.numpy(), atol=2e-5)


def _write_synthetic_pickle(model, path):
    """SMPL_NEUTRAL.pkl-shaped file: posedirs stored [V,3,P] (the loaders on
    both sides reshape to [P, V*3]), kintree_table [2,J] with parents row 0."""
    n_pose_basis = model.posedirs.shape[0]
    posedirs_raw = model.posedirs.T.reshape(model.n_verts, 3, n_pose_basis)
    parents_row = model.parents.astype(np.int64).copy()
    parents_row[0] = 2**32 - 1  # real pickles carry uint32 -1 here
    kintree = np.stack([parents_row, np.arange(model.n_joints, dtype=np.int64)])
    with open(path, "wb") as fh:
        pickle.dump(
            {
                "v_template": model.v_template.astype(np.float64),
                "shapedirs": model.shapedirs.astype(np.float64),
                "posedirs": posedirs_raw.astype(np.float64),
                "J_regressor": model.J_regressor.astype(np.float64),
                "kintree_table": kintree,
                "weights": model.lbs_weights.astype(np.float64),
                "f": model.faces.astype(np.int64),
            },
            fh,
        )


def test_verts_transformations_vs_reference_module(ref_smpl, tmp_path):
    """Full SMPL.verts_transformations parity through a synthetic
    pickle-shaped model loaded by BOTH loaders (incl. transl composition,
    reference: models/smpl.py:107-161)."""
    from avatarcraft_tpu.models.smpl import load_smpl, verts_transformations

    model = _synthetic(5)
    pkl = str(tmp_path / "SMPL_NEUTRAL.pkl")
    _write_synthetic_pickle(model, pkl)

    ours = load_smpl(pkl)
    np.testing.assert_allclose(ours.posedirs, model.posedirs, atol=1e-6)
    np.testing.assert_array_equal(ours.parents, model.parents)

    ref_model = ref_smpl.SMPL(pkl)
    rng = np.random.default_rng(5)
    pose = _rand_pose(rng, model.n_joints)
    betas = rng.normal(scale=1.0, size=(1, 10)).astype(np.float32)
    transl = rng.normal(scale=0.3, size=(1, 3)).astype(np.float32)

    for cj in (False, True):
        v_ours, T_ours, _ = verts_transformations(
            ours, jnp.asarray(pose), jnp.asarray(betas),
            transl=jnp.asarray(transl), concat_joints=cj,
        )
        v_ref, T_ref, _ = ref_model.verts_transformations(
            pose, betas, transl=torch.from_numpy(transl),
            return_tensor=False, concat_joints=cj,
        )
        np.testing.assert_allclose(np.asarray(v_ours[0]), v_ref, atol=2e-5)
        np.testing.assert_allclose(np.asarray(T_ours[0]), T_ref, atol=2e-5)


def test_smpl_forward_vs_reference_module(ref_smpl, tmp_path):
    from avatarcraft_tpu.models.smpl import load_smpl, smpl_forward

    model = _synthetic(6)
    pkl = str(tmp_path / "SMPL_NEUTRAL.pkl")
    _write_synthetic_pickle(model, pkl)
    ours = load_smpl(pkl)
    ref_model = ref_smpl.SMPL(pkl)
    rng = np.random.default_rng(6)
    pose = _rand_pose(rng, model.n_joints)
    betas = rng.normal(scale=1.0, size=(1, 10)).astype(np.float32)
    v_ours = smpl_forward(ours, jnp.asarray(pose), jnp.asarray(betas))
    v_ref = ref_model.forward(
        torch.from_numpy(pose), torch.from_numpy(betas), return_tensor=True
    )
    if isinstance(v_ref, tuple):
        v_ref = v_ref[0]
    # reference forward returns vertices[0] (models/smpl.py:300-302)
    np.testing.assert_allclose(
        np.asarray(v_ours[0]), v_ref.detach().numpy(), atol=2e-5
    )


def test_sample_pdf_vs_reference(ref_neus):
    """Deterministic inverse-CDF importance sampling against the reference's
    own sample_pdf (reference: models/neus.py:52-83, det=True — the
    renderer's up-sampling path is always det)."""
    from avatarcraft_tpu.ops.sampling import sample_pdf

    rng = np.random.default_rng(7)
    B, T, n_new = 16, 33, 24
    bins = np.sort(rng.random((B, T)).astype(np.float32) * 4.0, axis=-1)
    weights = (rng.random((B, T - 1)).astype(np.float32) ** 3)
    # a few degenerate rows: all-zero weights, single spike
    weights[0] = 0.0
    weights[1] = 0.0
    weights[1, 7] = 5.0

    ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), n_new, det=True))
    ref = ref_neus.sample_pdf(
        torch.from_numpy(bins), torch.from_numpy(weights), n_new,
        det=True, device="cpu",
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
