"""SH + frequency encoders: closed-form checks."""

import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.ops.freq_encoder import (
    freq_encode,
    freq_encode_dim,
    freq_encode_rotated,
)
from avatarcraft_tpu.ops.sh_encoder import sh_encode


def test_sh_degree4_shape_and_constants():
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = np.asarray(sh_encode(d, degree=4))
    assert out.shape == (1, 16)
    # Y_00 = 1/(2 sqrt(pi))
    np.testing.assert_allclose(out[0, 0], 0.28209479, rtol=1e-6)
    # at +z: Y_1,-1 ~ -y = 0, Y_10 ~ z, Y_11 ~ -x = 0
    np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-7)
    np.testing.assert_allclose(out[0, 2], 0.48860251, rtol=1e-6)
    np.testing.assert_allclose(out[0, 3], 0.0, atol=1e-7)
    # band-2 m=0 at z=1: sqrt(5)/(4 sqrt(pi)) * (3-1)
    np.testing.assert_allclose(out[0, 6], 0.94617469575755997 - 0.31539156525251999, rtol=1e-6)


def test_sh_orthonormality_montecarlo(rng):
    """Integral over the sphere of Y_i * Y_j approx delta_ij."""
    n = 200_000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    Y = np.asarray(sh_encode(jnp.asarray(v, jnp.float32), degree=3))  # [n, 9]
    gram = 4 * np.pi * (Y.T @ Y) / n
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


def test_sh_degree8_runs():
    d = jnp.asarray([[0.3, -0.5, 0.81]])
    out = sh_encode(d / jnp.linalg.norm(d), degree=8)
    assert out.shape == (1, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_freq_encode_layout():
    x = jnp.asarray([[0.5, -0.25, 1.0]])
    multires = 4
    out = np.asarray(freq_encode(x, multires))
    assert out.shape == (1, freq_encode_dim(multires))
    np.testing.assert_allclose(out[0, :3], [0.5, -0.25, 1.0])
    # first band: sin(x*1), cos(x*1)
    np.testing.assert_allclose(out[0, 3:6], np.sin([0.5, -0.25, 1.0]), rtol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.cos([0.5, -0.25, 1.0]), rtol=1e-6)
    # last band: f = 2^(multires-1) = 8
    np.testing.assert_allclose(out[0, -6:-3], np.sin(np.array([0.5, -0.25, 1.0]) * 8), rtol=1e-5)


def test_freq_encode_rotated_matches_reference_math():
    """[x, sin(x@B.T), cos(x@B.T)] with B = per-freq eye(3) rotated by the
    fixed Rz(45)Rx(45) composite (reference: models/nerf.py:45-59,84-90)."""
    multires = 6
    x = np.array([[0.3, -0.7, 0.2], [0.0, 1.0, -1.0]], np.float32)
    out = np.asarray(freq_encode_rotated(jnp.asarray(x), multires))
    assert out.shape == (2, 3 + 6 * multires)

    # independent transcription of the reference basis construction
    bvals = 2.0 ** np.linspace(0.0, multires - 1.0, num=multires)
    bvals = np.reshape(np.eye(3) * bvals[:, None, None], [multires * 3, 3])
    s = np.sqrt(2.0) / 2.0
    bvals = bvals @ np.array([[s, -s, 0], [s, s, 0], [0, 0, 1]]).T
    bvals = bvals @ np.array([[1, 0, 0], [0, s, -s], [0, s, s]]).T
    want = np.concatenate(
        [x, np.sin(x @ bvals.T), np.cos(x @ bvals.T)], axis=-1
    )
    np.testing.assert_allclose(out, want.astype(np.float32), atol=1e-5)
