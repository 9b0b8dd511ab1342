"""NeRF-style frequency (positional) encoder, pure jnp.

Mirrors the reference embedder (reference: encoder/freq_encoder.py:10-53):
identity passthrough + [sin, cos](x * 2^k) for k in 0..multires-1
(log-sampled frequency bands), concatenated along the feature axis.
Also provides the 45-degree-rotated Fourier basis variant used by the legacy
NeRF model ("rotate" mapping, reference: models/nerf.py:45-59).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def freq_encode_dim(multires: int, input_dims: int = 3, include_input: bool = True) -> int:
    return input_dims * (include_input + 2 * multires)


def freq_encode(
    x: jnp.ndarray, multires: int, include_input: bool = True
) -> jnp.ndarray:
    """Positional-encode ``x`` ([..., D]) into [..., D*(include+2*multires)].

    Feature order matches the reference embed-fn list: [x, sin(x*f0),
    cos(x*f0), sin(x*f1), cos(x*f1), ...] (encoder/freq_encoder.py:16-39).
    """
    freqs = 2.0 ** np.arange(multires, dtype=np.float32)  # log-sampled bands
    feats = [x] if include_input else []
    for f in freqs:
        feats.append(jnp.sin(x * f))
        feats.append(jnp.cos(x * f))
    return jnp.concatenate(feats, axis=-1)


def rotated_fourier_bvals(multires: int, min_freq: float = 0.0) -> np.ndarray:
    """The 'rotate' mapping's frequency matrix B [3*multires, 3]
    (reference: models/nerf.py:45-59): per-frequency axis-aligned bases
    2^k * eye(3), all rotated by the fixed composite Rz(45deg) then Rx(45deg).
    """
    bvals = 2.0 ** np.linspace(min_freq, multires - 1.0, num=multires)
    bvals = np.reshape(
        np.eye(3) * bvals[:, None, None], [multires * 3, 3]
    )
    s = np.sqrt(2.0) / 2.0
    rot_z = np.array([[s, -s, 0.0], [s, s, 0.0], [0.0, 0.0, 1.0]])
    rot_x = np.array([[1.0, 0.0, 0.0], [0.0, s, -s], [0.0, s, s]])
    return (bvals @ rot_z.T @ rot_x.T).astype(np.float32)


def freq_encode_rotated(
    x: jnp.ndarray, multires: int, include_input: bool = True
) -> jnp.ndarray:
    """The 'rotate' Fourier mapping: [x, sin(x @ B.T), cos(x @ B.T)] with the
    reference's rotated per-frequency basis (3 + 6*multires output dims; all
    sines precede all cosines, reference: models/nerf.py:84-90)."""
    bvals = jnp.asarray(rotated_fourier_bvals(multires))
    proj = x @ bvals.T
    feats = ([x] if include_input else []) + [jnp.sin(proj), jnp.cos(proj)]
    return jnp.concatenate(feats, axis=-1)
