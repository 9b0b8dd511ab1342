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


def rotated_fourier_basis(input_dims: int = 3) -> np.ndarray:
    """The 45-degree-rotated basis of the legacy NeRF 'rotate' mapping.

    Returns a [D, 2D] matrix B such that encoding uses x @ B instead of the
    axis-aligned identity basis (reference: models/nerf.py:45-59).
    """
    eye = np.eye(input_dims, dtype=np.float32)
    rot = []
    for i in range(input_dims):
        for j in range(i + 1, input_dims):
            v = np.zeros(input_dims, dtype=np.float32)
            v[i] = v[j] = 1.0 / np.sqrt(2.0)
            rot.append(v)
    basis = np.concatenate([eye, np.stack(rot, 0)], axis=0)  # [D + C(D,2), D]
    return basis.T.astype(np.float32)


def freq_encode_rotated(
    x: jnp.ndarray, multires: int, include_input: bool = True
) -> jnp.ndarray:
    """Frequency encoding over the rotated Fourier basis ('rotate' mapping)."""
    basis = jnp.asarray(rotated_fourier_basis(x.shape[-1]))
    proj = x @ basis
    freqs = 2.0 ** np.arange(multires, dtype=np.float32)
    feats = [x] if include_input else []
    for f in freqs:
        feats.append(jnp.sin(proj * f))
        feats.append(jnp.cos(proj * f))
    return jnp.concatenate(feats, axis=-1)
