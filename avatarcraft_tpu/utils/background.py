"""Background synthesis for SDS training (reference: utils/render_utils.py:953-987)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.constants import (
    BLACK_BKG,
    CHESSBOARD_BKG,
    NOISE_BKG,
    WHITE_BKG,
)


def _chessboard(n_pixels: int) -> np.ndarray:
    """Blurred chessboard background, host-precomputed (render_utils.py:972-986)."""
    from scipy.ndimage import gaussian_filter

    H = W = int(np.sqrt(n_pixels))
    board = np.full((H, W), 0.2, np.float32)
    chess_length = max(H // 10, 1)
    i, j = np.meshgrid(np.arange(H), np.arange(W), indexing="xy")
    board[((i // chess_length + j // chess_length) % 2) == 0] = 0.8
    board = gaussian_filter(board, sigma=1.0)
    return np.repeat(board.reshape(-1, 1), 3, axis=1)


def select_background(
    n_pixels: int, key_id: int, rng_key: jax.Array | None = None
) -> jnp.ndarray:
    """[n_pixels, 3] background by key: white / black / gaussian noise /
    blurred chessboard."""
    key_id = key_id % 4
    if key_id == WHITE_BKG:
        return jnp.ones((n_pixels, 3), jnp.float32)
    if key_id == BLACK_BKG:
        return jnp.zeros((n_pixels, 3), jnp.float32)
    if key_id == NOISE_BKG:
        assert rng_key is not None, "noise background needs a PRNG key"
        noise = jnp.clip(
            0.5 + 0.1 * jax.random.normal(rng_key, (n_pixels,)), 0.0, 1.0
        )
        return jnp.repeat(noise[:, None], 3, axis=1)
    if key_id == CHESSBOARD_BKG:
        return jnp.asarray(_chessboard(n_pixels))
    raise ValueError(key_id)
