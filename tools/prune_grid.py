"""Occupancy-grid floater prune: keep the avatar, drop disconnected blobs.

SDS stylization grows isolated floater cells in the density grid
(docs/PERFORMANCE.md "occupancy-grid inflation": 8.7k -> 47k occupied cells
over the lava schedule), and they saturate the same density cap as the body
so no threshold separates them. They ARE separable topologically: the avatar
is one large 26-connected component, floaters are small disconnected blobs.
This tool refreshes the grid from a checkpoint's SDF, keeps the components
above --min_cells (default: just the largest), zeroes the rest, and saves a
``.npy`` for the render CLIs' ``--grid_path`` — the fast sampler then never
places samples in floater cells. This prunes the sampling acceleration
structure only; the field itself is untouched (same trick as instant-NGP's
occupancy culling, applied post-stylize).

Usage:
    python tools/prune_grid.py --ckpt style/toy/lava_fine/lava_fine_0500.pth.tar \
        --out style/toy/lava_fine/grid_pruned.npy [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="field checkpoint (.pth.tar)")
    ap.add_argument("--out", required=True, help="output grid .npy")
    ap.add_argument("--min_cells", default=0, type=int,
                    help="keep components with >= this many occupied cells; "
                         "0 = keep only the largest component")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "default"])
    opt = ap.parse_args(argv)

    import jax

    if opt.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from scipy import ndimage

    from avatarcraft_tpu.constants import NSR_BOUND
    from avatarcraft_tpu.utils.checkpoint import load_params_with_config
    from avatarcraft_tpu.workloads.reconstruct import make_grid_update_fn

    params, fcfg = load_params_with_config(opt.ckpt)
    grid = np.asarray(
        make_grid_update_fn(fcfg, NSR_BOUND)(
            params, jnp.zeros((129,) * 3, jnp.float32)
        )
    )
    # occupancy at the sampler's own threshold semantics (instant_nsr.py:
    # thresh = min(occ_threshold=10, mean(grid)))
    thresh = min(10.0, float(grid.mean()))
    occ = grid > thresh
    labels, n = ndimage.label(occ, structure=np.ones((3, 3, 3), np.int8))
    sizes = np.bincount(labels.ravel())
    sizes[0] = 0  # background
    keep_min = opt.min_cells if opt.min_cells > 0 else int(sizes.max())
    keep = np.isin(labels, np.nonzero(sizes >= keep_min)[0])
    pruned = np.where(keep, grid, 0.0).astype(grid.dtype)
    np.save(opt.out, pruned)
    print(
        f"components: {n}, occupied {occ.sum()} -> kept {keep.sum()} cells "
        f"({(sizes >= keep_min).sum()} component(s)); saved {opt.out}"
    )


if __name__ == "__main__":
    main()
