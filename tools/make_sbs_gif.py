"""Side-by-side gif assembler for before/after demos.

Pairs same-named frames from two render_canonical output dirs (left=bare,
right=styled), concatenates horizontally, writes one gif. Used for the
stylize demonstration (reference product: /root/reference/asset gifs).

Usage:
    python tools/make_sbs_gif.py --left demo/bare/frames --right demo/lava/frames \
        --pattern '*_body_*.png' --out docs/media/stylize_lava_sbs.gif [--fps 15]
"""

from __future__ import annotations

import argparse
import glob
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--left", required=True)
    ap.add_argument("--right", required=True)
    ap.add_argument("--pattern", default="*_body_*.png")
    ap.add_argument("--out", required=True)
    ap.add_argument("--fps", default=15, type=int)
    ap.add_argument("--max_frames", default=0, type=int, help="0 = all")
    opt = ap.parse_args(argv)

    import imageio.v2 as imageio
    import numpy as np

    lefts = sorted(glob.glob(os.path.join(opt.left, opt.pattern)))
    rights = sorted(glob.glob(os.path.join(opt.right, opt.pattern)))
    n = min(len(lefts), len(rights))
    if opt.max_frames:
        n = min(n, opt.max_frames)
    if n == 0:
        raise SystemExit(f"no frame pairs: {len(lefts)} left, {len(rights)} right")
    frames = []
    for lp, rp in zip(lefts[:n], rights[:n]):
        li, ri = imageio.imread(lp), imageio.imread(rp)
        if li.shape != ri.shape:
            raise SystemExit(f"shape mismatch {lp}{li.shape} vs {rp}{ri.shape}")
        frames.append(np.concatenate([li, ri], axis=1))
    os.makedirs(os.path.dirname(opt.out) or ".", exist_ok=True)
    imageio.mimsave(opt.out, frames, fps=opt.fps, loop=0)
    print(f"gif saved: {opt.out} ({n} frames)")


if __name__ == "__main__":
    main()
