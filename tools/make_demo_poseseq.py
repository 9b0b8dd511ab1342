"""Synthetic AMASS-format pose sequence for the animate demo.

The reference's animation demo consumes an AMASS sequence converted by
utils/convert_amass.py (reference: render_warp.py:28-33). No AMASS data ships
in this container, so this generates a plausible [N, 24, 3] axis-angle
sequence — a wave/nod cycle — laid out for the 7-joint articulated demo rig
(tools/make_demo_body.py --rig articulated: root, spine, head, L/R arm,
L/R hip); joints beyond 6 are zero, exactly like convert_amass zero-pads the
hand joints. The same file also drives a real SMPL body (joints 0-6 are the
pelvis/legs/spine chain there — the motion reads as a gentle sway).

Usage:
    python tools/make_demo_poseseq.py [--out artifacts/canonical/demo_poses.npy]
        [--frames 30]
"""

from __future__ import annotations

import argparse

import numpy as np


def make_wave_sequence(n_frames: int = 30) -> np.ndarray:
    """[N, 24, 3] axis-angle: arms wave in opposition about z, head nods
    about x, root sways about y. Deltas around the rest pose (zero)."""
    t = np.linspace(0.0, 2.0 * np.pi, n_frames, endpoint=False)
    seq = np.zeros((n_frames, 24, 3), np.float32)
    seq[:, 0, 1] = 0.15 * np.sin(t)            # root sway (y)
    seq[:, 1, 0] = 0.06 * np.sin(2 * t)        # spine breathe (x)
    seq[:, 2, 0] = 0.18 * np.sin(2 * t)        # head nod (x)
    seq[:, 3, 2] = 0.45 * np.sin(t)            # L arm wave (z)
    seq[:, 4, 2] = -0.45 * np.sin(t + np.pi)   # R arm wave (z, opposed)
    seq[:, 5, 2] = 0.10 * np.sin(t)            # L hip swing
    seq[:, 6, 2] = -0.10 * np.sin(t)           # R hip swing
    return seq


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/canonical/demo_poses.npy")
    ap.add_argument("--frames", default=30, type=int)
    opt = ap.parse_args(argv)
    seq = make_wave_sequence(opt.frames)
    np.save(opt.out, seq)
    print(f"saved {opt.out} {seq.shape}")


if __name__ == "__main__":
    main()
