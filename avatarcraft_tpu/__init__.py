"""AvatarCraft-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for text-driven
creation of animatable, reshapeable neural human avatars.

Re-designed from scratch with the capabilities of the PyTorch/CUDA reference
(songrise/AvatarCraft): an instant-NGP-style NeuS SDF field pretrained against
bare-SMPL multiview renders, stylized via Score Distillation Sampling, and
animated/reshaped by warping posed-space ray samples into the canonical field
through SMPL inverse linear-blend skinning.

Top-level layout:
    ops/       -- encoders (hash-grid / SH / frequency), sampling, occupancy grid
    models/    -- instant-NSR field + NeuS render core, SMPL body model, SDS guidance
    cameras/   -- pinhole cameras, orbit path generators, ray generation
    warp/      -- posed->canonical inverse-LBS warping (fully on-device)
    data/      -- dataset loaders (blender-json multiview, AMASS pose sequences)
    parallel/  -- device-mesh / sharding helpers (pjit data-parallel ray sharding)
    utils/     -- checkpointing (orbax + torch-statedict import), metrics, mesh export
    cli/       -- reference-compatible entry points (reconstruct, render_*, stylize)
"""

__version__ = "0.1.0"
