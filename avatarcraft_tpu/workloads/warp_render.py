"""Animation / shape interpolation: warped rendering of the canonical field.

Reproduces calc_local_trans (reference: render_warp.py:127-222): per frame,
compose the canonical(da-pose, beta=0) -> posed(target pose/shape)
transformation chain

    T_rest2pose = T_t2pose @ T_shape^-1 @ T_t2rest^-1
    Ts[i]       = T_rest2pose @ (I / SMPL_SCALE)

with T_shape a translation-only blend-shape displacement, then render each
frame with geometry-guided near/far and the on-device inverse-LBS warp
(reference hot path: render_warp.py:88-106 -> NeRFRenderer.run warped branch).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from avatarcraft_tpu.constants import DEFAULT_GEO_THRESH, NSR_BOUND, SMPL_SCALE
from avatarcraft_tpu.models.instant_nsr import (
    FieldConfig,
    RenderConfig,
    render_rays,
)
from avatarcraft_tpu.models.smpl import SMPLParams, smpl_forward, verts_transformations
from avatarcraft_tpu.warp import WarpData, geometry_guided_near_far, make_warp_fn


def da_pose(n_pose: int = 72) -> np.ndarray:
    """The NeuMan 'da' pose: arms rotated +-~57 deg about z
    (reference: render_warp.py:163-168)."""
    p = np.zeros((n_pose // 3, 3), np.float32)
    p[1] = [0, 0, 1.0]
    p[2] = [0, 0, -1.0]
    return p.reshape(1, -1)


def calc_local_trans(
    model: SMPLParams,
    render_type: str = "animate",
    poses: np.ndarray | None = None,
    shape_from: np.ndarray | None = None,
    shape_to: np.ndarray | None = None,
    n_interp: int = 10,
    max_frames: int = 100,
    scale: float = 1.0,
    rest_pose: str = "da",
):
    """Per-frame (world_verts [V,3], Ts [V+J,4,4]) for animation or shape
    interpolation (reference: render_warp.py:127-222).

    ``rest_pose``: the pose the canonical FIELD was trained in. "da" = the
    NeuMan da-pose (reference parity: the canonical SMPL field is da-posed,
    render_warp.py:163-168). "zero" = identity — for mesh-derived demo
    bodies (tools/make_demo_body.py) whose template IS the already-da-posed
    avatar surface, so their rest transform must be the identity and
    animation poses are deltas about it."""
    n_betas = model.shapedirs.shape[-1]
    zero_shape = np.zeros((1, n_betas), np.float32)
    n_pose = model.n_joints * 3
    da = (
        da_pose(n_pose) if rest_pose == "da"
        else np.zeros((1, n_pose), np.float32)
    )

    if shape_from is None:
        shape_from = np.zeros((1, n_betas), np.float32)
        shape_from[0, 1] = 2.0
    if shape_to is None:
        shape_to = np.zeros((1, n_betas), np.float32)
        shape_to[0, 1] = -2.0
    target_shapes = np.linspace(shape_from, shape_to, n_interp)

    if render_type == "animate":
        assert poses is not None, "animate requires a pose sequence"
        n_frames = min(max_frames, poses.shape[0])
        target_shapes = np.zeros((n_frames, 1, n_betas), np.float32)
        poses = poses.reshape(poses.shape[0], -1)[:n_frames, :n_pose]
    elif render_type == "interp_shape":
        n_frames = min(max_frames, target_shapes.shape[0])
        poses = np.zeros((n_frames, n_pose), np.float32)
    else:
        raise NotImplementedError(render_type)

    # frame-independent pieces
    v0, T_t2rest, _ = verts_transformations(
        model, jnp.asarray(da), jnp.asarray(zero_shape), concat_joints=True
    )
    v0 = np.asarray(v0[0])
    T_t2rest = np.asarray(T_t2rest[0])
    T_t2rest_inv = np.linalg.inv(T_t2rest)

    rest_verts, rest_joints = smpl_forward(
        model, jnp.asarray(da), jnp.asarray(zero_shape), return_joints=True
    )
    rest_all = np.concatenate([np.asarray(rest_verts[0]), np.asarray(rest_joints[0])], axis=0)
    rest_all_h = np.concatenate([rest_all, np.ones_like(rest_all[:, :1])], axis=-1)

    T_scale = np.eye(4, dtype=np.float32) / SMPL_SCALE
    s = np.eye(4, dtype=np.float32)
    s[:3, :3] *= scale

    world_verts, Ts = [], []
    for i in range(n_frames):
        _, T_t2pose, _ = verts_transformations(
            model,
            jnp.asarray(poses[i][None]),
            jnp.asarray(zero_shape),
            concat_joints=True,
        )
        T_t2pose = np.asarray(T_t2pose[0])

        vt, _, _ = verts_transformations(
            model,
            jnp.asarray(da),
            jnp.asarray(target_shapes[i].astype(np.float32)),
            concat_joints=True,
        )
        delta_v = v0 - np.asarray(vt[0])  # beta-blendshape displacement

        # translation-only T_shape; its inverse is translation by -delta_v
        T_shape_inv = np.broadcast_to(np.eye(4, dtype=np.float32), T_t2pose.shape).copy()
        T_shape_inv[:, :3, 3] = -delta_v

        T_rest2pose = T_t2pose @ T_shape_inv @ T_t2rest_inv
        Ts.append((T_rest2pose @ T_scale).astype(np.float32))

        wv = np.einsum("BNi,Bi->BN", s @ T_rest2pose, rest_all_h)[:, :3]
        world_verts.append(wv[: model.n_verts].astype(np.float32))
    return world_verts, Ts, n_frames


@dataclasses.dataclass(frozen=True)
class WarpRenderSettings:
    num_steps: int = 32  # reference: render_warp.py:104-105
    upsample_steps: int = 32
    bound: float = NSR_BOUND
    chunk: int = 8192  # reference: render_warp.py:93 (64*128)
    geo_threshold: float = DEFAULT_GEO_THRESH


def make_warp_frame_renderer(
    fcfg: FieldConfig, settings: WarpRenderSettings, bg_value: float = 1.0
):
    """One compiled program per frame: geometry-guided near/far + warped
    render over fixed-size ray chunks."""
    rcfg = RenderConfig(
        num_steps=settings.num_steps,
        upsample_steps=settings.upsample_steps,
        upsample_round=16,
        bound=settings.bound,
        perturb=False,
    )

    @jax.jit
    def render_frame(params, rays_o, rays_d, warp_data: WarpData):
        n = rays_o.shape[0]
        chunk = min(settings.chunk, n)
        n_chunks = n // chunk
        warp_fn = make_warp_fn(warp_data, settings.geo_threshold)

        def body(args):
            ro, rd = args
            near, far = geometry_guided_near_far(
                ro, rd, warp_data.verts, settings.geo_threshold
            )
            out = render_rays(
                params, ro, rd, jax.random.PRNGKey(0), fcfg, rcfg,
                bg_value, near_far=(near, far), warp_fn=warp_fn,
            )
            return out["rgb"]

        rgb = jax.lax.map(
            body,
            (rays_o.reshape(n_chunks, chunk, 3), rays_d.reshape(n_chunks, chunk, 3)),
        )
        return rgb.reshape(n, 3)

    return render_frame


def derive_warp_budget(
    world_verts: list,
    rays_o,
    rays_d,
    settings: "WarpRenderSettings",
    n_probes: int = 128,
    k_samples: int = 32,
    grid_resolution: int = 129,
    safety: float = 1.02,
) -> int:
    """Honest per-chunk sample budget for the fast warp path: the worst
    probe-selected sample count over every chunk of every frame, +2%
    (zero-clip by construction — same derivation as ``bench.py --path=warp``;
    the reference sizes packed buffers from measured counts the same way,
    reference: raymarching/raymarching.py:21-114 mean_count)."""
    import jax as _jax

    from avatarcraft_tpu.models.instant_nsr import (
        FastRenderConfig,
        count_fast_samples,
    )
    from avatarcraft_tpu.ops.occupancy import voxelize_verts

    n = rays_o.shape[0]
    chunk = min(settings.chunk, n)
    probe_cfg = FastRenderConfig(
        n_probes=n_probes, k_samples=k_samples, bound=settings.bound
    )
    counter = _jax.jit(
        lambda o, d, v: count_fast_samples(
            o, d, probe_cfg, voxelize_verts(v, settings.bound, grid_resolution)
        )
    )
    worst = 0
    for verts in world_verts:
        v = jnp.asarray(verts)
        for i in range(0, n - chunk + 1, chunk):
            worst = max(
                worst, int(counter(rays_o[i : i + chunk], rays_d[i : i + chunk], v))
            )
    return int(worst * safety)


def make_warp_frame_renderer_fast(
    fcfg: FieldConfig,
    settings: WarpRenderSettings,
    bg_value: float = 1.0,
    k_samples: int = 32,
    n_probes: int = 128,
    sample_budget_per_ray: int = 12,
    grid_resolution: int = 129,
    sample_budget: int | None = None,
):
    """Occupancy fast path for animation: per frame, the POSED mesh is
    voxelized into a density grid (ops.occupancy.voxelize_verts — the grid
    analogue of geometry_guided_near_far); selection+compaction then spend
    the sample budget only near the posed body, and only those samples pay
    the kNN warp + field evaluation."""
    import dataclasses as _dc

    from avatarcraft_tpu.models.instant_nsr import FastRenderConfig, render_rays_fast
    from avatarcraft_tpu.ops.occupancy import voxelize_verts

    @jax.jit
    def render_frame(params, rays_o, rays_d, warp_data: WarpData):
        n = rays_o.shape[0]
        chunk = min(settings.chunk, n)
        n_chunks = n // chunk
        grid = voxelize_verts(warp_data.verts, settings.bound, grid_resolution)
        warp_fn = make_warp_fn(warp_data, settings.geo_threshold)
        cfg = FastRenderConfig(
            n_probes=n_probes, k_samples=k_samples, bound=settings.bound,
            # absolute per-chunk budget when given (derive it honestly with
            # count_fast_samples over the pose sequence, zero-clip: bench.py
            # warp path), else the conservative per-ray cap
            sample_budget=(sample_budget if sample_budget is not None
                           else chunk * sample_budget_per_ray),
        )

        def body(args):
            ro, rd = args
            out = render_rays_fast(
                params, ro, rd, fcfg, cfg, grid, bg_value, warp_fn=warp_fn
            )
            return out["rgb"]

        rgb = jax.lax.map(
            body,
            (rays_o.reshape(n_chunks, chunk, 3), rays_d.reshape(n_chunks, chunk, 3)),
        )
        return rgb.reshape(n, 3)

    return render_frame
