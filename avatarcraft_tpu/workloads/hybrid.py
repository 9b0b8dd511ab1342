"""Hybrid rendering: avatar (instant-NSR) composited with a background NeRF
by depth (reference: utils/render_utils.py:605-719 render_hybrid_avatar and
:1025-1038 composite_by_depth).

The reference's NeuMan-scene variants are reproduced in their live form: an
avatar field rendered with geometry-guided bounds + warp, a background NeRF
rendered over the scene range, merged per-pixel by depth with the avatar's
opacity as the blend mask. Multi-person rendering
(render_hybrid_nerf_multi_persons, :815) generalizes to a list of warped
avatars composited front-to-back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from avatarcraft_tpu.models.instant_nsr import (
    FieldConfig,
    RenderConfig,
    render_rays,
)
from avatarcraft_tpu.models.nerf import NeRFConfig, render_nerf_rays
from avatarcraft_tpu.warp import WarpData, geometry_guided_near_far, make_warp_fn


def composite_by_depth(img_a, img_b, depth_a, depth_b):
    """Per-pixel nearest-wins compositing (reference: utils/render_utils.py:1025)."""
    mask_a = (depth_a < depth_b)[..., None]
    return jnp.where(mask_a, img_a, img_b)


def render_hybrid_avatar(
    avatar_params: dict,
    fcfg: FieldConfig,
    rcfg: RenderConfig,
    bkg_params: dict,
    bkg_cfg: NeRFConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    warp_data: WarpData | None = None,
    key: jax.Array | None = None,
    bkg_near: float = 0.5,
    bkg_far: float = 6.0,
    geo_threshold: float = 0.05,
) -> dict:
    """Render avatar + NeRF background and merge by depth.

    Returns {"rgb", "depth", "avatar_mask"}. Depths are expressed in world
    ray-t units for both branches before compositing.
    """
    key = key if key is not None else jax.random.PRNGKey(0)

    from avatarcraft_tpu.ops.sampling import near_far_from_bound

    if warp_data is not None:
        near, far = geometry_guided_near_far(
            rays_o, rays_d, warp_data.verts, geo_threshold
        )
        out_a = render_rays(
            avatar_params, rays_o, rays_d, key, fcfg, rcfg, 0.0,
            near_far=(near, far), warp_fn=make_warp_fn(warp_data, geo_threshold),
        )
        # un-normalize with the same fallback render_rays itself used for
        # rays that miss every vertex sphere: the cube bounds, not 0/1
        cnear, cfar = near_far_from_bound(rays_o, rays_d, rcfg.bound)
        near_w = jnp.where(jnp.isinf(near), cnear, near)
        far_w = jnp.where(jnp.isinf(far), cfar, far)
    else:
        out_a = render_rays(avatar_params, rays_o, rays_d, key, fcfg, rcfg, 0.0)
        near_w, far_w = near_far_from_bound(rays_o, rays_d, rcfg.bound)

    # avatar depth is normalized (z-near)/(far-near): undo to world t
    t_avatar = out_a["depth"][:, None] * (far_w - near_w) + near_w
    opaque = out_a["weight_sum"] > 0.5
    t_avatar = jnp.where(opaque, t_avatar, jnp.inf)

    out_b = render_nerf_rays(
        bkg_params, rays_o, rays_d, bkg_cfg, near=bkg_near, far=bkg_far,
        white_bkg=True,
    )
    # rays the background never hits have ~zero accumulated weight and a
    # meaningless (near-zero) expected depth; push them to infinity so the
    # avatar always wins against empty sky
    t_bkg = jnp.where(out_b["acc"] > 0.05, out_b["depth"], jnp.inf)[:, None]

    rgb = composite_by_depth(
        out_a["rgb"], out_b["rgb"], t_avatar[:, 0], t_bkg[:, 0]
    )
    return {
        "rgb": rgb,
        "depth": jnp.minimum(t_avatar, t_bkg)[:, 0],
        "avatar_mask": opaque[:, 0],
    }


def render_hybrid_multi_persons(
    avatars: list,
    bkg_params: dict,
    bkg_cfg: NeRFConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array | None = None,
    bkg_near: float = 0.5,
    bkg_far: float = 6.0,
) -> dict:
    """Multiple warped avatars + background, nearest-surface-wins
    (reference: utils/render_utils.py:815-913).

    ``avatars``: list of dicts with keys params/fcfg/rcfg/warp_data.
    One shared (bkg_near, bkg_far) range is used for the outer background
    and every per-avatar hybrid pass so their depths agree.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    out_b = render_nerf_rays(
        bkg_params, rays_o, rays_d, bkg_cfg, near=bkg_near, far=bkg_far,
        white_bkg=True,
    )
    rgb = out_b["rgb"]
    # empty-sky rays have ~zero accumulated weight and meaningless depth
    depth = jnp.where(out_b["acc"] > 0.05, out_b["depth"], jnp.inf)

    for i, av in enumerate(avatars):
        sub = jax.random.fold_in(key, i)
        res = render_hybrid_avatar(
            av["params"], av["fcfg"], av["rcfg"], bkg_params, bkg_cfg,
            rays_o, rays_d, warp_data=av.get("warp_data"), key=sub,
            bkg_near=bkg_near, bkg_far=bkg_far,
        )
        nearer = res["avatar_mask"] & (res["depth"] < depth)
        rgb = jnp.where(nearer[:, None], res["rgb"], rgb)
        depth = jnp.where(nearer, res["depth"], depth)
    return {"rgb": rgb, "depth": depth}
