"""Score Distillation Sampling guidance (the reference's L5 layer).

Re-designs the reference StableDiffusion wrapper (reference:
models/diffusion.py:24-333) as a functional JAX module:

* the diffusion schedule is closed-form (scaled-linear betas -> alphas_cumprod;
  reference builds a PNDMScheduler just for these constants,
  models/diffusion.py:63-64), no weights needed;
* ``sds_image_grad`` reproduces ``mannual_backward`` exactly: resize render to
  512^2, VAE-encode WITH grad, one random t in [0.02T, 0.98T], eps-prediction
  WITHOUT grad, classifier-free guidance at scale 100, gradient
  w(t)*(eps_hat - eps) clamped to +-1, pulled back through the VAE encoder and
  the resize by one jax.vjp (reference: models/diffusion.py:92-149);
* the denoiser/VAE/text-encoder are injected callables, so the same machinery
  drives the full Stable Diffusion modules (avatarcraft_tpu.models.sd) or a
  tiny stand-in for tests. Everything jits; the UNet eval is data-parallel
  across views when the stylize workload shards its batch.

Also provides txt2img sampling (PNDM/DDIM-style) mirroring produce_latents /
decode_latents / prompt_to_img (reference: models/diffusion.py:266-333).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Scaled-linear beta schedule (SD default; reference: models/diffusion.py:63)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012

    @property
    def betas(self) -> np.ndarray:
        return (
            np.linspace(
                self.beta_start**0.5,
                self.beta_end**0.5,
                self.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )

    @property
    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas).astype(np.float32)

    @property
    def min_step(self) -> int:
        return int(self.num_train_timesteps * 0.02)

    @property
    def max_step(self) -> int:
        return int(self.num_train_timesteps * 0.98)


@dataclasses.dataclass(frozen=True)
class GuidanceModules:
    """The three injected networks.

    unet:        (latents [B,C,h,w], t [B], text_emb [B,L,D]) -> eps [B,C,h,w]
    vae_encode:  (images [B,3,H,W] in [0,1]) -> latents [B,C,h,w]
                 (deterministic mean * 0.18215, reference: models/diffusion.py:304-312)
    text_encode: (list[str]) -> [n, L, D] embeddings
    """

    unet: Callable
    vae_encode: Callable
    text_encode: Callable
    latent_scale: int = 8  # image->latent downsampling factor
    latent_channels: int = 4
    image_size: int = 512
    vae_decode: Callable | None = None  # latents -> images (txt2img)
    tokenizer: object | None = None
    configs: dict | None = None
    use_depth: bool = False  # SD 2.0-depth: concat depth to the latent input


class SDSGuidance:
    """Functional SDS guidance with reference-parity semantics."""

    def __init__(
        self,
        modules: GuidanceModules,
        schedule: DiffusionSchedule = DiffusionSchedule(),
    ):
        self.m = modules
        self.schedule = schedule
        self.alphas = jnp.asarray(schedule.alphas_cumprod)

    # -- text ---------------------------------------------------------------
    def get_text_embeds(self, prompts: list[str]) -> jnp.ndarray:
        """[uncond; cond] CFG pair (reference: models/diffusion.py:72-89)."""
        if not isinstance(prompts, (list, tuple)):
            prompts = [prompts]
        cond = self.m.text_encode(list(prompts))
        uncond = self.m.text_encode([""] * len(prompts))
        return jnp.concatenate([uncond, cond], axis=0)

    # -- SDS ----------------------------------------------------------------
    def sds_image_grad_jit(
        self,
        key: jax.Array,
        text_embeddings: jnp.ndarray,
        pred_rgb: jnp.ndarray,
        guidance_scale: float = 100.0,
        pred_depth: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Jitted sds_image_grad (one executable per image shape).

        The training loop calls this every step; the eager path dispatches
        the UNet op-by-op, which this environment's ~30 ms/call execution
        relay turns into seconds per step."""
        # two lazy wrappers (with/without depth conditioning); jax.jit itself
        # specializes and caches per input shape
        cache_key = pred_depth is None
        if not hasattr(self, "_sds_jit"):
            self._sds_jit = {}
        if cache_key not in self._sds_jit:
            if pred_depth is None:
                self._sds_jit[cache_key] = jax.jit(
                    lambda k, emb, rgb, gs: self.sds_image_grad(k, emb, rgb, gs)
                )
            else:
                self._sds_jit[cache_key] = jax.jit(
                    lambda k, emb, rgb, gs, d: self.sds_image_grad(
                        k, emb, rgb, gs, pred_depth=d
                    )
                )
        fn = self._sds_jit[cache_key]
        gs = jnp.float32(guidance_scale)
        if pred_depth is None:
            return fn(key, text_embeddings, pred_rgb, gs)
        return fn(key, text_embeddings, pred_rgb, gs, pred_depth)

    def sds_image_grad(
        self,
        key: jax.Array,
        text_embeddings: jnp.ndarray,
        pred_rgb: jnp.ndarray,
        guidance_scale: float = 100.0,
        pred_depth: jnp.ndarray | None = None,
        t_override: jnp.ndarray | None = None,
        noise_override: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """d(SDS)/d(pred_rgb). pred_rgb: [1, 3, H, W] in [0, 1].

        Matches mannual_backward (reference: models/diffusion.py:92-149): the
        eps-prediction runs under stop_gradient; the clamped latent-space
        gradient is pulled back through VAE-encode and the bilinear resize.

        ``pred_depth`` ([1, 1, H, W], any scale): with a depth-conditioned
        UNet (``modules.use_depth``, SD 2.0-depth) the depth is resized to
        the latent grid, min-max normalized to [-1, 1] and concatenated to
        the UNet's latent input (reference: models/diffusion.py:107-111,130-131).
        """
        S = self.m.image_size

        def encode(img):
            img512 = jax.image.resize(
                img, (img.shape[0], 3, S, S), method="bilinear"
            )
            return self.m.vae_encode(img512)

        latents, vjp_fn = jax.vjp(encode, pred_rgb)

        k_t, k_noise = jax.random.split(key)
        # t/noise injection: deterministic replay for parity tests against the
        # torch transcription of mannual_backward (tests/test_sds_torch_parity)
        t = (
            jnp.asarray(t_override)
            if t_override is not None
            else jax.random.randint(
                k_t, (), self.schedule.min_step, self.schedule.max_step + 1
            )
        )
        noise = (
            jnp.asarray(noise_override, latents.dtype)
            if noise_override is not None
            else jax.random.normal(k_noise, latents.shape, latents.dtype)
        )
        a_t = self.alphas[t]
        latents_noisy = jnp.sqrt(a_t) * latents + jnp.sqrt(1.0 - a_t) * noise

        lat2 = jnp.concatenate([latents_noisy] * 2, axis=0)
        if self.m.use_depth and pred_depth is not None:
            lh, lw = latents.shape[-2:]
            d = jax.image.resize(
                pred_depth, (pred_depth.shape[0], 1, lh, lw), method="cubic"
            )
            d = 2.0 * (d - d.min()) / (d.max() - d.min() + 1e-12) - 1.0
            d = jax.lax.stop_gradient(jnp.concatenate([d] * 2, axis=0))
            lat2 = jnp.concatenate([lat2, d], axis=1)
        t2 = jnp.full((lat2.shape[0],), t, jnp.int32)
        eps = jax.lax.stop_gradient(self.m.unet(lat2, t2, text_embeddings))
        eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
        eps_hat = eps_uncond + guidance_scale * (eps_text - eps_uncond)

        w = 1.0 - a_t
        grad_lat = jnp.clip(w * (eps_hat - noise), -1.0, 1.0)
        (grad_img,) = vjp_fn(grad_lat.astype(latents.dtype))
        return grad_img

    # -- txt2img sampling (capability parity) --------------------------------
    def _cfg_eps(self, latents, t, text_embeddings, guidance_scale):
        # one jitted executable reused across all sampler steps (t and the
        # guidance scale are traced operands) — the sampling loop otherwise
        # dispatches the UNet op-by-op, which this environment's ~30 ms/call
        # execution relay turns into minutes
        if not hasattr(self, "_cfg_eps_jit"):
            def fn(latents, t, emb, gs):
                lat2 = jnp.concatenate([latents] * 2, axis=0)
                t2 = jnp.full((lat2.shape[0],), t, jnp.int32)
                eps = self.m.unet(lat2, t2, emb)
                eps_u, eps_c = jnp.split(eps, 2, axis=0)
                return eps_u + gs * (eps_c - eps_u)

            self._cfg_eps_jit = jax.jit(fn)
        return self._cfg_eps_jit(
            latents, jnp.int32(int(t)), text_embeddings,
            jnp.float32(guidance_scale),
        )

    def produce_latents(
        self,
        key: jax.Array,
        text_embeddings: jnp.ndarray,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        latents: jnp.ndarray | None = None,
        latent_channels: int | None = None,
        scheduler: str = "pndm",
    ) -> jnp.ndarray:
        """Deterministic txt2img sampling (reference: models/diffusion.py:266-290).

        ``scheduler='pndm'`` (default, reference parity) runs the PNDM/PLMS
        linear-multistep update in the Stable Diffusion pipeline configuration
        (skip_prk_steps=True, steps_offset=1, set_alpha_to_one=False —
        diffusers scheduling_pndm.py: set_timesteps builds the PLMS timestep
        list, step_plms keeps a 4-deep eps history, _get_prev_sample applies
        the PNDM transfer coefficients). ``scheduler='ddim'`` keeps the
        eta=0 DDIM update over the same alphas."""
        f = self.m.latent_scale
        B = text_embeddings.shape[0] // 2
        if latent_channels is None:
            latent_channels = self.m.latent_channels
        if latents is None:
            latents = jax.random.normal(
                key, (B, latent_channels, height // f, width // f)
            )
        alphas = self.schedule.alphas_cumprod
        T = self.schedule.num_train_timesteps

        if scheduler == "ddim":
            step_ids = (
                np.linspace(T - 1, 0, num_inference_steps).round().astype(np.int32)
            )
            for i, t in enumerate(step_ids):
                eps_hat = self._cfg_eps(latents, t, text_embeddings, guidance_scale)
                a_t = alphas[t]
                a_prev = alphas[step_ids[i + 1]] if i + 1 < len(step_ids) else 1.0
                x0 = (latents - jnp.sqrt(1 - a_t) * eps_hat) / jnp.sqrt(a_t)
                latents = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps_hat
            return latents

        if scheduler != "pndm":
            raise ValueError(f"unknown scheduler {scheduler!r}")

        # ---- PNDM / PLMS (SD pipeline config: skip_prk_steps) --------------
        ratio = T // num_inference_steps
        base = (np.arange(0, num_inference_steps) * ratio).round().astype(np.int64) + 1
        # PLMS warm-start: the second timestep is visited twice
        # (diffusers set_timesteps: concat(ts[:-1], ts[-2:-1], ts[-1:])[::-1])
        plms_ts = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]

        # set_alpha_to_one=False -> the final step targets alphas_cumprod[0]
        final_alpha = alphas[0]

        def prev_sample(sample, t, t_prev, eps):
            a_t = alphas[t]
            a_prev = alphas[t_prev] if t_prev >= 0 else final_alpha
            b_t = 1.0 - a_t
            b_prev = 1.0 - a_prev
            sample_coeff = (a_prev / a_t) ** 0.5
            denom = a_t * b_prev**0.5 + (a_t * b_t * a_prev) ** 0.5
            return sample_coeff * sample - (a_prev - a_t) * eps / denom

        ets: list = []
        cur_sample = None
        for counter, t in enumerate(plms_ts):
            t = int(t)
            t_prev = t - ratio
            eps_hat = self._cfg_eps(latents, t, text_embeddings, guidance_scale)

            if counter != 1:
                ets = ets[-3:] + [eps_hat]
            else:
                # warm-start replay: reuse the first sample, step from t+ratio
                t_prev = t
                t = t + ratio

            if len(ets) == 1 and counter == 0:
                eps_lms = eps_hat
                cur_sample = latents
            elif len(ets) == 1 and counter == 1:
                eps_lms = (eps_hat + ets[-1]) / 2.0
                latents = cur_sample
                cur_sample = None
            elif len(ets) == 2:
                eps_lms = (3.0 * ets[-1] - ets[-2]) / 2.0
            elif len(ets) == 3:
                eps_lms = (23.0 * ets[-1] - 16.0 * ets[-2] + 5.0 * ets[-3]) / 12.0
            else:
                eps_lms = (
                    55.0 * ets[-1] - 59.0 * ets[-2] + 37.0 * ets[-3] - 9.0 * ets[-4]
                ) / 24.0

            latents = prev_sample(latents, t, t_prev, eps_lms)
        return latents

    def prompt_to_img(
        self,
        prompts,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        latents: jnp.ndarray | None = None,
        key: jax.Array | None = None,
        scheduler: str = "pndm",
    ) -> np.ndarray:
        """prompts -> uint8 images [B, H, W, 3]
        (reference: models/diffusion.py:314-333: embeds -> produce_latents ->
        decode_latents -> uint8 HWC)."""
        if self.m.vae_decode is None:
            raise ValueError("prompt_to_img needs modules with a VAE decoder")
        if isinstance(prompts, str):
            prompts = [prompts]
        text_embeddings = self.get_text_embeds(prompts)
        latents = self.produce_latents(
            key if key is not None else jax.random.PRNGKey(0),
            text_embeddings,
            height=height,
            width=width,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            latents=latents,
            scheduler=scheduler,
        )
        imgs = self.m.vae_decode(latents)  # [B, 3, H, W] in [0, 1]
        imgs = np.asarray(imgs).transpose(0, 2, 3, 1)
        return (imgs * 255).round().astype(np.uint8)


def make_dummy_modules(
    latent_channels: int = 4, image_size: int = 64, emb_dim: int = 32, seq_len: int = 8
) -> GuidanceModules:
    """Deterministic stand-in networks for tests and pipeline smoke runs."""

    def unet(latents, t, text_emb):
        # time + text conditioned pseudo-eps: deterministic, smooth, nonzero
        t_feat = jnp.cos(t.astype(jnp.float32) / 100.0)[:, None, None, None]
        txt = jnp.mean(text_emb, axis=(1, 2))[:, None, None, None]
        return jnp.tanh(latents) * t_feat + 0.1 * txt

    def vae_encode(images):
        # strided average-pool "encoder": differentiable, shape-correct
        B, C, H, W = images.shape
        f = 8
        lat = images.reshape(B, C, H // f, f, W // f, f).mean(axis=(3, 5))
        lat = jnp.concatenate([lat, lat[:, :1]], axis=1)  # 3 -> 4 channels
        return lat * 0.18215

    def text_encode(prompts):
        out = []
        for p in prompts:
            seed = abs(hash(p)) % (2**31)
            out.append(jax.random.normal(jax.random.PRNGKey(seed), (seq_len, emb_dim)))
        return jnp.stack(out)

    return GuidanceModules(
        unet=unet, vae_encode=vae_encode, text_encode=text_encode, image_size=image_size
    )
