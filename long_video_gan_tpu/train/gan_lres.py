"""Stage-1 (low-res) GAN trainer.

Functional, pjit-compiled reimplementation of the reference's LowResVideoGAN
(model/video_gan_lres.py:31-266). The train state is a pure pytree; update_G /
update_D / update_r1 / update_G_ema are jitted steps that shard the batch over
the mesh "data" axis. Collectives the reference issues eagerly (weight
broadcast at init, flat-grad all_reduce, per-layer magnitude-EMA all_reduce)
are all implicit: parameters are replicated, losses are global-batch means, so
XLA inserts the reductions inside the compiled step — one fused program per
phase instead of eager NCCL calls per layer.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp

from ..models.diff_augment import diff_augment
from ..models.discriminator_lres import VideoDiscriminator
from ..models.generator_lres import VideoGenerator
from ..utils.misc import assert_shape
from . import stats as stats_lib
from .common import (
    apply_updates,
    ema_beta_schedule,
    lerp_trees,
    make_adam,
    random_temporal_crop,
    scrub_grads,
    temporal_scale_augment,
    warmup_lrate,
)


class GANState(flax.struct.PyTreeNode):
    step: jax.Array
    G: dict            # {'params': ..., 'ema': ...}
    G_ema: dict        # same structure (params AND ema buffers are EMA'd)
    D: dict            # {'params': ...}
    opt_G: Any
    opt_D: Any


@dataclass
class LowResVideoGAN:
    seq_length: int
    height: int
    width: int
    channels: int = 3
    total_batch: int = 64

    G_lrate: float = 0.003
    G_beta2: float = 0.99
    G_warmup_steps: int = 0
    G_ema_beta: float = 0.99985
    G_ema_warmup_steps: int = 25000
    G_magnitude_ema_beta: float = 0.999
    G_grad_accum: int = 1
    G_kwargs: dict = field(default_factory=dict)
    G_random_temp_translate: bool = False

    D_lrate: float = 0.002
    D_beta2: float = 0.99
    D_warmup_steps: int = 0
    D_grad_accum: int = 1
    D_kwargs: dict = field(default_factory=dict)
    r1_gamma: Optional[float] = 10.0

    temp_scale_augment: float = 0.0
    diffaug_policy: str = "color,translation,cutout"
    # Wrap each micro-batch loss in jax.checkpoint. NOTE: measured on v5e,
    # a whole-loss checkpoint does NOT cut peak HBM (the en-bloc recompute
    # re-materializes every residual before the backward); shrink micro
    # batches via grad_accum to fit memory instead — or pass
    # G_kwargs["block_remat"]=True for per-block remat inside the generator,
    # the measured lever (lres micro-batch 2 -> 4, 85.9 -> 17.3 s/step).
    remat: bool = False
    # Unroll factor for the grad-accumulation scans (see SuperResVideoGAN).
    accum_unroll: int = 1

    def __post_init__(self):
        assert self.total_batch % self.G_grad_accum == 0
        assert self.total_batch % self.D_grad_accum == 0
        self.G = VideoGenerator(out_height=self.height, out_width=self.width, **self.G_kwargs)
        self.D = VideoDiscriminator(seq_length=self.seq_length,
                                    max_edge=max(self.height, self.width), **self.D_kwargs)
        self.opt_G = make_adam(self.G_lrate, self.G_beta2)
        self.opt_D = make_adam(self.D_lrate, self.D_beta2)

        self.update_G = jax.jit(self._update_G, donate_argnums=0)
        self.update_D = jax.jit(self._update_D, donate_argnums=0)
        self.update_r1 = jax.jit(self._update_r1, donate_argnums=0)
        self.update_G_ema = jax.jit(self._update_G_ema, donate_argnums=0)

    # ------------------------------------------------------------------ init

    @property
    def gen_seq_length(self) -> int:
        extra = self.G.total_temporal_scale if self.G_random_temp_translate else 0
        return self.seq_length + extra

    def init_state(self, key: jax.Array) -> GANState:
        kg, kn, kd = jax.random.split(key, 3)
        G_vars = self.G.init({"params": kg, "noise": kn}, 1, self.seq_length)
        dummy = jnp.zeros((1, self.channels, self.seq_length, self.height, self.width))
        D_vars = self.D.init({"params": kd}, dummy)
        G_vars = jax.tree.map(lambda x: x, G_vars)   # plain dict copy
        return GANState(
            step=jnp.zeros((), jnp.int32),
            G=dict(G_vars),
            G_ema=jax.tree.map(jnp.copy, dict(G_vars)),
            D=dict(D_vars),
            opt_G=self.opt_G.init(G_vars["params"]),
            opt_D=self.opt_D.init(D_vars["params"]),
        )

    # ------------------------------------------------------------------ D run

    def run_D(self, D_vars, key: jax.Array, video: jax.Array) -> jax.Array:
        """DiffAugment (+ optional temporal-scale augment) then score
        (reference run_D, video_gan_lres.py:237-266)."""
        assert_shape(video, (None, self.channels, self.seq_length, self.height, self.width))
        k1, k2 = jax.random.split(key)
        video = diff_augment(k1, video, self.diffaug_policy)
        if self.temp_scale_augment > 0:
            video = temporal_scale_augment(k2, video, self.temp_scale_augment)
        return self.D.apply(D_vars, video)

    def _generate(self, G_vars, key: jax.Array, batch_size: int, update_ema: bool):
        """Generate fake videos (with the post-gen random temporal crop)."""
        k_noise, k_crop = jax.random.split(key)
        beta = self.G_magnitude_ema_beta if update_ema else 1.0
        if update_ema:
            video, new_vars = self.G.apply(
                G_vars, batch_size, self.gen_seq_length, magnitude_ema_beta=beta,
                rngs={"noise": k_noise}, mutable=["ema"])
            G_vars = dict(G_vars, ema=new_vars["ema"])
        else:
            video = self.G.apply(G_vars, batch_size, self.gen_seq_length,
                                 rngs={"noise": k_noise})
        if self.G_random_temp_translate:
            video = random_temporal_crop(k_crop, video, self.seq_length)
        return video, G_vars

    # ------------------------------------------------------------------ G step

    def _update_G(self, state: GANState, key: jax.Array):
        micro = self.total_batch // self.G_grad_accum

        def micro_loss(params_G, key):
            video, _ = self._generate(dict(state.G, params=params_G), key, micro, False)
            k_d = jax.random.fold_in(key, 1)
            logits = self.run_D(state.D, k_d, video)
            loss = jnp.mean(jax.nn.softplus(-logits))
            return loss, logits

        if self.remat:
            micro_loss = jax.checkpoint(micro_loss)

        def accum_step(carry, key):
            grads_acc, stats_acc = carry
            (loss, logits), grads = jax.value_and_grad(micro_loss, has_aux=True)(
                state.G["params"], key)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            stats_acc = {
                "loss/G_score": stats_acc["loss/G_score"] + stats_lib.moments(logits),
                "loss/G_sign": stats_acc["loss/G_sign"] + stats_lib.moments(jnp.sign(logits)),
                "loss/G_loss": stats_acc["loss/G_loss"] + stats_lib.scalar_moments(loss),
            }
            return (grads_acc, stats_acc), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.G["params"])
        zero_stats = {k: jnp.zeros(3) for k in ("loss/G_score", "loss/G_sign", "loss/G_loss")}
        keys = jax.random.split(key, self.G_grad_accum)
        (grads, stats), _ = jax.lax.scan(accum_step, (zero_grads, zero_stats), keys,
                                         unroll=max(1, min(int(self.accum_unroll), self.G_grad_accum)))

        grads = scrub_grads(grads, gain=1.0 / self.G_grad_accum)
        lrate = warmup_lrate(self.G_lrate, state.step, self.G_warmup_steps)
        new_params, new_opt = apply_updates(state.G["params"], grads, self.opt_G,
                                            state.opt_G, lrate)
        state = state.replace(G=dict(state.G, params=new_params), opt_G=new_opt)
        stats["progress/G_lrate"] = stats_lib.scalar_moments(lrate)
        return state, stats

    # ------------------------------------------------------------------ D step

    def _update_D(self, state: GANState, key: jax.Array, real_video: jax.Array):
        assert_shape(real_video, (self.total_batch, self.channels, self.seq_length,
                                  self.height, self.width))
        accum = self.D_grad_accum
        micro = self.total_batch // accum
        real_chunks = real_video.reshape(accum, micro, *real_video.shape[1:])

        def micro_loss(params_D, fake, real, key):
            kf, kr = jax.random.split(key)
            D_vars = dict(state.D, params=params_D)
            fake_logits = self.run_D(D_vars, kf, fake)
            real_logits = self.run_D(D_vars, kr, real)
            fake_loss = jnp.mean(jax.nn.softplus(fake_logits))
            real_loss = jnp.mean(jax.nn.softplus(-real_logits))
            return fake_loss + real_loss, (fake_logits, real_logits, fake_loss + real_loss)

        if self.remat:
            micro_loss = jax.checkpoint(micro_loss)

        def accum_step(carry, xs):
            # Fakes are generated per micro-batch INSIDE the accumulation scan
            # (reference video_gan_lres.py:154-156 generates per chunk) — the
            # full-batch fake video never materializes, and the magnitude EMAs
            # update per chunk exactly as the reference's loop does.
            grads_acc, stats_acc, G_vars = carry
            real, key = xs
            k_gen_i, k_d = jax.random.split(key)
            fake, G_vars = self._generate(G_vars, k_gen_i, micro, True)
            (_, (fl, rl, total)), grads = jax.value_and_grad(micro_loss, has_aux=True)(
                state.D["params"], fake, real, k_d)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            stats_acc = {
                "loss/D_score_fake": stats_acc["loss/D_score_fake"] + stats_lib.moments(fl),
                "loss/D_score_real": stats_acc["loss/D_score_real"] + stats_lib.moments(rl),
                "loss/D_sign_fake": stats_acc["loss/D_sign_fake"] + stats_lib.moments(jnp.sign(fl)),
                "loss/D_sign_real": stats_acc["loss/D_sign_real"] + stats_lib.moments(jnp.sign(rl)),
                "loss/D_loss": stats_acc["loss/D_loss"] + stats_lib.scalar_moments(total),
            }
            return (grads_acc, stats_acc, G_vars), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.D["params"])
        names = ("loss/D_score_fake", "loss/D_score_real", "loss/D_sign_fake",
                 "loss/D_sign_real", "loss/D_loss")
        zero_stats = {k: jnp.zeros(3) for k in names}
        keys = jax.random.split(key, accum)
        (grads, stats, new_G), _ = jax.lax.scan(
            accum_step, (zero_grads, zero_stats, state.G), (real_chunks, keys),
            unroll=max(1, min(int(self.accum_unroll), accum)))
        state = state.replace(G=new_G)

        grads = scrub_grads(grads, gain=1.0 / accum)
        lrate = warmup_lrate(self.D_lrate, state.step, self.D_warmup_steps)
        new_params, new_opt = apply_updates(state.D["params"], grads, self.opt_D,
                                            state.opt_D, lrate)
        state = state.replace(D=dict(state.D, params=new_params), opt_D=new_opt)
        stats["progress/D_lrate"] = stats_lib.scalar_moments(lrate)
        return state, stats

    # ------------------------------------------------------------------ R1

    def _update_r1(self, state: GANState, key: jax.Array, real_video: jax.Array,
                   gain: float = 1.0):
        assert self.r1_gamma is not None
        accum = self.D_grad_accum
        micro = self.total_batch // accum
        chunks = real_video.reshape(accum, micro, *real_video.shape[1:])

        def micro_loss(params_D, video, key):
            D_vars = dict(state.D, params=params_D)

            def d_sum(v):
                return jnp.sum(self.run_D(D_vars, key, v))

            r1_grads = jax.grad(d_sum)(video)
            penalty = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3, 4))
            loss = jnp.mean(penalty * (self.r1_gamma / 2))
            return loss, penalty

        def accum_step(carry, xs):
            grads_acc, stats_acc = carry
            video, key = xs
            (loss, penalty), grads = jax.value_and_grad(micro_loss, has_aux=True)(
                state.D["params"], video, key)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            stats_acc = {
                "loss/r1_penalty": stats_acc["loss/r1_penalty"] + stats_lib.moments(penalty),
                "loss/r1_loss": stats_acc["loss/r1_loss"] + stats_lib.scalar_moments(loss),
            }
            return (grads_acc, stats_acc), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.D["params"])
        zero_stats = {k: jnp.zeros(3) for k in ("loss/r1_penalty", "loss/r1_loss")}
        keys = jax.random.split(key, accum)
        (grads, stats), _ = jax.lax.scan(accum_step, (zero_grads, zero_stats), (chunks, keys),
                                         unroll=max(1, min(int(self.accum_unroll), accum)))

        grads = scrub_grads(grads, gain=gain / accum)
        lrate = warmup_lrate(self.D_lrate, state.step, self.D_warmup_steps)
        new_params, new_opt = apply_updates(state.D["params"], grads, self.opt_D,
                                            state.opt_D, lrate)
        return state.replace(D=dict(state.D, params=new_params), opt_D=new_opt), stats

    # ------------------------------------------------------------------ EMA

    def _update_G_ema(self, state: GANState):
        beta = ema_beta_schedule(state.step, self.G_ema_beta, self.G_ema_warmup_steps)
        new_ema = lerp_trees(state.G_ema, state.G, 1.0 - beta)
        return state.replace(G_ema=new_ema, step=state.step + 1)
