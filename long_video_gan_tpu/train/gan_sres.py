"""Stage-2 (super-res) GAN trainer.

Functional, pjit-compiled reimplementation of the reference's SuperResVideoGAN
(model/video_gan_sres.py:31-332). Beyond the lres trainer this adds:
  * ADA with an on-device feedback controller: the real-logit sign moments
    accumulate in the train state and `update_ada` adjusts `ada_p` every
    ada_interval steps (reference :256-266 routes this through a host-side
    stats Collector + all_reduce; keeping it in-state avoids the sync stall);
  * lr-conditioning input corruption (`in_augment`, reference :122-136);
  * run_D that upsamples lr, concatenates with hr on the time axis so ADA
    transforms both identically, then applies lr-conditioning dropout
    (reference :315-330);
  * R1 on the hr input only (reference :224-252).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp

from ..models.ada_augment import AugmentPipe
from ..models.discriminator_sres import VideoDiscriminator
from ..models.generator_sres import VideoGenerator
from ..utils.misc import assert_shape
from . import stats as stats_lib
from .common import (
    apply_updates,
    ema_beta_schedule,
    lerp_trees,
    make_adam,
    scrub_grads,
    warmup_lrate,
)


class GANState(flax.struct.PyTreeNode):
    step: jax.Array
    G: dict
    G_ema: dict
    D: dict
    opt_G: Any
    opt_D: Any
    ada_p: jax.Array                 # overall ADA probability (adapted)
    sign_real_moments: jax.Array     # [count, sum, sumsq] since last ADA update


@dataclass
class SuperResVideoGAN:
    seq_length: int
    temporal_context: int
    lr_height: int
    lr_width: int
    hr_height: int
    hr_width: int
    channels: int = 3
    total_batch: int = 32

    G_lrate: float = 0.003
    G_beta2: float = 0.99
    G_warmup_steps: int = 0
    G_ema_beta: float = 0.99985
    G_ema_warmup_steps: int = 25000
    G_magnitude_ema_beta: float = 0.999
    G_grad_accum: int = 1
    G_kwargs: dict = field(default_factory=dict)

    D_lrate: float = 0.002
    D_beta2: float = 0.99
    D_warmup_steps: int = 0
    D_grad_accum: int = 1
    D_kwargs: dict = field(default_factory=dict)

    r1_gamma: Optional[float] = 1.0
    lr_cond_prob: float = 0.1
    # Wrap each micro-batch loss in jax.checkpoint. NOTE: measured on v5e,
    # a whole-loss checkpoint does NOT cut peak HBM (the en-bloc recompute
    # re-materializes every residual before the backward); shrink micro
    # batches via grad_accum to fit memory instead. Per-block remat inside
    # the generators is the real lever and is tracked as future work.
    remat: bool = False
    # Unroll factor for the grad-accumulation scans (1 = rolled while loop).
    # The rolled loop carries the whole gradient pytree and XLA relayouts the
    # carry at every iteration boundary (measured r4: relayout = 39.6% of
    # update_G device time); unrolling trades compile time + peak HBM for
    # removing those copies. Full unroll at the reference sres config OOMs on
    # one v5e chip (measured r4) — partial factors are the usable range.
    accum_unroll: int = 1

    augment_p_init: float = 0.0
    augment_p_max: float = 0.5
    augment_p_update_rate: float = 0.000125
    augment_real_sign_target: Optional[float] = 0.6
    augment_kwargs: dict = field(default_factory=dict)

    in_augment_p: float = 0.5
    in_augment_strength: float = 8.0
    # Static reflect-pad margin for the in_augment geometric warp, as a
    # fraction of the frame size. The default AugmentPipe margin (1.0 = the
    # reference's clamp bound, size-1) pads 36x64 lr frames to 106x190 before
    # the x2 supersampled warp — a ~10x inflated gather source for transforms
    # whose 4-sigma-joint worst case (strength 8: scale_std .08, aniso_std
    # .08, rotate_max .016pi, xfrac_std .016) needs only ~24 px of x margin
    # ((2^.32·2^.32-1)·32 + sin(.016pi)·18·1.56 + 4·.016·64 + 1) and ~16 px
    # of y margin. 0.5 (32 px x, 18 px y) covers that with headroom; draws
    # beyond it read zeros marginally earlier than the reference's reflect
    # padding — negligible for a corruption augment.
    in_augment_margin_frac: float = 0.5

    def __post_init__(self):
        self.context_seq_length = self.seq_length + 2 * self.temporal_context
        self.G = VideoGenerator(
            hr_height=self.hr_height, hr_width=self.hr_width,
            lr_height=self.lr_height, lr_width=self.lr_width,
            temporal_context=self.temporal_context, **self.G_kwargs)
        self.D = VideoDiscriminator(
            channels=self.channels, seq_length=self.seq_length,
            lr_height=self.lr_height, lr_width=self.lr_width,
            hr_height=self.hr_height, hr_width=self.hr_width, **self.D_kwargs)
        self.opt_G = make_adam(self.G_lrate, self.G_beta2)
        self.opt_D = make_adam(self.D_lrate, self.D_beta2)

        self.augment = None
        if self.augment_p_init > 0 or self.augment_real_sign_target is not None:
            self.augment = AugmentPipe(**self.augment_kwargs)

        self.in_augment = None
        if self.in_augment_strength > 0 and self.in_augment_p > 0:
            s = self.in_augment_strength
            self.in_augment = AugmentPipe(
                scale=1, scale_std=0.01 * s, rotate=1, rotate_max=0.002 * s,
                aniso=1, aniso_std=0.01 * s, xfrac=1, xfrac_std=0.002 * s,
                noise=1, noise_std=0.01 * s,
                margin_frac=self.in_augment_margin_frac)

        self.update_G = jax.jit(self._update_G, donate_argnums=0)
        self.update_D = jax.jit(self._update_D, donate_argnums=0)
        self.update_r1 = jax.jit(self._update_r1, donate_argnums=0)
        self.update_ada = jax.jit(self._update_ada, donate_argnums=0)
        self.update_G_ema = jax.jit(self._update_G_ema, donate_argnums=0)

    # ------------------------------------------------------------------ init

    def init_state(self, key: jax.Array) -> GANState:
        kg, kn, kd = jax.random.split(key, 3)
        lr_dummy = jnp.zeros((1, self.channels, self.context_seq_length,
                              self.lr_height, self.lr_width))
        G_vars = self.G.init({"params": kg, "noise": kn}, lr_dummy)
        hr_dummy = jnp.zeros((1, self.channels, self.seq_length,
                              self.hr_height, self.hr_width))
        lr_d = jnp.zeros((1, self.channels, self.seq_length, self.lr_height, self.lr_width))
        D_vars = self.D.init({"params": kd}, lr_d, hr_dummy)
        return GANState(
            step=jnp.zeros((), jnp.int32),
            G=dict(G_vars),
            G_ema=jax.tree.map(jnp.copy, dict(G_vars)),
            D=dict(D_vars),
            opt_G=self.opt_G.init(G_vars["params"]),
            opt_D=self.opt_D.init(D_vars["params"]),
            ada_p=jnp.asarray(self.augment_p_init, jnp.float32),
            sign_real_moments=jnp.zeros(3),
        )

    # ------------------------------------------------------------------ run_D

    def crop_to_seq_length(self, video: jax.Array) -> jax.Array:
        t0 = (video.shape[2] - self.seq_length) // 2
        return video[:, :, t0:t0 + self.seq_length]

    def run_D(self, D_vars, key: jax.Array, ada_p, lr_video, hr_video) -> jax.Array:
        assert_shape(lr_video, (None, self.channels, self.seq_length, self.lr_height, self.lr_width))
        assert_shape(hr_video, (None, self.channels, self.seq_length, self.hr_height, self.hr_width))
        k_aug, k_drop = jax.random.split(key)

        lr_up = self.D.apply(D_vars, lr_video, method=self.D.upsample_lr)
        both = jnp.concatenate([lr_up, hr_video], axis=2)
        if self.augment is not None:
            both = self.augment(k_aug, both, ada_p)
        lr_up, hr_video = jnp.split(both, 2, axis=2)

        if self.lr_cond_prob < 1:
            mask = jax.random.uniform(k_drop, (lr_up.shape[0], 1, 1, 1, 1)) < self.lr_cond_prob
            lr_up = lr_up * mask.astype(lr_up.dtype)
        return self.D.apply(D_vars, lr_up, hr_video)

    def _apply_in_augment(self, key, lr_video):
        if self.in_augment is None:
            return lr_video
        return self.in_augment(key, lr_video, self.in_augment_p)

    def _hr_from_lr(self, G_vars, key, lr_video, update_ema: bool):
        beta = self.G_magnitude_ema_beta if update_ema else 1.0
        if update_ema:
            hr, new_vars = self.G.apply(G_vars, lr_video, magnitude_ema_beta=beta,
                                        rngs={"noise": key}, mutable=["ema"])
            return hr, dict(G_vars, ema=new_vars["ema"])
        hr = self.G.apply(G_vars, lr_video, rngs={"noise": key})
        return hr, G_vars

    # ------------------------------------------------------------------ G step

    def _update_G(self, state: GANState, key: jax.Array, lr_video: jax.Array):
        assert_shape(lr_video, (self.total_batch, self.channels, self.context_seq_length,
                                self.lr_height, self.lr_width))
        k_in, k_steps = jax.random.split(key)
        lr_video = self._apply_in_augment(k_in, lr_video)

        accum = self.G_grad_accum
        micro = self.total_batch // accum
        chunks = lr_video.reshape(accum, micro, *lr_video.shape[1:])

        def micro_loss(params_G, lr_chunk, key):
            kz, kd = jax.random.split(key)
            hr, _ = self._hr_from_lr(dict(state.G, params=params_G), kz, lr_chunk, False)
            lr_crop = self.crop_to_seq_length(lr_chunk)
            logits = self.run_D(state.D, kd, state.ada_p, lr_crop, hr)
            return jnp.mean(jax.nn.softplus(-logits)), logits

        if self.remat:
            micro_loss = jax.checkpoint(micro_loss)

        def accum_step(carry, xs):
            grads_acc, stats_acc = carry
            lr_chunk, key = xs
            (loss, logits), grads = jax.value_and_grad(micro_loss, has_aux=True)(
                state.G["params"], lr_chunk, key)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            stats_acc = {
                "loss/G_score": stats_acc["loss/G_score"] + stats_lib.moments(logits),
                "loss/G_sign": stats_acc["loss/G_sign"] + stats_lib.moments(jnp.sign(logits)),
                "loss/G_loss": stats_acc["loss/G_loss"] + stats_lib.scalar_moments(loss),
            }
            return (grads_acc, stats_acc), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.G["params"])
        zero_stats = {k: jnp.zeros(3) for k in ("loss/G_score", "loss/G_sign", "loss/G_loss")}
        keys = jax.random.split(k_steps, accum)
        (grads, stats), _ = jax.lax.scan(accum_step, (zero_grads, zero_stats), (chunks, keys),
                                         unroll=max(1, min(int(self.accum_unroll), accum)))

        grads = scrub_grads(grads, gain=1.0 / accum)
        lrate = warmup_lrate(self.G_lrate, state.step, self.G_warmup_steps)
        new_params, new_opt = apply_updates(state.G["params"], grads, self.opt_G,
                                            state.opt_G, lrate)
        state = state.replace(G=dict(state.G, params=new_params), opt_G=new_opt)
        stats["progress/G_lrate"] = stats_lib.scalar_moments(lrate)
        return state, stats

    # ------------------------------------------------------------------ D step

    def _update_D(self, state: GANState, key: jax.Array, fake_lr_video: jax.Array,
                  real_lr_video: jax.Array, real_hr_video: jax.Array):
        assert_shape(fake_lr_video, (self.total_batch, self.channels, self.context_seq_length,
                                     self.lr_height, self.lr_width))
        assert_shape(real_hr_video, (self.total_batch, self.channels, self.seq_length,
                                     self.hr_height, self.hr_width))
        k_in1, k_in2, k_steps = jax.random.split(key, 3)
        fake_lr_video = self._apply_in_augment(k_in1, fake_lr_video)
        real_lr_video = self._apply_in_augment(k_in2, real_lr_video)

        fake_lr_crop = self.crop_to_seq_length(fake_lr_video)
        real_lr_crop = self.crop_to_seq_length(real_lr_video)

        accum = self.D_grad_accum
        micro = self.total_batch // accum
        chunk = lambda x: x.reshape(accum, micro, *x.shape[1:])  # noqa: E731
        fake_lr_chunks = chunk(fake_lr_video)

        def micro_loss(params_D, fl, fh, rl, rh, key):
            kf, kr = jax.random.split(key)
            D_vars = dict(state.D, params=params_D)
            fake_logits = self.run_D(D_vars, kf, state.ada_p, fl, fh)
            real_logits = self.run_D(D_vars, kr, state.ada_p, rl, rh)
            loss = jnp.mean(jax.nn.softplus(fake_logits)) + jnp.mean(jax.nn.softplus(-real_logits))
            return loss, (fake_logits, real_logits)

        if self.remat:
            micro_loss = jax.checkpoint(micro_loss)

        def accum_step(carry, xs):
            # Fake hr frames are generated per micro-batch INSIDE the scan
            # (reference video_gan_sres.py:178-220 chunks the G forward) so
            # the full-batch fake video never materializes; w_avg / magnitude
            # EMAs update per chunk as in the reference loop.
            grads_acc, stats_acc, G_vars = carry
            fl_ctx, fl, rl, rh, key = xs
            k_gen_i, k_d = jax.random.split(key)
            fh, G_vars = self._hr_from_lr(G_vars, k_gen_i, fl_ctx, True)
            (loss, (flg, rlg)), grads = jax.value_and_grad(micro_loss, has_aux=True)(
                state.D["params"], fl, fh, rl, rh, k_d)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            stats_acc = {
                "loss/D_score_fake": stats_acc["loss/D_score_fake"] + stats_lib.moments(flg),
                "loss/D_score_real": stats_acc["loss/D_score_real"] + stats_lib.moments(rlg),
                "loss/D_sign_fake": stats_acc["loss/D_sign_fake"] + stats_lib.moments(jnp.sign(flg)),
                "loss/D_sign_real": stats_acc["loss/D_sign_real"] + stats_lib.moments(jnp.sign(rlg)),
                "loss/D_loss": stats_acc["loss/D_loss"] + stats_lib.scalar_moments(loss),
            }
            return (grads_acc, stats_acc, G_vars), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.D["params"])
        names = ("loss/D_score_fake", "loss/D_score_real", "loss/D_sign_fake",
                 "loss/D_sign_real", "loss/D_loss")
        zero_stats = {k: jnp.zeros(3) for k in names}
        keys = jax.random.split(k_steps, accum)
        (grads, stats, new_G), _ = jax.lax.scan(
            accum_step, (zero_grads, zero_stats, state.G),
            (fake_lr_chunks, chunk(fake_lr_crop), chunk(real_lr_crop),
             chunk(real_hr_video), keys),
            unroll=max(1, min(int(self.accum_unroll), accum)))
        state = state.replace(G=new_G)

        grads = scrub_grads(grads, gain=1.0 / accum)
        lrate = warmup_lrate(self.D_lrate, state.step, self.D_warmup_steps)
        new_params, new_opt = apply_updates(state.D["params"], grads, self.opt_D,
                                            state.opt_D, lrate)
        # Feed the ADA controller (reference collects loss/D_sign_real).
        state = state.replace(
            D=dict(state.D, params=new_params), opt_D=new_opt,
            sign_real_moments=state.sign_real_moments + stats["loss/D_sign_real"])
        stats["progress/D_lrate"] = stats_lib.scalar_moments(lrate)
        return state, stats

    # ------------------------------------------------------------------ R1

    def _update_r1(self, state: GANState, key: jax.Array, lr_video: jax.Array,
                   hr_video: jax.Array, gain: float = 1.0):
        assert self.r1_gamma is not None
        assert_shape(lr_video, (self.total_batch, self.channels, self.seq_length,
                                self.lr_height, self.lr_width))
        k_in, k_steps = jax.random.split(key)
        if self.in_augment is not None:
            lr_video = self.in_augment(k_in, lr_video, self.in_augment_p)

        accum = self.D_grad_accum
        micro = self.total_batch // accum
        chunk = lambda x: x.reshape(accum, micro, *x.shape[1:])  # noqa: E731

        def micro_loss(params_D, lr, hr, key):
            D_vars = dict(state.D, params=params_D)

            def d_sum(h):
                return jnp.sum(self.run_D(D_vars, key, state.ada_p, lr, h))

            r1_grads = jax.grad(d_sum)(hr)
            penalty = jnp.sum(jnp.square(r1_grads), axis=(1, 2, 3, 4))
            loss = jnp.mean(penalty * (self.r1_gamma / 2))
            return loss, penalty

        def accum_step(carry, xs):
            grads_acc, stats_acc = carry
            lr, hr, key = xs
            (loss, penalty), grads = jax.value_and_grad(micro_loss, has_aux=True)(
                state.D["params"], lr, hr, key)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            stats_acc = {
                "loss/r1_penalty": stats_acc["loss/r1_penalty"] + stats_lib.moments(penalty),
                "loss/r1_loss": stats_acc["loss/r1_loss"] + stats_lib.scalar_moments(loss),
            }
            return (grads_acc, stats_acc), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.D["params"])
        zero_stats = {k: jnp.zeros(3) for k in ("loss/r1_penalty", "loss/r1_loss")}
        keys = jax.random.split(k_steps, accum)
        (grads, stats), _ = jax.lax.scan(accum_step, (zero_grads, zero_stats),
                                         (chunk(lr_video), chunk(hr_video), keys),
                                         unroll=max(1, min(int(self.accum_unroll), accum)))

        grads = scrub_grads(grads, gain=gain / accum)
        lrate = warmup_lrate(self.D_lrate, state.step, self.D_warmup_steps)
        new_params, new_opt = apply_updates(state.D["params"], grads, self.opt_D,
                                            state.opt_D, lrate)
        return state.replace(D=dict(state.D, params=new_params), opt_D=new_opt), stats

    # ------------------------------------------------------------------ ADA

    def _update_ada(self, state: GANState, gain: float = 1.0):
        """Adjust ada_p toward the real-logit-sign target
        (reference video_gan_sres.py:256-266)."""
        if self.augment_real_sign_target is None:
            return state, {}
        count, total = state.sign_real_moments[0], state.sign_real_moments[1]
        mean_sign = jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)
        direction = jnp.sign(mean_sign - self.augment_real_sign_target)
        update = direction * self.augment_p_update_rate * gain
        new_p = jnp.clip(state.ada_p + update, 0.0, self.augment_p_max)
        new_p = jnp.where(count > 0, new_p, state.ada_p)
        state = state.replace(ada_p=new_p, sign_real_moments=jnp.zeros(3))
        return state, {"progress/augment_p": stats_lib.scalar_moments(new_p)}

    # ------------------------------------------------------------------ EMA

    def _update_G_ema(self, state: GANState):
        beta = ema_beta_schedule(state.step, self.G_ema_beta, self.G_ema_warmup_steps)
        new_ema = lerp_trees(state.G_ema, state.G, 1.0 - beta)
        return state.replace(G_ema=new_ema, step=state.step + 1)
