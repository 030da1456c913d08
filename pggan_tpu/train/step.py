"""The fused PGGAN train step: D update then G update in ONE jitted graph.

Semantics mirror `ProgressiveGAN.train_step` (`pggan/model.py:206-255`):

  1. real fade-in at scale > 0: avgpool ×2 → nearest-up ×2 →
     (1-α)·low + α·real (`pggan/model.py:217-221`)
  2. D phase: pred_real = D(real·faded); fake = stop_grad(G(z₁));
     pred_fake = D(fake); loss_D per loss mode; Adam step on D
  3. G phase (against the **updated** D, as in the reference where
     opt_D.step() precedes the G forward): fake₂ = G(z₂);
     loss_G = W_adv · BCE(D(fake₂), 1); Adam step on G

TPU-native design: the whole iteration — both grad computations including
the R1/GP grad-of-grad, both optimizer updates, and the latent sampling —
is one XLA program per scale. `alpha` is a traced scalar (fade-in never
recompiles); `scale_index` is Python-static (one compiled program per
scale, swapped at scale jumps — the static-graph replacement for the
reference's dynamic `add_block` module mutation).

Under a multi-device mesh the same jitted function runs SPMD: the batch is
sharded on the `data` axis, parameters are replicated, and XLA inserts the
gradient all-reduce — the *correct* data parallelism the reference's DDP
wrap silently dropped (`lib/model.py:78-79` takes `.module`).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pggan_tpu.losses.gan import (
    bce_with_logits,
    drift_loss,
    generator_loss,
    gradient_penalty,
)
from pggan_tpu.models.discriminator import discriminator_apply
from pggan_tpu.models.generator import generator_apply
from pggan_tpu.ops.basic import blend, downscale2d, upscale2d


class TrainState(NamedTuple):
    params_G: Any
    params_D: Any
    opt_state_G: Any
    opt_state_D: Any
    rng: jax.Array
    # Exponential moving average of params_G (the PGGAN paper's G
    # smoothing for eval — Karras et al. 2018 §A.1; the reference omits
    # it). None (an EMPTY pytree node, zero leaves) when disabled, so
    # pre-existing checkpoints and programs are structurally unchanged.
    params_G_ema: Any = None


def make_optimizers(cfg) -> Tuple[optax.GradientTransformation,
                                  optax.GradientTransformation]:
    """Adam pair with the reference hyperparameters
    (`lib/model.py:95-97`, configs.yaml: lr_G=1e-4, lr_D=1e-5, β=(0,0.99)).
    Fresh optimizer state is created at every scale jump, matching
    `reset_solver` (`pggan/model.py:131-139`)."""
    opt_g = optax.adam(cfg.lr_G, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.adam_eps)
    opt_d = optax.adam(cfg.lr_D, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.adam_eps)
    return opt_g, opt_d


def init_train_state(rng: jax.Array, params_G, params_D,
                     opt_g: optax.GradientTransformation,
                     opt_d: optax.GradientTransformation,
                     params_G_ema=None, *, ema: bool = False) -> TrainState:
    """`ema=True` seeds params_G_ema as a COPY of params_G (fresh buffers —
    aliased leaves would be double-donated under donate_argnums);
    `params_G_ema` passes through an existing average (scale jumps)."""
    if ema and params_G_ema is None:
        params_G_ema = jax.tree.map(jnp.copy, params_G)
    return TrainState(
        params_G=params_G,
        params_D=params_D,
        opt_state_G=opt_g.init(params_G),
        opt_state_D=opt_d.init(params_D),
        rng=rng,
        params_G_ema=params_G_ema,
    )


def _normalize_images(img: jax.Array) -> jax.Array:
    """uint8 [0,255] → float32 [-1,1] on device (ToTensor+Normalize(.5,.5),
    `lib/dataset.py:108-111`, moved device-side to cut host→HBM traffic 4×)."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 127.5 - 1.0
    return img.astype(jnp.float32)


def resolve_hires_pack(cfg, scale_index: int) -> int:
    """Number of TOP levels G and D run in the space-to-depth packed
    representation (ops/packed.py) — the fix for XLA's layout-copy
    pathology at huge-spatial × tiny-channel shapes, which ate 41% of
    the 1024² step (BASELINE.md). 'auto' packs every consecutive top
    level whose resolution is ≥ 512 AND whose depth is ≤ 64 (scale 8
    default table → 2 levels: 1024²/d16 and 512²/d32). True ≡ 1 level;
    an int forces that many; False/0 disables. Capped at scale."""
    hp_cfg = cfg["hires_pack"] if "hires_pack" in cfg else "auto"
    if hp_cfg is True:
        return 1 if scale_index >= 1 else 0
    if hp_cfg == "auto":
        depths_list = list(cfg.depths)
        n = 0
        for s in range(scale_index, 0, -1):
            if 2 ** (s + 2) >= 512 and int(depths_list[s]) <= 64:
                n += 1
            else:
                break
        return n
    return min(int(hp_cfg), scale_index) if hp_cfg else 0


def _compiler_options(cfg):
    """Optional per-program XLA compiler options (`compiler_options:` in
    the YAML config, a {flag_name: value-string} map, e.g.
    `xla_tpu_scoped_vmem_limit_kib: "65536"`).

    This is the ONLY route to TPU compiler knobs in this environment:
    the local jaxlib's XLA_FLAGS registry carries none of the TPU
    backend flags (compilation happens on a remote service — setting
    `XLA_FLAGS=--xla_tpu_...` aborts the process with "Unknown flags"),
    while `jax.jit(compiler_options=...)` ships the map inside the
    compile request where the REMOTE compiler validates and applies it
    (probed: bogus keys are rejected server-side). Default None =
    XLA's own choices, which BASELINE.md's flag-probe table shows are
    already optimal for this program family."""
    co = cfg["compiler_options"] if "compiler_options" in cfg else None
    if not co:
        return None

    def norm(v):
        # XLA's option parser takes Python bools or "True"/"False"
        # (capitalized) but rejects "true"/"false"/ints — normalize so
        # YAML bools and CLI strings both work.
        if isinstance(v, bool):
            return v
        s = str(v)
        if s.lower() in ("true", "false"):
            return s.lower() == "true"
        return s

    return {str(k): norm(v) for k, v in dict(co).items()}


def make_train_step(cfg, scale_index: int,
                    opt_g: optax.GradientTransformation,
                    opt_d: optax.GradientTransformation,
                    *, jit: bool = True, include_r1: Optional[bool] = None,
                    r1_scale: Optional[float] = None):
    """Build the fused step for one progressive scale.

    Returns step(state, img_real, alpha) -> (state, metrics, images) where
    `images = (img_real_faded, img_fake)` feeds the periodic sample grid
    (`train.py:56-57` in the reference).

    `include_r1` (loss_mode='r1' only): None (default) → the penalty is
    computed per the lazy-R1 cadence; with r1_interval == 1 that is every
    step (reference parity) and the graph contains no conditional. With
    r1_interval > 1 the step takes an extra traced boolean `apply_r1` and
    branches via `lax.cond` INSIDE one compiled program (one executable
    per scale — switching between two large executables per step proved
    fragile on remote-compile backends). True/False instead build the two
    branch programs statically (the alternative two-executable scheme):
    the forced-True program KEEPS the ×r1_interval lazy-cadence scaling
    because it is meant to run only on the 1-in-interval penalty steps —
    it is the static twin of the cond's r1 branch, NOT an every-step-R1
    config (that is r1_interval=1). Equivalence with the cond branches is
    tested (tests/test_train_step.py).

    MEASURED (round 5, v5e, 256², batch 16): the cond program is a dead
    end for PERFORMANCE — 128.4 img/s at interval 16 and 128.3 on pure
    skip steps vs 136.75 for the every-step parity program. Grad-of-cond
    gives both branches the UNION of their residual signatures, so the
    skip branch materializes (zero-filled) r1-branch residuals and saves
    nothing, while the conditional boundary itself costs ~6%. Production
    lazy R1 therefore runs through `make_chunked_train_step(...,
    r1_leading=True)` — the cadence is STRUCTURAL (sub-step 0 applies the
    penalty, the scanned tail doesn't; no runtime conditional), one
    program per (scale, window length). The cond path stays as the
    exact-`global_step % interval` semantics reference and for tests.

    `r1_scale`: penalty multiplier override for the include_r1=True
    static program (lazy windows scale by the ACTUAL window length k, not
    the nominal interval, so truncated windows keep the time-average
    regularization weight exactly γ). None → r1_interval (the cond/static
    default).
    """
    latent_dim = int(cfg.latent_dim)
    slope = float(cfg.LReLU_slope)
    apply_pn = bool(cfg.apply_pixel_norm)
    apply_mbn = bool(cfg.apply_minibatch_norm)
    last_act = cfg.generator_last_activation
    w_adv = float(cfg.W_adv)
    w_gp = float(cfg.W_gp)
    w_drift = float(cfg.W_drift_D)
    loss_mode = str(cfg.loss_mode)
    r1_target = str(cfg["r1_target"]) if "r1_target" in cfg else "logits"
    # Lazy R1 (StyleGAN2 §5.1): compute the penalty every `r1_interval`
    # steps, scaled by the interval. Default 1 = reference parity (penalty
    # every step). The trainer passes `step_index` so the cadence is exact.
    r1_interval = int(cfg["r1_interval"]) if "r1_interval" in cfg else 1
    if include_r1 is None:
        lazy_r1 = loss_mode == "r1" and r1_interval > 1
        with_r1 = True
    else:
        lazy_r1 = False
        with_r1 = bool(include_r1)
    _r1_scale = float(r1_scale) if r1_scale is not None else float(r1_interval)
    impl = str(cfg.impl)
    if impl == "auto":      # resolve per backend (Pallas kernels are TPU-only)
        impl = "xla"
    compute_dtype = jnp.bfloat16 if str(cfg.compute_dtype) == "bfloat16" else jnp.float32
    fused_scale = cfg["fused_scale"] if "fused_scale" in cfg else "dilated"
    remat_cfg = cfg["remat"] if "remat" in cfg else "auto"
    # 'auto': with the dilated fusion + bf16 pooling, every default-table
    # scale (≤ 1024², batch ≤ 8) fits without remat and runs 15-30% faster
    # (see config.py); only beyond-table scales rematerialize by default.
    remat = (remat_cfg is True) or (remat_cfg == "auto" and scale_index >= 9)
    # G weight smoothing (PGGAN paper §A.1; 0.0 = off = reference parity).
    ema_decay = float(cfg["g_ema_decay"]) if "g_ema_decay" in cfg else 0.0
    hires_pack = resolve_hires_pack(cfg, scale_index)

    # With any packed level, the WHOLE step works on packed images
    # (ops/packed.py): the real fade, G's output, and D's input stay in
    # the [B, R/2, R/2, 12] domain — no per-consumer transpose round
    # trips, and the reference's fade ops on [B, R², 3] f32 tensors
    # (measured 11–46 GB/s in XLA's degenerate T(2,128) tilings at
    # 1024², ~15 ms/step) become channel-group ops. R1/GP penalties are
    # EXACT under this: a fixed permutation of image pixels preserves
    # ‖∇x‖² (sum over all coordinates).
    packed_imgs = hires_pack >= 1

    def g_apply(params, z, alpha):
        return generator_apply(
            params, z, alpha, slope=slope, apply_pixel_norm=apply_pn,
            last_activation=last_act, compute_dtype=compute_dtype, impl=impl,
            remat=remat, fused_scale=fused_scale, hires_pack=hires_pack,
            output_packed=packed_imgs)

    def d_apply(params, img, alpha):
        return discriminator_apply(
            params, img, alpha, slope=slope, apply_minibatch_norm=apply_mbn,
            compute_dtype=compute_dtype, impl=impl, remat=remat,
            hires_pack=hires_pack, input_packed=packed_imgs)

    def _step(state: TrainState, img_real: jax.Array, alpha: jax.Array,
              apply_r1):
        rng, k_z1, k_z2, k_eps = jax.random.split(state.rng, 4)
        batch = img_real.shape[0]
        alpha = jnp.asarray(alpha, jnp.float32)

        # ---- real fade-in (pggan/model.py:217-221) ----
        if packed_imgs:
            # pack FIRST (uint8 byte transpose), normalize packed — the
            # full-res f32 [B,R,R,3] tensor never exists; fade =
            # subpixel-group mean broadcast back (the avgpool window IS
            # the group), via the lane-slice/concat group ops (a 5-D
            # group reshape here cost ~7 ms/step of relayout copies at
            # 1024², trace audit round 3)
            from pggan_tpu.ops.packed import (downscale2d_packed,
                                              space_to_depth2,
                                              upscale2d_packed)
            img_real = _normalize_images(space_to_depth2(img_real))
            low = upscale2d_packed(downscale2d_packed(img_real))
            img_real = blend(low, img_real, alpha)
        elif scale_index > 0:
            img_real = _normalize_images(img_real)
            low = upscale2d(downscale2d(img_real, 2), 2)
            img_real = blend(low, img_real, alpha)
        else:
            img_real = _normalize_images(img_real)

        # ---- D phase ----
        z1 = jax.random.normal(k_z1, (batch, latent_dim), jnp.float32)
        img_fake = jax.lax.stop_gradient(g_apply(state.params_G, z1, alpha))
        eps = jax.random.uniform(k_eps, (batch,), jnp.float32)

        def d_loss_fn(params_D):
            d_fn = lambda im: d_apply(params_D, im, alpha)
            if loss_mode == "r1":
                # Measured design notes (v5e, 256², batch 16):
                #  * R1 path: real and fake forwards stay SEPARATE — batching
                #    them would drag the fake half through the inner
                #    value_and_grad's backward with zero cotangents
                #    (+1 wasted bwd-at-B ≫ the fwd batching gain;
                #    121 → 100 img/s when tried).
                #  * No-grad path (lazy-R1 off-steps): batching real+fake
                #    into one 2B forward is pure win. Legal only when
                #    B % 4 == 0 so minibatch-stddev subgroups never straddle
                #    the real/fake boundary (lib/blocks.py:204-233).
                fuse_plain = (batch % 4 == 0) or not apply_mbn

                def f_real(im):
                    pred_r = d_fn(im)
                    if r1_target == "logits":
                        f = jnp.sum(pred_r.astype(jnp.float32))
                    else:  # 'loss': the reference's literal call site
                        f = bce_with_logits(pred_r, 1)
                    return f, pred_r

                def r1_branch(im):
                    (_, pred_r), grad_im = jax.value_and_grad(
                        f_real, has_aux=True)(im)
                    grad_im = grad_im.astype(jnp.float32)
                    per_sample = jnp.sum(
                        jnp.square(grad_im).reshape(grad_im.shape[0], -1), axis=1)
                    preds = (pred_r, d_fn(img_fake))
                    return preds, 0.5 * jnp.mean(per_sample) * _r1_scale

                def plain_branch(im):
                    if fuse_plain:
                        pred = d_fn(jnp.concatenate([im, img_fake], axis=0))
                        preds = (pred[:batch], pred[batch:])
                    else:
                        preds = (d_fn(im), d_fn(img_fake))
                    return preds, jnp.float32(0.0)

                if lazy_r1:
                    (pred_real, pred_fake), reg = jax.lax.cond(
                        apply_r1, r1_branch, plain_branch, img_real)
                elif with_r1:
                    (pred_real, pred_fake), reg = r1_branch(img_real)
                else:
                    (pred_real, pred_fake), reg = plain_branch(img_real)

                l_real = bce_with_logits(pred_real, 1)
                l_fake = bce_with_logits(pred_fake, 0)
                loss = l_real + l_fake + reg
                metrics = {"L_D_real": l_real, "L_D_fake": l_fake,
                           "L_D_r1": reg, "L_D": loss}
                return loss, metrics

            if loss_mode != "wgangp":
                raise ValueError(f"unknown loss mode {loss_mode!r}")
            # Unlike the R1 path, NEITHER of these forwards sits inside an
            # inner grad — both halves carry real cotangents in the single
            # params backward — so batching real+fake through one 2B
            # forward is a pure fusion win (same FLOPs, one pipelined
            # conv chain instead of two). Legal when B % 4 == 0 so
            # minibatch-stddev subgroups never straddle the real/fake
            # boundary (lib/blocks.py:204-233). The GP interp forward
            # stays SEPARATE: its inner ∇x would drag batched halves
            # through the inner backward with zero cotangents (the
            # measured R1 lesson, BASELINE.md).
            if (batch % 4 == 0) or not apply_mbn:
                pred = d_fn(jnp.concatenate([img_real, img_fake], axis=0))
                pred_real, pred_fake = pred[:batch], pred[batch:]
            else:
                pred_real = d_fn(img_real)
                pred_fake = d_fn(img_fake)
            l_real = bce_with_logits(pred_real, 1)
            l_fake = bce_with_logits(pred_fake, 0)
            gp = gradient_penalty(d_fn, img_real, img_fake, eps, w_gp) if w_gp else 0.0
            drift = drift_loss(pred_real, w_drift) if w_drift else 0.0
            loss = l_real + l_fake + gp + drift
            metrics = {"L_D_real": l_real, "L_D_fake": l_fake,
                       "L_D_gp": gp, "L_D_eps": drift, "L_D": loss}
            return loss, metrics

        (loss_d, metrics_d), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.params_D)
        updates_d, opt_state_D = opt_d.update(grads_d, state.opt_state_D, state.params_D)
        params_D = optax.apply_updates(state.params_D, updates_d)

        # ---- G phase (uses updated D) ----
        z2 = jax.random.normal(k_z2, (batch, latent_dim), jnp.float32)

        def g_loss_fn(params_G):
            fake2 = g_apply(params_G, z2, alpha)
            pred_fake2 = d_apply(params_D, fake2, alpha)
            loss = generator_loss(pred_fake2, w_adv)
            return loss, fake2

        (loss_g, img_fake2), grads_g = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params_G)
        updates_g, opt_state_G = opt_g.update(grads_g, state.opt_state_G, state.params_G)
        params_G = optax.apply_updates(state.params_G, updates_g)

        metrics = dict(metrics_d)
        metrics["L_G"] = loss_g
        if ema_decay > 0.0 and state.params_G_ema is not None:
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
                state.params_G_ema, params_G)
        else:
            ema = state.params_G_ema
        new_state = TrainState(params_G, params_D, opt_state_G, opt_state_D,
                               rng, ema)
        # when packed_imgs, the sample-grid outputs stay PACKED
        # [B,R/2,R/2,12]: the trainer unpacks on the rare image_cycle
        # steps — unpacking here cost ~14 ms of d2s transposes on EVERY
        # step for images that are read once per thousand (trace audit r3)
        images = (img_real, img_fake2.astype(jnp.float32))
        return new_state, metrics, images

    if lazy_r1:
        def step(state, img_real, alpha, apply_r1):
            return _step(state, img_real, alpha, jnp.asarray(apply_r1, bool))
    else:
        def step(state, img_real, alpha):
            return _step(state, img_real, alpha, None)

    if jit:
        donate = (0,) if cfg.donate_buffers else ()
        return jax.jit(step, donate_argnums=donate,
                       compiler_options=_compiler_options(cfg))
    return step


def make_chunked_train_step(cfg, scale_index: int,
                            opt_g: optax.GradientTransformation,
                            opt_d: optax.GradientTransformation,
                            n_steps: int, *, jit: bool = True,
                            r1_leading: bool = False):
    """`n_steps` fused iterations in ONE dispatched XLA program
    (`lax.scan` over stacked batches) — the in-graph training loop.

    Every per-step dispatch costs a host→device round trip; on a
    remotely-attached TPU that is ~30 ms — larger than the entire device
    step below 128² (BASELINE.md: 16² runs 5.7 ms on-device but ~47 ms
    end-to-end). Chunking amortizes the round trip, the per-step Python,
    and the metric-future bookkeeping across `n_steps` steps. The trainer
    engages it only inside event-free schedule windows (no alpha/scale
    jump, no log/image/FID/checkpoint boundary — trainer._chunk_window),
    so `alpha` is a compile-visible constant-per-call traced scalar and
    every host-visible side effect still happens at exactly the reference
    step (`train.py:39-66` semantics are unchanged; the chunk is pure
    state evolution between host actions).

    Signature: chunk(state, [batch₀..batch_{k-1}], alpha) →
    (state, metrics_of_last_step, images_of_last_step) — identical math
    to `n_steps` sequential `make_train_step` calls (the same `_step`
    body scans over the batch stack; RNG threads through `state.rng`
    exactly as in single-step execution; equivalence is tested).

    `r1_leading=True` — the PRODUCTION lazy-R1 path (StyleGAN2 §5.1
    cadence, arXiv:1912.04958): sub-step 0 runs the include_r1=True
    static program with the penalty scaled by the ACTUAL window length
    `n_steps` (time-average regularization weight stays exactly γ even
    for boundary-truncated windows), sub-steps 1..k-1 run the
    include_r1=False program under `lax.scan`. The cadence is STRUCTURAL:
    no runtime conditional, so the plain sub-steps genuinely skip the
    grad-of-grad work (the cond alternative was measured to skip nothing
    — see make_train_step). Each distinct window length is its own
    executable with a distinct input signature ([k,B,H,W,C] batch stack),
    which also side-steps the remote-compile-service hazard around
    same-signature/different-HLO programs (verify skill).

    Plain mode (`r1_leading=False`) is unavailable with lazy R1
    (`r1_interval > 1`): a penalty-free window would break the cadence —
    the trainer routes lazy runs through r1_leading windows instead.
    """
    if n_steps < 2:
        raise ValueError("chunked step needs n_steps >= 2 (use "
                         "make_train_step for single steps)")
    r1_interval = int(cfg["r1_interval"]) if "r1_interval" in cfg else 1
    lazy = str(cfg.loss_mode) == "r1" and r1_interval > 1
    if r1_leading and not lazy:
        raise ValueError("r1_leading windows need loss_mode='r1' with "
                         "r1_interval > 1")
    if lazy and not r1_leading:
        raise ValueError("steps_per_dispatch > 1 requires r1_interval == 1 "
                         "(lazy R1 runs through r1_leading windows)")
    if r1_leading:
        lead = make_train_step(cfg, scale_index, opt_g, opt_d, jit=False,
                               include_r1=True, r1_scale=float(n_steps))
        base = make_train_step(cfg, scale_index, opt_g, opt_d, jit=False,
                               include_r1=False)
    else:
        lead = None
        base = make_train_step(cfg, scale_index, opt_g, opt_d, jit=False)

    def chunk(state: TrainState, batches, alpha: jax.Array):
        imgs = jnp.stack(list(batches))          # [k, B, H, W, C]

        def body(carry, img):
            new_state, _metrics, _images = base(carry, img, alpha)
            return new_state, None

        # scan the first k-1 steps (metrics/images discarded — no host
        # action reads them mid-chunk), then run the last step outside the
        # scan so its metrics/images return WITHOUT stacking k full-size
        # image tensors.
        if lead is not None:
            state, m0, _ = lead(state, imgs[0], alpha)
            state, _ = jax.lax.scan(body, state, imgs[1:-1])
            state, metrics, images = base(state, imgs[-1], alpha)
            # the window's ONLY penalty evaluation is sub-step 0; surface
            # it instead of the tail's structural zero
            metrics = dict(metrics)
            metrics["L_D_r1"] = m0["L_D_r1"]
            return state, metrics, images
        state, _ = jax.lax.scan(body, state, imgs[:-1])
        return base(state, imgs[-1], alpha)

    if jit:
        donate = (0,) if cfg.donate_buffers else ()
        return jax.jit(chunk, donate_argnums=donate,
                       compiler_options=_compiler_options(cfg))
    return chunk


def resolve_steps_per_dispatch(cfg, scale_index: int) -> int:
    """Chunk length for `steps_per_dispatch`. 1 disables. 'auto' enables
    chunking where the per-step dispatch round trip rivals the device
    step — resolutions ≤ 128² at the default depth table (device steps
    ≤ ~60 ms vs a ~30 ms round trip on a remotely-attached chip;
    measured table in BASELINE.md) — and stays at per-step dispatch
    above, where the step itself dominates."""
    v = cfg["steps_per_dispatch"] if "steps_per_dispatch" in cfg else 1
    if v == "auto":
        res = 2 ** (scale_index + 2)
        return 8 if res <= 128 else 1
    n = int(v)
    if n < 1:
        raise ValueError(f"steps_per_dispatch must be >= 1, got {n}")
    return n
