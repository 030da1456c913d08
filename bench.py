#!/usr/bin/env python
"""Benchmark: images/sec/chip for full progressive GAN training at 256×256.

Runs the fused train step (D update incl. R1 grad-of-grad + G update) at
scale 6 — the reference's default max resolution (depths
[512,512,512,512,256,128,64], configs.yaml:50) — with the reference batch
of 16 per chip, on whatever devices are visible.

Default recipe: lazy R1 at interval 16 (StyleGAN2 §5.1 cadence via
r1-leading dispatch windows), the convergence-proven beyond-parity TPU
recipe (BASELINE.md round-5; evidence/lazyr1_convergence.json).
`--r1_interval 1` measures the reference-parity every-step program.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (README.md:22-24 stub), so
the denominator is an analytical PyTorch-GPU estimate documented in
BASELINE.md: 45 images/sec/chip for the r1 step — deliberately generous
(the pass-exact count is 13.51 TFLOP/step at 256²/batch 16, more than a
torch-1.11-era V100 could sustain at that rate; BASELINE.md "Analytic
PyTorch-GPU denominator"). Other loss modes scale the denominator by
their model-FLOP ratio (same-workload comparison).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

PYTORCH_GPU_BASELINE_IMGS_PER_SEC = 45.0   # analytical; see BASELINE.md
PEAK_BF16_TFLOPS = {"v5e": 197.0, "v5litepod": 197.0,
                    "tpuv5lite": 197.0}  # device_kind 'TPU v5 lite'


def step_model_tflops(depths, scale: int, batch: int, latent_dim: int = 512,
                      loss_mode: str = "r1", r1_interval: int = 1) -> float:
    """Algorithmic (dense-conv) TFLOPs of one fused D+G train step.

    Model-FLOPs convention: counts the reference formulation's MACs×2 —
    structural fusions that EXECUTE fewer MACs (the dilated upscale-conv,
    the packed top level) still count at the dense rate, so MFU is
    comparable across rounds.

    Pass multipliers — explicit unit system (round-3 refinement, see
    BASELINE.md "Pass accounting"): one D or G forward = 1; an
    input-grad-only backward = 1 (one transposed conv per layer); a
    parameter backward = 2 (dX chain + dW contraction per layer).
      G (both modes): z1 fwd + z2 fwd + θ-bwd(2) ............. = 4
      D r1:    real fwd 1 + inner ∇x 1 + outer reverse over the
               [fwd,∇x] chain 2×2=4 + fake fwd 1 + fake θ-bwd 2
               + G-phase fwd 1 + G-phase input-bwd 1 ......... = 11
      D wgangp: real⊕fake 2B fwd 2 + their θ-bwd 4 + interp
               fwd 1 + inner ∇x 1 + outer reverse 4
               + G-phase fwd+input-bwd 2 ..................... = 14
    The 14/11 D ratio PREDICTS the measured step-time ratio to ~1.5%
    (r1 117 ms vs wgangp 142.6 ms at 256²) — the extra GP work is
    structural, not scheduling waste. (Round 2 used D=10 for both modes;
    the refinement raises r1 model FLOPs ~7% and gives wgangp its own
    multiplier — BASELINE.md records both vintages.)
    """
    def conv(res, k, cin, cout):
        return 2.0 * batch * res * res * k * k * cin * cout

    d = list(depths)
    g = 2.0 * batch * latent_dim * 16 * d[0] + conv(4, 3, d[0], d[0])
    for i in range(1, scale + 1):
        res = 2 ** (i + 2)
        g += conv(res, 3, d[i - 1], d[i]) + conv(res, 3, d[i], d[i])
    r = 2 ** (scale + 2)
    g += conv(r, 1, d[scale], 3)
    if scale >= 1:
        g += conv(r // 2, 1, d[scale - 1], 3)

    dd = conv(r, 1, 3, d[scale])
    if scale >= 1:
        dd += conv(r // 2, 1, 3, d[scale - 1])
    for i in range(scale, 0, -1):
        res = 2 ** (i + 2)
        dd += conv(res, 3, d[i], d[i]) + conv(res, 3, d[i], d[i - 1])
    dd += conv(4, 3, d[0] + 1, d[0]) + 2.0 * batch * (16 * d[0] * d[0] + d[0])
    if loss_mode == "wgangp":
        d_mult = 14.0
    elif r1_interval > 1:
        # Lazy R1 (r1-leading windows): the lead step pays the full 11
        # units, the interval-1 plain steps drop the inner ∇x (1) and the
        # outer reverse over the [fwd, ∇x] chain (4) but pay the plain
        # real θ-bwd (2): 11 - 5 + 2 = 8 units. Executed average — lazy
        # is an ALGORITHMIC saving (fewer passes), not a structural
        # fusion, so MFU must count what actually runs.
        d_mult = (11.0 + (r1_interval - 1) * 8.0) / r1_interval
    else:
        d_mult = 11.0
    return (4.0 * g + d_mult * dd) / 1e12


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", type=int, default=6)      # 256×256
    parser.add_argument("--batch_per_chip", type=int, default=16)
    parser.add_argument("--steps", type=int, default=60)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--compute_dtype", default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--loss_mode", default="r1", choices=["r1", "wgangp"])
    parser.add_argument("--r1_interval", type=int, default=16,
                        help="lazy-R1 cadence (StyleGAN2 §5.1); the default "
                             "16 is the shipped beyond-parity recipe, "
                             "convergence-proven at equal seeds "
                             "(evidence/lazyr1_convergence.json); 1 = "
                             "reference every-step parity")
    parser.add_argument("--alpha", type=float, default=0.7)
    parser.add_argument("--platform", default=None,
                        help="pin the jax platform (e.g. cpu for smoke "
                             "tests); env vars are latched over at "
                             "interpreter startup on this image")
    parser.add_argument("--device_timeout", type=float, default=900.0,
                        help="fail fast (one diagnostic JSON line, rc 1) if "
                             "the device hasn't answered within this many "
                             "seconds — the axon service has had >1 h "
                             "outages during which any device op hangs "
                             "forever (verify skill); normal init+compile "
                             "is well under 2 min warm")
    ns = parser.parse_args(argv)

    # Watchdog: armed until the first full device round-trip (end of
    # warmup). A hung bench tells the driver nothing; a diagnostic line
    # does.
    import os
    import threading
    _live = {"ok": False}

    def _watchdog():
        if not _live["ok"]:
            print(json.dumps({
                "metric": "images/sec/chip, progressive train step",
                "value": None, "unit": "images/sec/chip",
                "error": f"no device response within {ns.device_timeout:.0f}s"
                         " — remote device service outage (see verify"
                         " skill); bench aborted rather than hanging",
            }))
            sys.stdout.flush()
            os._exit(1)

    if ns.device_timeout > 0:
        _timer = threading.Timer(ns.device_timeout, _watchdog)
        _timer.daemon = True
        _timer.start()

    import jax
    if ns.platform:
        jax.config.update("jax_platforms", ns.platform)
    import jax.numpy as jnp

    # Persistent compilation cache: the per-scale fused step compiles once
    # per (scale, shape) ever, not once per process.
    from pggan_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from pggan_tpu.config import Config
    from pggan_tpu.models import (init_discriminator_params,
                                  init_generator_params)
    from pggan_tpu.parallel import create_mesh, replicate, shard_batch
    from pggan_tpu.train.step import (init_train_state,
                                      make_chunked_train_step,
                                      make_optimizers, make_train_step)

    from pggan_tpu.config import default_depths
    depths = default_depths(ns.scale)
    scale = ns.scale
    res = 2 ** (scale + 2)
    devices = jax.devices()
    n_chips = len(devices)
    batch = ns.batch_per_chip * n_chips

    print(f"[bench] {n_chips} device(s) ({devices[0].platform}), scale {scale} "
          f"({res}x{res}), global batch {batch}, {ns.compute_dtype}, "
          f"{ns.loss_mode}", file=sys.stderr)

    cfg = Config({
        "depths": depths, "latent_dim": 512,
        "compute_dtype": ns.compute_dtype, "loss_mode": ns.loss_mode,
        "r1_interval": ns.r1_interval, "donate_buffers": True,
    })
    t_init = time.time()
    opt_g, opt_d = make_optimizers(cfg)

    @jax.jit
    def _init(rng):
        kg, kd, ks = jax.random.split(rng, 3)
        params_G = init_generator_params(kg, latent_dim=512, depths=depths, scale=scale)
        params_D = init_discriminator_params(kd, depths=depths, scale=scale)
        return init_train_state(ks, params_G, params_D, opt_g, opt_d)

    state = _init(jax.random.PRNGKey(0))
    jax.block_until_ready(state)
    print(f"[bench] param init {time.time()-t_init:.1f}s", file=sys.stderr)

    mesh = create_mesh(devices=devices)
    state = replicate(state, mesh)
    imgs = np.random.RandomState(0).randint(
        0, 256, (batch, res, res, 3), dtype=np.uint8)
    imgs = shard_batch(imgs, mesh)
    alpha = jnp.float32(ns.alpha)

    lazy = ns.r1_interval > 1 and ns.loss_mode == "r1"
    if lazy:
        # Lazy R1's PRODUCTION form: r1-leading dispatch windows (one
        # compiled program = penalty sub-step ×interval weight + an
        # (interval-1)-step plain lax.scan tail — trainer._chunk_window).
        # The runtime-lax.cond alternative was measured SLOWER than
        # every-step R1 (grad-of-cond union residuals; make_train_step
        # docstring), so benching it would measure a non-production path.
        window = make_chunked_train_step(cfg, scale, opt_g, opt_d,
                                         ns.r1_interval, r1_leading=True)
        win_batches = [imgs] * ns.r1_interval

        def run(state, i):
            return window(state, win_batches, alpha)
    else:
        step = make_train_step(cfg, scale, opt_g, opt_d)

        def run(state, i):
            return step(state, imgs, alpha)

    # NOTE: sync via device_get of a metric, NOT block_until_ready — on
    # tunneled backends the ready-signal can resolve before the execution
    # queue drains, and a host transfer is the only reliable barrier.
    # In lazy mode one dispatch = r1_interval train steps; keep the
    # measured wall-clock comparable by dispatching ~ns.steps total steps.
    n_dispatch = max(ns.steps // ns.r1_interval, 4) if lazy else ns.steps
    steps_per_dispatch = ns.r1_interval if lazy else 1

    t0 = time.time()
    for i in range(max(ns.warmup // steps_per_dispatch, 1)):
        state, metrics, _ = run(state, i)
    print(f"[bench] warmup+compile {time.time()-t0:.1f}s; "
          f"L_D={float(jax.device_get(metrics['L_D'])):.3f}", file=sys.stderr)
    _live["ok"] = True          # device answered end-to-end; disarm watchdog

    t0 = time.time()
    for i in range(n_dispatch):
        state, metrics, _ = run(state, i)
    final_loss = float(jax.device_get(metrics["L_D"]))   # full-chain barrier
    elapsed = time.time() - t0
    assert np.isfinite(final_loss)

    n_exec_steps = n_dispatch * steps_per_dispatch
    imgs_per_sec = batch * n_exec_steps / elapsed
    per_chip = imgs_per_sec / n_chips
    tflops_per_step = step_model_tflops(depths, scale, ns.batch_per_chip,
                                        loss_mode=ns.loss_mode,
                                        r1_interval=ns.r1_interval)
    # vs_baseline is a SAME-WORKLOAD comparison: the analytic PyTorch-GPU
    # denominator (BASELINE.md) was calibrated for the r1 step; wgangp
    # runs strictly more model FLOPs per image (D 14 vs 11 pass units),
    # so its denominator scales by the model-FLOP ratio — the reference
    # GPU would pay the same extra passes. Lazy R1 does NOT scale the
    # denominator: the reference implements only every-step R1
    # (lib/loss.py:125-135), so its time to equal quality is the
    # every-step rate; the lazy multiplier is an equal-quality-recipe
    # comparison and is only quotable WITH the convergence evidence
    # (BASELINE.md round-5 lazy-R1 section).
    denom_tflops = step_model_tflops(depths, scale, ns.batch_per_chip,
                                     loss_mode=ns.loss_mode)
    r1_tflops = step_model_tflops(depths, scale, ns.batch_per_chip,
                                  loss_mode="r1")
    baseline_imgs_per_sec = (PYTORCH_GPU_BASELINE_IMGS_PER_SEC
                             * r1_tflops / denom_tflops)
    step_s = elapsed / n_exec_steps
    kind = devices[0].device_kind.lower().replace(" ", "")
    peak = next((v for k, v in PEAK_BF16_TFLOPS.items() if k in kind), None)
    # MFU only when the peak is meaningful: a known TPU kind running bf16.
    # (CPU runs / unknown chips / f32 against a bf16 peak would report a
    # made-up utilization that then reads as a real number in BASELINE.md.)
    mfu = (tflops_per_step / step_s / peak
           if peak is not None and ns.compute_dtype == "bfloat16" else None)
    mode = ns.loss_mode + (f" lazy-R1/{ns.r1_interval}" if lazy else "")
    result = {
        "metric": f"images/sec/chip, {res}x{res} progressive train step "
                  f"(fused D+G, {mode}, {ns.compute_dtype})",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / baseline_imgs_per_sec, 2),
        "mfu": round(mfu, 3) if mfu is not None else None,
        "model_tflops_per_step": round(tflops_per_step, 2),
    }
    if lazy:
        # The multiplier above keeps the reference's every-step rate as
        # its denominator; it is quotable only together with the
        # equal-quality evidence (BASELINE.md round-5 lazy-R1 section).
        result["recipe"] = (f"lazy-R1/{ns.r1_interval} "
                            "(equal-quality-proven: "
                            "evidence/lazyr1_convergence.json; parity "
                            "measurement: --r1_interval 1)")
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
