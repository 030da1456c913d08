"""Profile the fused train step at a given scale; optional XProf trace.

Usage: python tools/profile_scale.py --scale 8 --batch 4 --logdir /tmp/xprof
Run from the repo root (or anywhere: the repo root is put on sys.path).
Inspect the trace in TensorBoard/Perfetto; the per-fusion numbers feed
BASELINE.md speed-of-light audits.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse, time
import numpy as np

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--trace_steps", type=int, default=3,
                    help="0 skips the XProf trace entirely")
    ap.add_argument("--logdir", default="/tmp/xprof_s8")
    ap.add_argument("--json", action="store_true",
                    help="print one machine-readable JSON line to stdout "
                         "(probe drivers parse this)")
    def _kv(s):
        if "=" not in s:
            raise argparse.ArgumentTypeError(
                f"--compiler_option needs FLAG=VALUE, got {s!r}")
        return s
    ap.add_argument("--compiler_option", action="append", default=[],
                    metavar="FLAG=VALUE", type=_kv,
                    help="XLA compiler option for the step program, e.g. "
                         "xla_tpu_scoped_vmem_limit_kib=65536 (repeatable; "
                         "applied remotely via jit compiler_options — local "
                         "XLA_FLAGS cannot reach the TPU compiler here)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--loss_mode", default="r1", choices=["r1", "wgangp"])
    ap.add_argument("--hires_pack", default="auto",
                    help="auto | on | off | <int> (force N packed levels)")
    ns = ap.parse_args()

    compiler_options = dict(kv.split("=", 1) for kv in ns.compiler_option)

    import jax, jax.numpy as jnp
    from pggan_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from pggan_tpu.config import Config
    from pggan_tpu.models import init_discriminator_params, init_generator_params
    from pggan_tpu.parallel import create_mesh, replicate, shard_batch
    from pggan_tpu.train.step import init_train_state, make_optimizers, make_train_step

    from pggan_tpu.config import default_depths
    depths = default_depths(ns.scale)
    res = 2 ** (ns.scale + 2)
    cfg = Config({"depths": depths, "latent_dim": 512,
                  "compute_dtype": "bfloat16", "loss_mode": ns.loss_mode,
                  "donate_buffers": True,
                  "hires_pack": {"auto": "auto", "on": True,
                                 "off": False}.get(
                                     ns.hires_pack,
                                     ns.hires_pack if not str(
                                         ns.hires_pack).lstrip("-").isdigit()
                                     else int(ns.hires_pack)),
                  "remat": True if ns.remat else "auto",
                  "compiler_options": compiler_options})
    opt_g, opt_d = make_optimizers(cfg)

    @jax.jit
    def _init(rng):
        kg, kd, ks = jax.random.split(rng, 3)
        pG = init_generator_params(kg, latent_dim=512, depths=depths, scale=ns.scale)
        pD = init_discriminator_params(kd, depths=depths, scale=ns.scale)
        return init_train_state(ks, pG, pD, opt_g, opt_d)

    state = _init(jax.random.PRNGKey(0))
    jax.block_until_ready(state)
    mesh = create_mesh(devices=jax.devices())
    state = replicate(state, mesh)
    imgs = shard_batch(np.random.RandomState(0).randint(
        0, 256, (ns.batch, res, res, 3), dtype=np.uint8), mesh)
    alpha = jnp.float32(0.7)
    step = make_train_step(cfg, ns.scale, opt_g, opt_d)

    t0 = time.time()
    for _ in range(3):
        state, metrics, _ = step(state, imgs, alpha)
    print("warmup+compile", round(time.time()-t0,1), "s",
          "L_D", float(jax.device_get(metrics["L_D"])), file=sys.stderr)

    t0 = time.time()
    for _ in range(ns.steps):
        state, metrics, _ = step(state, imgs, alpha)
    _ = float(jax.device_get(metrics["L_D"]))
    dt = (time.time()-t0)/ns.steps
    print(f"steady: {dt*1000:.1f} ms/step, {ns.batch/dt:.2f} img/s", file=sys.stderr)

    if ns.trace_steps > 0:
        with jax.profiler.trace(ns.logdir):
            for _ in range(ns.trace_steps):
                state, metrics, _ = step(state, imgs, alpha)
            _ = float(jax.device_get(metrics["L_D"]))
        print("trace written to", ns.logdir, file=sys.stderr)

    if ns.json:
        import json
        print(json.dumps({
            "scale": ns.scale, "batch": ns.batch, "loss_mode": ns.loss_mode,
            "step_ms": round(dt * 1000, 2),
            "img_s": round(ns.batch / dt, 2),
            "compiler_options": compiler_options,
        }), flush=True)

if __name__ == "__main__":
    main()
