#!/usr/bin/env python
"""Sample images from a trained generator.

The reference ships a broken demo (`demo.py:21` imports the non-existent
`pggan.options`); this implements its evident intent (`demo.py:23-68`):
build G at the checkpoint's scale, load weights with a strict key-set
check, sample `n_samples` latents, denormalize ×0.5+0.5 → [0,255], write
JPEGs named result_{i}.jpg.

    python demo.py --ckpt_id my_run [--ckpt_step 30000] [--n_samples 16]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from pggan_tpu.config import Config


def load_generator(cfg, *, ema: bool = False):
    """Rebuild G at the checkpointed scale and strictly load weights.
    `ema=True` loads the smoothed weights (`Gema`, written when training
    ran with g_ema_decay > 0) — the PGGAN paper's eval convention."""
    import jax
    from pggan_tpu.models import init_generator_params
    from pggan_tpu.utils import checkpoint as ckpt_lib

    name = "Gema" if ema else "G"
    result = ckpt_lib.load_checkpoint(cfg.save_root, cfg.ckpt_id, name, cfg.ckpt_step)
    if result is None:
        raise FileNotFoundError(
            f"no {name} checkpoint for ckpt_id={cfg.ckpt_id!r} "
            f"step={cfg.ckpt_step!r}")
    arrays, _opt, meta = result
    args = Config(meta.get("args", {}))
    scale = int(meta["schedule"]["scale_index"])
    alpha = float(meta["schedule"]["alpha"])

    template = init_generator_params(
        jax.random.fold_in(jax.random.PRNGKey(int(args.seed)), 0),
        latent_dim=args.latent_dim, depths=args.depths, scale=scale,
        output_dim=args.output_dim, equalized_lr=args.equalized_lr,
        init_bias_to_zero=args.init_bias_to_zero)
    # strict=True — the checkpoint key set must equal the rebuilt G's
    # (the reference demo's assert, demo.py:40-44)
    params = ckpt_lib.arrays_to_tree(template, arrays, strict=True)
    return params, args, scale, alpha


def main(argv=None):
    parser = argparse.ArgumentParser(description="pggan_tpu sampler")
    parser.add_argument("--ckpt_id", required=True)
    parser.add_argument("--ckpt_step", type=int, default=None)
    parser.add_argument("--save_root", default="train_result")
    parser.add_argument("--n_samples", type=int, default=16)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--export", default=None, metavar="PATH",
                        help="also write a self-contained StableHLO serving "
                             "artifact (jax.export) of the loaded generator")
    parser.add_argument("--ema", action="store_true",
                        help="sample from the smoothed generator (Gema "
                             "checkpoint; requires g_ema_decay > 0 training)")
    parser.add_argument("--platform", default=None,
                        help="pin the jax platform (e.g. cpu) — applied via "
                             "jax.config.update before any backend "
                             "initializes (env vars are latched over at "
                             "interpreter startup on some images)")
    ns = parser.parse_args(argv)

    cfg = Config({"ckpt_id": ns.ckpt_id, "ckpt_step": ns.ckpt_step,
                  "save_root": ns.save_root})

    import jax
    if ns.platform:
        jax.config.update("jax_platforms", ns.platform)
    import jax.numpy as jnp
    from pggan_tpu.models import generator_apply

    params, args, scale, alpha = load_generator(cfg, ema=ns.ema)
    out_dir = ns.output_dir or os.path.join(
        ns.save_root, ns.ckpt_id, "samples")
    os.makedirs(out_dir, exist_ok=True)

    if ns.export:
        from pggan_tpu.export import export_generator
        export_generator(
            params, latent_dim=int(args.latent_dim), alpha=alpha,
            path=ns.export, slope=float(args.LReLU_slope),
            apply_pixel_norm=bool(args.apply_pixel_norm),
            last_activation=args.generator_last_activation)
        print(f"wrote serving artifact (scale {scale}, alpha {alpha}) "
              f"to {ns.export}")

    # Sample through the SAME packed program shape training used at
    # hires_pack scales (≥512²) — the unpacked forward is the layout-copy
    # pathology ops/packed.py exists to avoid; the host undoes the
    # space-to-depth on the numpy output.
    from pggan_tpu.train.step import resolve_hires_pack
    from pggan_tpu.utils.image import unpack_space_to_depth
    hp = resolve_hires_pack(args, scale)
    sample = jax.jit(lambda p, z: generator_apply(
        p, z, jnp.float32(alpha), slope=float(args.LReLU_slope),
        apply_pixel_norm=bool(args.apply_pixel_norm),
        last_activation=args.generator_last_activation,
        fused_scale=args.fused_scale,
        hires_pack=hp, output_packed=hp >= 1))

    rng = jax.random.PRNGKey(ns.seed)
    written = 0
    while written < ns.n_samples:
        rng, key = jax.random.split(rng)
        n = min(ns.batch_size, ns.n_samples - written)
        z = jax.random.normal(key, (n, int(args.latent_dim)))
        imgs = np.asarray(sample(params, z))
        if hp >= 1:
            imgs = unpack_space_to_depth(imgs)
        imgs = np.clip(imgs * 0.5 + 0.5, 0.0, 1.0)       # demo.py:62 denorm
        imgs = (imgs * 255.0).astype(np.uint8)
        for i in range(n):
            path = os.path.join(out_dir, f"result_{written + i}.jpg")
            try:
                import cv2
                if not cv2.imwrite(path, imgs[i][:, :, ::-1]):
                    raise IOError(f"cv2.imwrite returned False for {path}")
            except Exception:
                from PIL import Image
                Image.fromarray(imgs[i]).save(path, quality=95)
        written += n
    res = 4 * 2 ** scale
    print(f"wrote {written} samples at {res}x{res} (scale {scale}, "
          f"alpha {alpha}) to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
