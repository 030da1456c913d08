"""Import a reference (PyTorch) PGGAN checkpoint into a pggan_tpu run dir.

The reference writes `{save_root}/{run_id}/ckpt/{G|D}_{step}.pt`
(`lib/checkpoint.py:22-34`): a torch pickle holding {args, global_step,
schedule scalars, model state_dict, optimizer state_dict}. This tool maps
it onto this framework's npz checkpoint format so that

    python tools/import_torch_ckpt.py --g .../G_latest.pt --d .../D_latest.pt \
        --run_id migrated
    python demo.py --ckpt_id migrated              # sample it
    python train.py migrated2 --ckpt_id migrated   # keep training it

work directly on a reference-trained model.

Optimizer moments are NOT imported: fresh Adam state is written instead,
matching the reference's own semantics of resetting Adam at every scale
jump (`pggan/model.py:131-139`) — the moments a migrated run would carry
are discarded at its next jump anyway. The full progressive-schedule state
(scale, alpha, jump bookkeeping, `pggan/model.py:54-64`) IS imported, so a
resumed run continues the fade exactly where the reference left off.

Runs on CPU; torch is required only here (never by the framework).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_torch_ckpt(path: str):
    import torch
    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    except TypeError:   # older torch without the weights_only kwarg
        return torch.load(path, map_location="cpu")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--g", required=True, help="reference G_*.pt path")
    ap.add_argument("--d", help="reference D_*.pt path (omit for "
                    "sampling-only import; training resume needs it)")
    ap.add_argument("--run_id", required=True,
                    help="run id to create under --save_root")
    ap.add_argument("--save_root", default="train_result")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform for the conversion (cpu default)")
    ns = ap.parse_args(argv)

    import jax
    if ns.platform:
        jax.config.update("jax_platforms", ns.platform)

    from pggan_tpu.config import Config
    from pggan_tpu.models import (init_discriminator_params,
                                  init_generator_params)
    from pggan_tpu.models.torch_port import (convert_discriminator_state_dict,
                                             convert_generator_state_dict,
                                             reference_schedule_meta)
    from pggan_tpu.train.step import make_optimizers
    from pggan_tpu.utils import checkpoint as ckpt_lib

    g_dict = load_torch_ckpt(ns.g)
    step = int(g_dict["global_step"])
    schedule = reference_schedule_meta(g_dict)
    scale = schedule["scale_index"]

    # The reference snapshots its full args into the ckpt
    # (`pggan/model.py:54-55`); the key names are this framework's config
    # surface by design, so they thread straight through our defaults.
    cfg = Config()
    cfg.update({k: v for k, v in dict(g_dict["args"]).items() if k in cfg})
    cfg.run_id = ns.run_id
    cfg.save_root = ns.save_root
    cfg.ckpt_id = None
    cfg.ckpt_step = None

    meta = {"args": cfg.to_dict(), "schedule": schedule}
    opt_g, opt_d = make_optimizers(cfg)

    template_g = init_generator_params(
        jax.random.PRNGKey(int(cfg.seed)),
        latent_dim=int(cfg.latent_dim), depths=list(cfg.depths), scale=scale,
        output_dim=int(cfg.output_dim), equalized_lr=bool(cfg.equalized_lr),
        init_bias_to_zero=bool(cfg.init_bias_to_zero))
    params_g = ckpt_lib.arrays_to_tree(
        template_g,
        convert_generator_state_dict(g_dict["model"],
                                     equalized_lr=bool(cfg.equalized_lr)),
        strict=True)
    path = ckpt_lib.save_checkpoint(
        ns.save_root, ns.run_id, "G", step, params=params_g,
        opt_state=opt_g.init(params_g), meta=meta)
    print(f"G: {ns.g} → {path} (scale={scale}, alpha={schedule['alpha']}, "
          f"step={step})")

    if cfg.g_ema_decay:
        # The reference has no EMA stream; seed it from the imported G so
        # --ema sampling and FID hooks work immediately after migration.
        ckpt_lib.save_checkpoint(ns.save_root, ns.run_id, "Gema", step,
                                 params=params_g, meta=meta)
        print("Gema: seeded from imported G (reference has no EMA stream)")

    if ns.d:
        d_dict = load_torch_ckpt(ns.d)
        d_step = int(d_dict["global_step"])
        if d_step != step:
            raise SystemExit(f"G step {step} != D step {d_step}: refuse to "
                             f"assemble a mixed checkpoint (same hazard the "
                             f"trainer's load refuses)")
        template_d = init_discriminator_params(
            jax.random.PRNGKey(int(cfg.seed)),
            depths=list(cfg.depths), scale=scale,
            input_dim=int(cfg.input_dim),
            decision_layer_size=int(cfg.decision_layer_size),
            apply_minibatch_norm=bool(cfg.apply_minibatch_norm),
            equalized_lr=bool(cfg.equalized_lr),
            init_bias_to_zero=bool(cfg.init_bias_to_zero))
        params_d = ckpt_lib.arrays_to_tree(
            template_d,
            convert_discriminator_state_dict(
                d_dict["model"], equalized_lr=bool(cfg.equalized_lr)),
            strict=True)
        path = ckpt_lib.save_checkpoint(
            ns.save_root, ns.run_id, "D", step, params=params_d,
            opt_state=opt_d.init(params_d), meta=meta)
        print(f"D: {ns.d} → {path}")
    else:
        print("no --d given: sampling-ready import (train resume needs D)")


if __name__ == "__main__":
    main()
