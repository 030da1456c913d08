"""YAML-backed attribute-style configuration.

Capability parity with the reference's `lib/config.py` (`Config.from_yaml`,
attribute access, nested-dict recursion, `update`, `save_yaml`) plus a typed
default table so configs may omit keys. Keys are reference-compatible
(`configs.yaml` from the reference loads unchanged).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml

# Defaults mirror the reference configs.yaml (see /root/reference/configs.yaml)
# with TPU-specific additions at the bottom.
_DEFAULTS: Dict[str, Any] = {
    "model_id": "pggan",
    "use_mGPU": False,
    "use_wandb": False,
    "wandb_alert_thres": 1000,
    "use_validation": False,
    "valid_dataset_root": None,
    # held-out batches averaged per validation() call (real+fake D logits
    # and adversarial losses; see trainer.validation)
    "val_batches": 4,
    "dataset_root_list": [],
    "save_root": "train_result",
    # optimizer
    "lr_G": 1e-4,
    "lr_D": 1e-5,
    "beta1": 0.0,
    "beta2": 0.99,
    "adam_eps": 1e-8,
    # loss weights
    "W_adv": 1.0,
    "W_gp": 10.0,
    "W_drift_D": 0.001,
    # loss mode: 'r1' (reference's active path: BCE + R1 on reals) or
    # 'wgangp' (BCE + eps-interpolated gradient penalty + drift; the
    # reference's latent path, pggan/loss.py:54-100, with its no-gradient
    # `.item()` bug fixed).
    "loss_mode": "r1",
    # R1 variants: target 'logits' (published R1) or 'loss' (the reference's
    # literal call site, pggan/loss.py:23); r1_interval>1 enables lazy R1
    # (StyleGAN2 §5.1) with interval-scaled penalty — default 1 = parity.
    "r1_target": "logits",
    "r1_interval": 1,
    # hyperparameters
    "batch_per_gpu": 16,
    "max_step": 2_000_000,
    # log cycles
    "loss_cycle": 10,
    "test_cycle": 1000,
    "ckpt_cycle": 10000,
    # model
    "latent_dim": 512,
    "input_dim": 3,
    "output_dim": 3,
    "init_bias_to_zero": True,
    "max_depths": 7,
    "depths": [512, 512, 512, 512, 256, 128, 64],
    # schedule
    "max_step_at_scale": [10000, 20000, 40000, 80000, 80000, 80000, 80000, 80000, 80000],
    "alpha": 0.0,
    "alpha_jump_start": [-1, 2000, 4000, 10000, 10000, 10000, 10000, 10000, 10000],
    "alpha_jump_interval": [0, 100, 100, 100, 100, 100, 100, 100, 100],
    "alpha_jump_Ntimes": [0, 100, 200, 400, 400, 400, 400, 400, 400],
    # activation / normalization
    "LReLU_slope": 0.2,
    "generator_last_activation": None,
    "apply_pixel_norm": True,
    "apply_minibatch_norm": True,
    "equalized_lr": True,
    "decision_layer_size": 1,
    # checkpoint
    "ckpt_id": None,
    "ckpt_step": None,
    # ---- TPU-native additions ----
    "seed": 42,
    "compute_dtype": "float32",       # 'float32' | 'bfloat16' (activations/convs)
    # 'xla' (pure jnp, XLA-fused — measured production winner) | 'fused'
    # (jnp + fused Pallas G epilogues) | 'pallas' (all Pallas kernels)
    "impl": "xla",
    "data_backend": "auto",           # 'auto' | 'folder' | 'synthetic'
    "data_backend_impl": "threads",   # 'threads' (native pool) | 'grain'
    "synthetic_dataset_size": 4096,
    "num_data_workers": 8,
    "prefetch_depth": 2,
    # decode-once-per-scale cache of resized uint8 images; 'auto' enables
    # it whenever n_images * res^2 * 3 fits the budget below (decode is
    # the dominant host cost; per-draw flip/jitter stays per-sample)
    "augment": True,                  # train-set hflip + color jitter
                                      # (`lib/dataset.py:103-108`)
    "cache_decoded": "auto",          # 'auto' | True | False
    "decode_cache_mb": 8192,
    # out-of-core resized-image store (`data/resized_store.py`): when the
    # resized-at-scale dataset does NOT fit decode_cache_mb (the
    # reference's real 37,345-image workload at ≥512², README.md:7), build
    # a per-scale [N, res, res, 3] uint8 memmap on disk ONCE and read rows
    # per draw (~100 µs via the page cache vs ~20-50 ms per-draw decode on
    # this 1-core host). 'auto' engages it exactly in that regime; True
    # forces it (bypassing the RAM cache); False disables (per-draw decode
    # fallback). Store files are keyed by (path list, file sizes,
    # resolution) and reused across runs; builds are resumable.
    "resized_store": "auto",          # 'auto' | True | False
    # directory for store files; None → '<save_root>/resized_store'
    "resized_store_dir": None,
    # device-RESIDENT dataset cache (`data/device_cache.py`): upload the
    # resized-at-scale images to HBM once per scale and assemble batches
    # in-graph — per-step host->device traffic drops from megabytes of
    # pixels to bytes of indices (the e2e bottleneck at >=512² on a
    # remotely-attached chip). 'auto' enables it when the dataset fits
    # `device_cache_mb` on a single-process mesh.
    "device_data_cache": False,       # 'auto' | True | False
    "device_cache_mb": 256,
    # per-scale batch override: dict {scale_index: global_batch}; None → use
    # batch_per_gpu * num_devices at every scale.
    "batch_schedule": None,
    "donate_buffers": True,
    # per-program XLA compiler options for the train step, a
    # {flag_name: value} map (e.g. xla_tpu_scoped_vmem_limit_kib: "65536").
    # The only route to TPU compiler knobs here: local XLA_FLAGS carries
    # no TPU flags (compilation is remote), jit(compiler_options=...)
    # ships them inside the compile request (train/step.py). None = XLA
    # defaults — measured optimal (BASELINE.md compiler-flag probes).
    "compiler_options": None,
    # run N fused steps per dispatched program (lax.scan in-graph loop)
    # inside event-free schedule windows — amortizes the per-step
    # host→device round trip that dominates end-to-end throughput at
    # small resolutions (measured table in BASELINE.md). 1 = off
    # (per-step dispatch, reference-shaped loop); 'auto' = 8 at
    # res ≤ 128, else 1; semantics are step-exact either way (chunks
    # never straddle a schedule event — equivalence tested).
    "steps_per_dispatch": 1,
    # rematerialization: True | False | 'auto'. With the dilated
    # upscale-conv fusion + bf16 avgpool accumulation, 512² (batch 8) and
    # 1024² (batch 4) fit WITHOUT remat on a v5e chip (measured: 35.4 →
    # 44.0 img/s at 512², 4.9 → 6.1 at 1024²), so 'auto' only enables it
    # beyond the default depth table (scale ≥ 9). Set True explicitly for
    # oversized per-chip batches at high resolution.
    "remat": "auto",
    # upscale+conv structural fusion in G blocks:
    #   'dilated' (default): ONE lhs-dilated conv with a 4×4 tap-merged
    #     kernel — 2.25× fewer MACs than conv-on-upscaled, no upscaled
    #     intermediate (measured +8% full-step at 256², +16% at 1024²)
    #   'auto': quarter-res dense conv w/ 4·C_out groups on lane-bound
    #     blocks (cout < 128) | True: same, all blocks | False: unfused
    "fused_scale": "dilated",
    # space-to-depth packed execution of the top G/D levels
    # (ops/packed.py): kills the XLA layout-copy pathology at
    # huge-spatial × tiny-channel shapes (41% of the 1024² step).
    # 'auto' packs every consecutive top level with resolution ≥ 512 and
    # depth ≤ 64 (2 levels at 1024²); an int forces that many levels;
    # True ≡ 1; False disables.
    "hires_pack": "auto",
    # periodic FID evaluation: every fid_cycle steps compare fid_samples
    # generated images against held-out reals (0 = off). Uses the
    # deterministic random-conv feature extractor (metrics/fid.py) —
    # relative values only, not Inception-FID comparable.
    "fid_cycle": 0,
    "fid_samples": 512,
    # 'random_conv' (deterministic, relative values) | 'inception'
    # (canonical InceptionV3 pool3 architecture; supply fid_weights — a
    # converted torchvision npz, see metrics/inception.py — for values
    # comparable to published FID numbers)
    "fid_extractor": "random_conv",
    "fid_weights": None,
    # G weight smoothing (PGGAN paper §A.1): exponential moving average
    # of generator weights, maintained inside the fused train step and
    # used for FID eval + saved as the `Gema` checkpoint (demo.py --ema).
    # 0.0 = off = reference parity (the reference omits EMA); the paper
    # uses 0.999.
    "g_ema_decay": 0.0,
}


def default_depths(max_scale: int) -> list:
    """Reference depth law (configs.yaml:50 generalized): 512 through
    scale 3, then halve per scale, floored at 16 — valid for any scale
    (covers the 512²/1024² extensions beyond the reference's 256² table).
    Always returns at least the reference's 7 entries so lower scales see
    the exact published schedule. Single source of truth for the bench /
    profiling tools (bench.py, tools/bench_e2e.py, tools/bench_serving.py,
    tools/profile_scale.py)."""
    return [512 if s <= 3 else max(16, 512 >> (s - 3))
            for s in range(max(max_scale + 1, 7))]


class Config:
    """Attribute-style config object over a plain dict.

    Mirrors reference `lib/config.py:5-81` behavior (attribute get/set,
    nested Config recursion, `update`, dict protocol) without replicating
    its quirks.
    """

    def __init__(self, dict_config: Optional[Dict[str, Any]] = None, *, use_defaults: bool = True):
        if use_defaults:
            object.__setattr__(self, "_store", copy.deepcopy(_DEFAULTS))
        else:
            object.__setattr__(self, "_store", {})
        # Keys the USER set (yaml / CLI / attribute writes) as opposed to
        # package defaults or a checkpoint's snapshotted args (`update`).
        # Checkpoint restore consults this: explicitly-passed resume flags
        # override the snapshot, defaults defer to it.
        object.__setattr__(self, "_explicit", set())
        if dict_config:
            self.set_attribute(dict_config)

    # -- construction -------------------------------------------------------
    @staticmethod
    def from_yaml(path: str) -> "Config":
        """Load a yaml config with provenance-aware explicitness.

        Only yaml keys whose value DIFFERS from the package default (or
        that the defaults table doesn't know) count as user intent for
        checkpoint-resume overrides. The distinction matters because
        train.py defaults to `--config configs.yaml`, whose base file
        sets essentially every key: if every yaml key were 'explicit',
        `preserve_keys` in load_checkpoint would cover the whole snapshot
        and resuming under a different config would silently re-apply the
        current yaml's schedule/lr/loss_mode instead of deferring to the
        snapshot (`lib/model_loader.py:26-31` parity: defaults defer).
        A key deliberately set *back to* its default value in yaml is
        treated as default — pass it on the CLI to force the override.
        """
        with open(path, "r") as stream:
            raw = yaml.safe_load(stream) or {}
        cfg = Config()
        cfg.set_attribute(raw, explicit=False)
        _SENTINEL = object()
        for key, value in raw.items():
            if value != _DEFAULTS.get(key, _SENTINEL):
                cfg._explicit.add(key)
        return cfg

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "Config":
        return Config(d)

    @staticmethod
    def get_empty() -> "Config":
        return Config(use_defaults=False)

    # -- dict protocol -------------------------------------------------------
    def keys(self):
        return self._store.keys()

    def __getitem__(self, key):
        return self._store[key]

    def __setitem__(self, key, value):
        self._store[key] = value
        self._explicit.add(key)

    def __delitem__(self, key):
        del self._store[key]
        self._explicit.discard(key)

    def __contains__(self, key):
        return key in self._store

    def __len__(self):
        return len(self._store)

    def __repr__(self):
        return f"Config({self._store!r})"

    # -- attribute protocol --------------------------------------------------
    def __getattr__(self, item):
        store = object.__getattribute__(self, "_store")
        if item in store:
            return store[item]
        raise AttributeError(f"Config has no key {item!r}")

    def __setattr__(self, key, value):
        self.set_attribute({key: value})

    def set_attribute(self, dict_config: Dict[str, Any], *,
                      explicit: bool = True):
        for key, value in dict_config.items():
            if isinstance(value, dict):
                self._store[key] = Config(value, use_defaults=False)
            else:
                self._store[key] = value
            if explicit:
                self._explicit.add(key)

    def explicit_keys(self):
        """Top-level keys explicitly set by the user (not defaults, not
        `update` merges)."""
        return frozenset(self._explicit)

    def update(self, other):
        """Recursive merge (reference `lib/config.py:63-71`)."""
        items = other.items() if isinstance(other, dict) else (
            (k, other[k]) for k in other.keys())
        for key, value in items:
            if key in self._store and isinstance(value, Config) and isinstance(self._store[key], Config):
                self._store[key].update(value)
            else:
                self._store[key] = value

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for key, value in self._store.items():
            out[key] = value.to_dict() if isinstance(value, Config) else value
        return out

    # -- persistence ---------------------------------------------------------
    def save_yaml(self, path: Optional[str] = None):
        """Snapshot the effective (merged) config into the run directory.

        Unlike the reference (which shutil-copies the source yaml file,
        `lib/config.py:15-16`), we serialize the merged config so resumed
        runs record CLI overrides too; the source `path` is accepted for
        API compatibility but not needed.
        """
        del path  # API compatibility with the reference signature
        run_dir = os.path.join(str(self.save_root), str(self.run_id))
        os.makedirs(run_dir, exist_ok=True)
        out_path = os.path.join(run_dir, f"config_{self.run_id}.yaml")
        with open(out_path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)
        return out_path
