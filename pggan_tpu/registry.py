"""Model registry / loader — `CreateModel` analog (`lib/model_loader.py:4-37`).

Dispatch on `cfg.model_id`, run the fixed initialization sequence, and
optionally restore a checkpoint. New model families register themselves in
`MODEL_REGISTRY`.
"""

from __future__ import annotations

from typing import Callable, Dict

from pggan_tpu.config import Config

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(model_id: str):
    def wrap(cls):
        MODEL_REGISTRY[model_id] = cls
        return cls
    return wrap


def create_model(cfg: Config):
    """Create + fully initialize the trainer for `cfg.model_id`
    (initialize_models → optimizers → dataset → iterator → loss collector
    → checkpoint restore, the `lib/model_loader.py:13-21` sequence, inside
    `Trainer.setup()`)."""
    model_id = str(cfg.model_id)
    if model_id not in MODEL_REGISTRY:
        # lazy import so the registry stays import-cycle free
        if model_id == "pggan":
            from pggan_tpu.train.trainer import ProgressiveGANTrainer
            MODEL_REGISTRY["pggan"] = ProgressiveGANTrainer
        else:
            raise KeyError(
                f"unknown model_id {model_id!r}; known: {sorted(MODEL_REGISTRY)}")
    trainer = MODEL_REGISTRY[model_id](cfg)
    return trainer.setup()
