"""Metrics logging: console + JSONL + optional wandb.

Capability parity with the reference's wandb integration (`train.py:23-24,
50-53`: project=model_id, name=run_id, log(loss_dict) every loss_cycle)
with a JSONL metrics file as the always-on backend (wandb is not installed
in every environment; the reference hard-depends on it, we gate it).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Mapping, Optional


class MetricLogger:
    def __init__(self, save_root: str, run_id: str, *, model_id: str = "pggan",
                 use_wandb: bool = False):
        self.run_dir = os.path.join(str(save_root), str(run_id))
        os.makedirs(self.run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.run_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=model_id, name=str(run_id))
            except Exception as exc:  # wandb missing or offline
                print(f"[pggan_tpu] wandb unavailable ({exc!r}); JSONL logging only")

    def log(self, global_step: int, metrics: Mapping[str, float]):
        record = {"step": int(global_step), "time": time.time()}
        record.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=int(global_step))

    def close(self):
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
