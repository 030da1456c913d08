"""Host-side loss bookkeeping.

Capability parity with `LossInterface` (`lib/loss.py:8-51`): a `loss_dict`
of 4-decimal-rounded floats and a `print_loss` with dd/hh/mm/ss elapsed
formatting (`lib/loss.py:23-31`). Values arrive as device scalars from the
fused train step; conversion to Python floats happens here, off the hot
path and only on loss_cycle boundaries.
"""

from __future__ import annotations

import time
from typing import Dict, Mapping


class LossCollector:
    def __init__(self, max_step: int):
        self.max_step = max_step
        self.start_time = time.time()
        self.loss_dict: Dict[str, float] = {}

    def update(self, metrics: Mapping[str, object]):
        """Record a step's metrics (device scalars or floats), rounded to
        4 decimals like the reference (`pggan/loss.py:12,23-25`)."""
        for key, value in metrics.items():
            self.loss_dict[key] = round(float(value), 4)

    def print_loss(self, global_step: int):
        seconds = int(time.time() - self.start_time)
        print("")
        print(f"[ {seconds//3600//24:02}d {(seconds//3600)%24:02}h "
              f"{(seconds//60)%60:02}m {seconds%60:02}s ]")
        print(f"steps: {global_step:06} / {self.max_step}")
        loss_d = self.loss_dict.get("L_D", float("nan"))
        loss_g = self.loss_dict.get("L_G", float("nan"))
        print(f"lossD: {loss_d} | lossG: {loss_g}")
