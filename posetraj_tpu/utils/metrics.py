"""Training metrics logging: JSONL always, TensorBoard when available.

Stands in for the reference's accelerate trackers (init_trackers("SVDXtend"),
train_svd_traj_blender_14.py:1085-1086, per-step train_loss :1383) without the
accelerate dependency.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, log_dir: str, run_name: str = "posetraj"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}.metrics.jsonl")
        self._file = open(self.path, "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # optional

            self._tb = SummaryWriter(os.path.join(log_dir, "tb", run_name))
        except Exception:
            pass

    def log(self, step: int, metrics: Dict[str, float]):
        clean = {k: float(v) for k, v in metrics.items()}
        self._file.write(json.dumps({"step": int(step), "time": time.time(), **clean}) + "\n")
        self._file.flush()
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()
