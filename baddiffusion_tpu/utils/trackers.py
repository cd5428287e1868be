"""Experiment tracking: JSONL (always) + tensorboard + wandb when available.

Capability parity with the reference's dual tensorboard+wandb tracking
(baddiffusion.py:245-246,283-288,619-621); offline environments degrade to the
durable JSONL stream, which also feeds `score.json`-style artifacts.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class Tracker:
    def __init__(self, logging_dir: str, project: str = "baddiffusion_tpu", run_name: Optional[str] = None, config: Optional[dict] = None):
        os.makedirs(logging_dir, exist_ok=True)
        self.logging_dir = logging_dir
        self.jsonl_path = os.path.join(logging_dir, "metrics.jsonl")
        self._jsonl = open(self.jsonl_path, "a", buffering=1)
        self._tb = None
        self._wandb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=logging_dir)
        except Exception:
            pass
        try:
            import wandb

            self._wandb = wandb.init(project=project, name=run_name, config=config or {}, dir=logging_dir)
        except Exception:
            pass
        if config is not None:
            scalars = {k: v for k, v in config.items() if isinstance(v, (int, float, str, bool))}
            with open(os.path.join(logging_dir, "tracker_config.json"), "w") as f:
                json.dump(scalars, f, indent=2, sort_keys=True, default=str)

    def log(self, metrics: Dict[str, float], step: Optional[int] = None) -> None:
        rec = {"_time": time.time()}
        if step is not None:
            rec["_step"] = int(step)
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(k, float(v), global_step=step)
                except (TypeError, ValueError):
                    pass
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
