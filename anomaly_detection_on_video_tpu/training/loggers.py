"""Metric loggers (role of the reference's WandbLogger + LR monitor,
reference: configs/trainer/logger/wandb.yaml, src/runner.py:37-38,77-88).

W&B is optional and absent in air-gapped environments; the default stack is
a JSONL file logger (machine-readable history) + console logger. Metric
names match the reference (``train_loss``, ``valid/rec_auc``,
``valid/pr_auc``) so dashboards/translations carry over.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional


class JsonlLogger:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._f = open(path, "a", buffering=1)

    def log(self, metrics: Dict[str, float], step: int) -> None:
        record = {"step": step, "time": time.time(), **metrics}
        self._f.write(json.dumps(record) + "\n")

    def close(self) -> None:
        self._f.close()


class ConsoleLogger:
    def __init__(self, every: int = 50, stream=None):
        self.every = every
        self.stream = stream or sys.stderr

    def log(self, metrics: Dict[str, float], step: int) -> None:
        if "epoch" in metrics or step % self.every == 0:
            parts = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in metrics.items()
            )
            print(f"[step {step}] {parts}", file=self.stream)


class WandbLogger:
    """Thin optional W&B logger; no-op if wandb is unavailable.

    Parity with the reference's Lightning WandbLogger
    (configs/trainer/logger/wandb.yaml): scalars, the eval overlay figure as
    a ``wandb.Image`` (src/runner.py:81-88), and — with ``log_model`` —
    checkpoint artifact uploads (``log_model: all``).
    """

    def __init__(self, project: str = "anomaly-detection-on-video-tpu",
                 name: Optional[str] = None, key: Optional[str] = None,
                 log_model: bool = False):
        self.log_model = log_model
        try:
            import wandb
        except ImportError:
            # the user asked for W&B (wandb_key=... reaches here only when
            # set) — a silent no-op would look like a lost run
            import sys

            print(
                "warning: wandb_key is set but the wandb package is not "
                "installed; W&B logging disabled (JSONL/console logging "
                "unaffected)",
                file=sys.stderr,
            )
            self._run = None
            self._wandb = None
            return
        self._wandb = wandb
        if key:
            wandb.login(key=key)
        self._run = wandb.init(project=project, name=name)

    def log(self, metrics: Dict[str, float], step: int) -> None:
        if self._run is not None:
            self._run.log(metrics, step=step)

    def log_image(self, name: str, path: str, step: int) -> None:
        """Upload a figure PNG (the reference's plot_auc wandb.Image log)."""
        if self._run is not None:
            self._run.log({name: self._wandb.Image(path)}, step=step)

    def log_artifact(self, path: str, name: str, type: str = "model") -> None:
        """Upload a checkpoint directory as a W&B artifact (log_model: all)."""
        if self._run is None or not self.log_model:
            return
        artifact = self._wandb.Artifact(name, type=type)
        artifact.add_dir(path) if os.path.isdir(path) else artifact.add_file(path)
        self._run.log_artifact(artifact)
