"""Experiment trackers: wandb / neptune / mlflow adapters
(pasero/utils.py:1209-1295). All calls are exception-suppressed so a missing
or misconfigured tracker never kills a training run."""

from __future__ import annotations

import contextlib
import logging
from typing import Optional

logger = logging.getLogger("tracker")


class ExperimentTracker:
    def __init__(self, backend: str = "none",
                 project_name: Optional[str] = None,
                 run_name: Optional[str] = None):
        self.backend = backend
        self._run = None
        if backend == "none" or not backend:
            return
        with contextlib.suppress(Exception):
            if backend == "wandb":
                import wandb
                self._run = wandb.init(project=project_name, name=run_name)
            elif backend == "neptune":
                import neptune
                self._run = neptune.init_run(project=project_name,
                                             name=run_name)
            elif backend == "mlflow":
                import mlflow
                mlflow.set_experiment(project_name or "default")
                self._run = mlflow.start_run(run_name=run_name)
                self._mlflow = mlflow
        if self._run is None:
            logger.warning(f"could not initialize tracker {backend!r}")

    def log_config(self, cfg: dict):
        if self._run is None:
            return
        with contextlib.suppress(Exception):
            if self.backend == "wandb":
                self._run.config.update(cfg, allow_val_change=True)
            elif self.backend == "neptune":
                self._run["config"] = cfg
            elif self.backend == "mlflow":
                self._mlflow.log_params(
                    {k: str(v)[:250] for k, v in cfg.items()})

    def log_metrics(self, metrics: dict, step: Optional[int] = None,
                    prefix: str = ""):
        if self._run is None:
            return
        data = {f"{prefix}{k}": v for k, v in metrics.items()
                if isinstance(v, (int, float))}
        with contextlib.suppress(Exception):
            if self.backend == "wandb":
                self._run.log(data, step=step)
            elif self.backend == "neptune":
                for k, v in data.items():
                    self._run[k].append(v, step=step)
            elif self.backend == "mlflow":
                self._mlflow.log_metrics(data, step=step)

    def finish(self):
        if self._run is None:
            return
        with contextlib.suppress(Exception):
            if self.backend == "wandb":
                self._run.finish()
            elif self.backend == "neptune":
                self._run.stop()
            elif self.backend == "mlflow":
                self._mlflow.end_run()
