"""Run logger: timestamped run dir, TensorBoard + file log + rich console,
running-average status flushes, config snapshot and source backup.

Parity with reference `utils/logger.py:12` (Logger) and the wandb hooks in
the trainers (wandb is not available in this environment; the interface
accepts an optional `extra_sink` callable filling that role).
"""

from __future__ import annotations

import logging
import os
import shutil
import time
from collections import defaultdict
from typing import Callable, Dict, Iterable, Optional


class Logger:
    def __init__(self, exp_name: str, output_dir: str = "runs",
                 status_freq: int = 50,
                 backup_paths: Optional[Iterable[str]] = None,
                 extra_sink: Optional[Callable[[Dict, int], None]] = None,
                 use_tensorboard: bool = True):
        stamp = time.strftime("%Y%m%d-%H%M%S")
        self.run_dir = os.path.join(output_dir, f"{stamp}_{exp_name}")
        os.makedirs(self.run_dir, exist_ok=True)
        os.makedirs(os.path.join(self.run_dir, "checkpoints"), exist_ok=True)
        self.status_freq = status_freq
        self.extra_sink = extra_sink

        self._logger = logging.getLogger(f"ei_nexus.{stamp}")
        self._logger.setLevel(logging.INFO)
        self._logger.propagate = False
        fh = logging.FileHandler(os.path.join(self.run_dir, "log.txt"))
        fh.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(message)s"))
        self._logger.addHandler(fh)
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter("%(message)s"))
        self._logger.addHandler(sh)

        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(log_dir=self.run_dir)
            except Exception:
                self._logger.warning("tensorboard unavailable; file/console "
                                     "logging only")

        # source backup (reference utils/logger.py:38-44)
        if backup_paths:
            backup_dir = os.path.join(self.run_dir, "backup")
            os.makedirs(backup_dir, exist_ok=True)
            for p in backup_paths:
                if os.path.isdir(p):
                    shutil.copytree(
                        p, os.path.join(backup_dir, os.path.basename(p)),
                        dirs_exist_ok=True)
                elif os.path.isfile(p):
                    shutil.copy2(p, backup_dir)

        self._running: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    # -- plain messages ----------------------------------------------------
    def log_info(self, msg: str) -> None:
        self._logger.info(msg)

    # -- scalar metrics ----------------------------------------------------
    def write_scalars(self, scalars: Dict[str, float], step: int) -> None:
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)
        if self.extra_sink is not None:
            self.extra_sink(scalars, step)

    def accumulate_status(self, scalars: Dict[str, float]) -> None:
        for k, v in scalars.items():
            self._running[k] += float(v)
            self._counts[k] += 1

    def write_status(self, step: int, prefix: str = "") -> None:
        """Flush running means every `status_freq` accumulations."""
        if not self._running:
            return
        means = {k: self._running[k] / max(self._counts[k], 1)
                 for k in self._running}
        parts = " ".join(f"{k}={v:.4g}" for k, v in means.items())
        self.log_info(f"{prefix}step {step}: {parts}")
        self.write_scalars(means, step)
        self._running.clear()
        self._counts.clear()

    def maybe_status(self, step: int, scalars: Dict[str, float],
                     prefix: str = "") -> None:
        self.accumulate_status(scalars)
        if step % self.status_freq == 0:
            self.write_status(step, prefix)

    def close(self) -> None:
        if self.tb is not None:
            self.tb.close()
