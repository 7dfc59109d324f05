"""Metrics, progress and observability.

Replaces the reference's meters + TensorBoard + wandb stack
(utils/misc.py:36-245, trainer.py:109-123, main_submitit.py:112-119):
console meters with ETA, optional TensorBoard scalars, optional wandb
mirror, plus first-class jax.profiler trace capture (the reference has no
profiler — SURVEY §5.1 flags this as a gap we fill)."""

from __future__ import annotations

import time
from collections import deque


class AverageMeter:
    """Windowed average (utils/misc.py:172-190 semantics)."""

    def __init__(self, name: str, window: int = 100):
        self.name = name
        self.window = deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.window.append(value)
        self.total += value * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def smoothed(self) -> float:
        return sum(self.window) / max(len(self.window), 1)


class MetricLogger:
    """Console + optional TensorBoard scalar logging with ETA."""

    def __init__(self, log_dir: str | None = None, total_iters: int | None = None):
        self.meters: dict[str, AverageMeter] = {}
        self.total_iters = total_iters
        self.t_start = time.time()
        self.writer = None
        self._jsonl = None
        if log_dir is not None:
            import os

            os.makedirs(log_dir, exist_ok=True)
            # always-on torch-free scalar log; TensorBoard is an optional
            # extra (torch.utils.tensorboard needs the tensorboard package)
            self._jsonl = open(
                os.path.join(log_dir, "scalars.jsonl"), "a", buffering=1
            )
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(log_dir)
            except Exception:
                self.writer = None
        self.wandb = None

    def enable_wandb(self, project: str = "InstDiff", name: str | None = None,
                     config: dict | None = None):
        try:
            import wandb

            self.wandb = wandb.init(project=project, name=name, config=config)
        except Exception:
            self.wandb = None

    def log(self, step: int, values: dict[str, float]):
        for k, v in values.items():
            self.meters.setdefault(k, AverageMeter(k)).update(v)
            if self.writer is not None:
                self.writer.add_scalar(k, v, step)
            if self.wandb is not None:
                self.wandb.log({k: v}, step=step)
        if self._jsonl is not None:
            import json

            self._jsonl.write(
                json.dumps({"step": step, **values}) + "\n"
            )
        parts = [f"{k}: {m.smoothed:.4g}" for k, m in self.meters.items()]
        eta = ""
        if self.total_iters:
            rate = (time.time() - self.t_start) / max(step, 1)
            eta = f" eta {self._hms(rate * (self.total_iters - step))}"
        print(f"[iter {step}] " + "  ".join(parts) + eta, flush=True)

    @staticmethod
    def _hms(sec: float) -> str:
        sec = int(sec)
        return f"{sec // 3600}:{(sec % 3600) // 60:02d}:{sec % 60:02d}"


class ProfilerTrace:
    """jax.profiler capture: `with ProfilerTrace('/tmp/trace'): step()` then
    inspect in TensorBoard/Perfetto."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False
