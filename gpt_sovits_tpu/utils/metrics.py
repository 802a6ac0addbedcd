"""Observability: metrics logging, phase timing, throughput counters,
profiler hooks.

The reference's observability is print()-based phase timers (TTS.py:1089,
inference_webui.py:828) plus TensorBoard scalars in trainers
(s2_train.py:475). Here:
  * MetricsLogger — append-only JSONL (machine-readable) + console lines;
    TensorBoard is optional (used when `tensorboardX`/`torch.utils.
    tensorboard` is importable)
  * PhaseTimer — the t0..t5 phase breakdown as a context helper
  * ThroughputMeter — audio-seconds synthesized per second per chip, the
    north-star serving metric
  * profile_trace — jax.profiler wrapper producing xprof traces
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass


class MetricsLogger:
    def __init__(self, log_dir: str, name: str = "metrics", *, echo: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self.echo = echo
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def log(self, step: int, **scalars) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))
        if self.echo:
            parts = " ".join(f"{k}={float(v):.4g}" for k, v in scalars.items())
            print(f"[step {step}] {parts}")

    def close(self):
        if self._tb is not None:
            self._tb.close()


class PhaseTimer:
    """Named phase timing (the reference's hand-rolled t0..t5 lines)."""

    def __init__(self):
        self.phases: dict[str, float] = {}
        self._t = time.perf_counter()

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        self.phases[name] = self.phases.get(name, 0.0) + (time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.phases.values())
        parts = [f"{k}:{v:.3f}s" for k, v in self.phases.items()]
        return f"{' '.join(parts)} total:{total:.3f}s"


@dataclass
class ThroughputMeter:
    """audio-seconds synthesized / wall-second / chip."""

    n_chips: int = 1
    audio_seconds: float = 0.0
    wall_seconds: float = 0.0

    @contextlib.contextmanager
    def measure(self, audio_seconds: float):
        t0 = time.perf_counter()
        yield
        self.wall_seconds += time.perf_counter() - t0
        self.audio_seconds += audio_seconds

    def measure_done(self, audio_seconds: float, wall_seconds: float) -> None:
        """Record an already-timed request (phases measured elsewhere)."""
        self.audio_seconds += audio_seconds
        self.wall_seconds += wall_seconds

    @property
    def rtf(self) -> float:
        return self.wall_seconds / max(self.audio_seconds, 1e-9)

    @property
    def audio_s_per_s_per_chip(self) -> float:
        return self.audio_seconds / max(self.wall_seconds, 1e-9) / self.n_chips

    def as_dict(self) -> dict:
        return {
            "rtf": self.rtf,
            "audio_s_per_s_per_chip": self.audio_s_per_s_per_chip,
            "audio_seconds": self.audio_seconds,
            "wall_seconds": self.wall_seconds,
        }


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """xprof trace around a block (view with tensorboard-profile/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
