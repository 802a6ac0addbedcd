"""Continuous-batching serving mode.

Couples the HTTP pipeline to `infer/continuous.ContinuousBatcher`: S1
decode for ALL in-flight requests shares one slot pool (requests join at
segment boundaries instead of waiting out a batch), and S2 synthesis runs
per-completion on the worker. The reference has no equivalent — its
"parallel inference" is one fixed batch with eviction
(t2s_model.py:583-779); this is the iteration-level-scheduling superset.

Trade-offs vs the batch path (`TTSPipeline.run`):
  * sampling parameters (top_k/top_p/temperature/penalty) are POOL-level
    (compiled into the segment step), not per-request;
  * randomness comes from the pool's PRNG stream, so per-request seeds
    are not reproducible (argmax decoding is).
Use this mode for latency under concurrent load; use `run()` for batch
jobs and per-request control.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpt_sovits_tpu.infer.continuous import ContinuousBatcher
from gpt_sovits_tpu.infer.pipeline import _next_bucket, phones_right


@dataclass
class _Job:
    """One HTTP request: its text segments mapped to batcher rids."""

    rids: list
    segments: list
    ref: object  # RefCache snapshot at submit time
    speed: float
    done: threading.Event = field(default_factory=threading.Event)
    tokens: dict = field(default_factory=dict)  # rid -> np token array
    audio: Optional[np.ndarray] = None
    error: Optional[Exception] = None


class ContinuousTTSService:
    """Single-controller serving loop over the slot pool."""

    def __init__(
        self,
        pipeline,
        *,
        slots: int = 8,
        segment: int = 25,
        tx_max: int = 512,
        tp_max: int = 512,
        max_new: int = 750,
        weight_quant: Optional[str] = None,
        kv_quant: Optional[str] = None,
        use_fused: Optional[bool] = None,
    ):
        self.pipeline = pipeline
        cfg = pipeline.cfg
        self.segment = segment
        self.cb = ContinuousBatcher(
            pipeline.s1, pipeline.s1_params,
            slots=slots, tx_max=tx_max, tp_max=tp_max, max_new=max_new,
            top_k=cfg.top_k, top_p=cfg.top_p, temperature=cfg.temperature,
            repetition_penalty=cfg.repetition_penalty,
            use_fused=use_fused,
            weight_quant=weight_quant or pipeline.s1_weight_quant,
            kv_quant=kv_quant or pipeline.s1_kv_quant,
        )
        self._jobs: dict[int, _Job] = {}  # rid -> job
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._running = True
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # -- request side -------------------------------------------------------

    def synthesize(self, text: str, language: str = "auto", *, speed: float = 1.0,
                   timeout: float = 600.0) -> tuple[int, np.ndarray]:
        """Blocking synthesis; S1 decode shares the pool with concurrent
        callers. Returns (sr, int16 audio)."""
        p = self.pipeline
        assert p.ref is not None, "call pipeline.set_ref_audio first"
        segments = p.preprocess(text, language, p.cfg.text_split_method)
        if not segments:
            raise ValueError("no synthesizable text")
        ref = p.ref
        prompt = np.asarray(ref.prompt_semantic, np.int32)
        job = _Job(rids=[], segments=segments, ref=ref, speed=speed)
        with self._wake:
            for seg in segments:
                rid = self.cb.submit(np.asarray(seg["phones"], np.int32),
                                     np.asarray(seg["bert"], np.float32), prompt)
                job.rids.append(rid)
                self._jobs[rid] = job
            self._wake.notify()
        if not job.done.wait(timeout):
            raise TimeoutError("synthesis timed out")
        if job.error is not None:
            raise job.error
        sr = p.mel_cfg.sampling_rate
        return sr, (np.clip(job.audio, -1.0, 1.0) * 32767.0).astype(np.int16)

    def close(self):
        with self._wake:
            self._running = False
            self._wake.notify()
        self._worker.join(timeout=10)

    # -- worker side --------------------------------------------------------

    def _loop(self):
        while True:
            with self._wake:
                while self._running and not self.cb.pending:
                    self._wake.wait(timeout=0.5)
                if not self._running:
                    return
            try:
                finished = self.cb.step(self.segment)
            except Exception as e:  # surface scheduler faults to all waiters
                with self._lock:
                    for job in set(self._jobs.values()):
                        job.error = e
                        job.done.set()
                    self._jobs.clear()
                continue
            for rid, toks in finished.items():
                with self._lock:
                    job = self._jobs.pop(rid, None)
                if job is None:
                    continue
                job.tokens[rid] = toks
                if len(job.tokens) == len(job.rids):
                    try:
                        job.audio = self._finish(job)
                    except Exception as e:
                        job.error = e
                    job.done.set()

    def _finish(self, job: _Job) -> np.ndarray:
        """S2-decode every segment of a completed job (one batched call,
        same path as TTSPipeline._synthesize_batch's tail)."""
        p = self.pipeline
        ref = job.ref
        segs = job.segments
        b = len(segs)
        tok_list = [job.tokens[r] for r in job.rids]
        lengths = np.asarray([len(t) for t in tok_list], np.int32)
        # same effective codes width as _synthesize_batch: the bucket is
        # clipped at the decode cap (generate's tokens array is max_new
        # wide, so its `tokens[:, :tc]` slice never exceeds it)
        tc = min(_next_bucket(int(lengths.max())), self.cb.max_new)
        codes = np.zeros((b, tc), np.int32)
        for i, t in enumerate(tok_list):
            codes[i, : len(t)] = t
        tx_max = _next_bucket(max(len(s["phones"]) for s in segs))
        refer_spec = jnp.asarray(ref.refer_spec[None].repeat(b, axis=0))
        refer_lens = jnp.full((b,), ref.refer_spec.shape[0], jnp.int32)
        sv = jnp.asarray(ref.sv_emb[None].repeat(b, axis=0)) if ref.sv_emb is not None else None
        ge = jnp.asarray(ref.ge.repeat(b, axis=0)) if ref.ge is not None else None
        wav = p._s2_decode(
            getattr(p, "_s2_call_params", p.s2_params),
            jnp.asarray(codes), jnp.asarray(lengths),
            jnp.asarray(phones_right(segs, tx_max)),
            jnp.asarray([len(s["phones"]) for s in segs], jnp.int32),
            refer_spec, refer_lens, speed=job.speed, sv_emb=sv, ge=ge,
        )
        wav = np.asarray(wav)[..., 0]
        hop_up = int(np.prod(p.s2.cfg.upsample_rates))
        sr = p.mel_cfg.sampling_rate
        silence = np.zeros(int(sr * p.cfg.fragment_interval), np.float32)
        pieces = []
        for i in range(b):
            n_samples = int(lengths[i]) * 2 * hop_up
            pieces.append(wav[i, :n_samples])
            pieces.append(silence)
        return np.concatenate(pieces[:-1]) if pieces else np.zeros(0, np.float32)
