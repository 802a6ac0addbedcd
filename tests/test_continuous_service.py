"""Continuous serving mode (serve/continuous_service.py): concurrent
requests share the S1 slot pool; output matches the batch path under
argmax decoding."""

import threading

import numpy as np
import pytest

from test_pipeline import pipeline  # tiny-model fixture  # noqa: F401


@pytest.fixture()
def service(pipeline):  # noqa: F811
    import dataclasses

    from gpt_sovits_tpu.serve.continuous_service import ContinuousTTSService

    # argmax sampling so the continuous path is comparable to run()
    pipeline.cfg = dataclasses.replace(pipeline.cfg, top_k=1)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    pipeline.set_ref_audio(wav, sr=8000)
    svc = ContinuousTTSService(pipeline, slots=2, segment=8, tx_max=64, tp_max=576, max_new=50)
    yield svc, pipeline
    svc.close()


def test_single_request_matches_batch_path(service):
    svc, pipe = service
    text = "hello there world"
    sr_c, audio_c = svc.synthesize(text, "en")
    sr_b, audio_b = pipe.run(text, "en", seed=0, max_sec=2)
    assert sr_c == sr_b
    # argmax S1 + deterministic S2 -> same waveform
    n = min(len(audio_c), len(audio_b))
    assert n > 0
    np.testing.assert_array_equal(audio_c[:n], audio_b[:n])
    assert abs(len(audio_c) - len(audio_b)) <= 1


def test_concurrent_requests_share_pool(service):
    svc, _ = service
    texts = ["hello there world", "general kenobi speaks", "a third request arrives"]
    results = {}
    errors = []

    def worker(t):
        try:
            results[t] = svc.synthesize(t, "en")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in texts]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    assert not errors, errors
    assert set(results) == set(texts)
    for sr, audio in results.values():
        assert audio.dtype == np.int16 and len(audio) > 0
        assert np.isfinite(audio.astype(np.float64)).all()


def test_requires_reference(pipeline):  # noqa: F811
    from gpt_sovits_tpu.serve.continuous_service import ContinuousTTSService

    svc = ContinuousTTSService(pipeline, slots=1, segment=4, tx_max=64, tp_max=64, max_new=32)
    try:
        pipe_ref = pipeline.ref
        pipeline.ref = None
        with pytest.raises(AssertionError):
            svc.synthesize("hi there", "en")
    finally:
        pipeline.ref = pipe_ref
        svc.close()


def test_http_continuous_mode(service, tmp_path):
    """api_v2 /tts over a real socket with continuous mode: default-
    sampling requests route through the pool; explicit-sampling requests
    fall back to the batch path."""
    import json as _json
    import urllib.parse
    import urllib.request

    from gpt_sovits_tpu.dsp.audio_io import save_wav
    from gpt_sovits_tpu.serve.api import TTSService, serve

    svc, pipe = service
    rng = np.random.default_rng(0)
    ref = tmp_path / "ref.wav"
    save_wav(str(ref), (rng.standard_normal(8000) * 0.1).astype(np.float32), 8000)
    http = TTSService(pipe, continuous=svc)
    srv = serve(http, port=0)
    host, port = srv.server_address
    try:
        q = urllib.parse.urlencode({"text": "hello over the pool", "text_lang": "en",
                                    "ref_audio_path": str(ref)})
        with urllib.request.urlopen(f"http://{host}:{port}/tts?" + q) as r:
            body = r.read()
            assert r.status == 200 and body[:4] == b"RIFF" and len(body) > 1000
        # explicit sampling -> batch path still works
        q = urllib.parse.urlencode({"text": "hello with a seed", "text_lang": "en",
                                    "ref_audio_path": str(ref), "seed": 3, "max_sec": 2})
        with urllib.request.urlopen(f"http://{host}:{port}/tts?" + q) as r:
            assert r.status == 200 and r.read()[:4] == b"RIFF"
    finally:
        srv.shutdown()


def test_explicit_sampling_stays_continuous(service):
    """Requests with explicit sampling params ride the slot pool (round 5:
    per-request traced sampling — no silent fallback to the batch path)."""
    svc, pipe = service
    sr, audio = svc.synthesize(
        "hello there world", "en",
        top_k=1, temperature=1.0, seed=3, repetition_penalty=1.35,
    )
    assert len(audio) > 0
    # same seeded request again: reproducible through the pool
    sr2, audio2 = svc.synthesize(
        "hello there world", "en",
        top_k=1, temperature=1.0, seed=3, repetition_penalty=1.35,
    )
    np.testing.assert_array_equal(audio, audio2)


def test_weight_swap_quiesces_pool(service):
    """paused_for_weight_swap drains in-flight jobs and rebuilds the
    batcher from the pipeline's (possibly swapped) S1 params."""
    svc, pipe = service
    old_cb = svc.cb
    with svc.paused_for_weight_swap():
        pass  # a loader would swap pipeline.s1_params here
    assert svc.cb is not old_cb
    sr, audio = svc.synthesize("hello again world", "en")
    assert len(audio) > 0
