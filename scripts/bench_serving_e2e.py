"""End-to-end serving bench: the SHIPPED surfaces, production size, 1 chip.

Round-4 verdict: "the shipped serving path doesn't deliver the benched
numbers". This bench closes that loop by driving only public surfaces:

  1. `TTSPipeline.run` — v2ProPlus RTF on the bench.py workload (one
     120-phone segment, 500-token decode via the early_stop_num bench
     knob). Must land within 10% of bench.py's chained-stage number.
  2. `TTSPipeline.run_streaming` — TTFB through the pipeline.
  3. continuous mode over REAL HTTP — ContinuousTTSService behind
     api.serve(), N concurrent clients, measured audio-s/s out of the
     wire (wav bytes), plus probe latency under full load.

All stages run production-size models with random weights (no pretrained
checkpoints in this environment; shapes/dtypes determine throughput).
Prints one JSON line; archived as benchmarks/BENCH_serving_e2e_r05.json.
"""

import functools
import json
import os
import sys
import threading
import time
import urllib.parse
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SLOTS = int(os.environ.get("GSVT_E2E_SLOTS", "16"))
SEGMENT = int(os.environ.get("GSVT_E2E_SEGMENT", "50"))
N_CLIENTS = int(os.environ.get("GSVT_E2E_CLIENTS", "32"))
PORT = int(os.environ.get("GSVT_E2E_PORT", "19931"))

# ~120 phonemes through the en g2p — the bench.py workload shape
TEXT_120 = (
    "The quick brown fox jumps over the lazy dog while seventeen curious "
    "researchers measure everything about the resulting motion pattern"
)


def build_pipeline(version: str):
    from gpt_sovits_tpu.infer.pipeline import TTSPipeline
    from gpt_sovits_tpu.models.hubert import HubertConfig, HubertEncoder
    from gpt_sovits_tpu.models.t2s import T2SDecoder
    from gpt_sovits_tpu.models.vits import SynthesizerTrn
    from gpt_sovits_tpu.utils.config import InferenceConfig, S1Config, s2_config_for_version

    key = jax.random.PRNGKey(0)
    s1 = T2SDecoder(S1Config(), dtype=jnp.bfloat16)
    s1_params = jax.jit(functools.partial(s1.init, method=T2SDecoder.init_all))(key)
    s2_cfg = s2_config_for_version(version)
    s2 = SynthesizerTrn(s2_cfg)
    sv_emb = jax.random.normal(key, (1, 20480), jnp.float32) if s2_cfg.is_pro else None
    s2_params = jax.jit(functools.partial(s2.init, method=SynthesizerTrn.init_all))(
        {"params": key, "noise": key, "slice": key},
        jnp.zeros((1, 100, s2_cfg.ssl_dim)),
        jax.random.normal(key, (1, 250, s2_cfg.spec_channels)) * 0.3 + 1.0,
        jnp.full((1,), 250, jnp.int32),
        jnp.zeros((1, 64), jnp.int32), jnp.full((1,), 64, jnp.int32),
        sv_emb=sv_emb,
    )
    hub = HubertEncoder(HubertConfig())
    hub_params = jax.jit(hub.init)(key, jnp.zeros((1, 16000)))
    sv_model = sv_params = None
    if s2_cfg.is_pro:
        from gpt_sovits_tpu.models.eres2net import ERes2NetV2, kaldi_fbank

        sv_model = ERes2NetV2()
        sv_params = jax.jit(sv_model.init)(key, kaldi_fbank(jnp.zeros((1, 16000))))
    return TTSPipeline(
        s1_model=s1, s1_params=s1_params, s2_model=s2, s2_params=s2_params,
        hubert_model=hub, hubert_params=hub_params,
        sv_model=sv_model, sv_params=sv_params,
        infer_cfg=InferenceConfig(version=version),
    )


def bench_pipeline_rtf(pipe, n_iter=6):
    """run() on the bench.py workload: one segment, 500 fixed tokens."""
    # warmup/compile
    sr, audio = pipe.run(TEXT_120, "en", seed=1, cut_method="cut0",
                         max_sec=20, early_stop_num=500)
    times = []
    lens = []
    for i in range(n_iter):
        t0 = time.perf_counter()
        sr, audio = pipe.run(TEXT_120, "en", seed=2 + i, cut_method="cut0",
                             max_sec=20, early_stop_num=500)
        times.append(time.perf_counter() - t0)
        lens.append(len(audio) / sr)
    return float(np.mean(times)), float(np.mean(lens)), sr


def bench_ttfb(pipe, n_iter=5):
    ttfbs = []
    for i in range(n_iter):
        for _ in pipe.run_streaming(
            "First sentence spoken now. A second sentence follows it. And then a third one arrives.",
            "en", seed=10 + i, max_sec=8,
        ):
            pass
        ttfbs.append(pipe.last_ttfb)
    return float(np.median(ttfbs))


def bench_continuous_http(pipe, ref_path):
    from gpt_sovits_tpu.serve.api import TTSService, serve
    from gpt_sovits_tpu.serve.continuous_service import ContinuousTTSService

    cont = ContinuousTTSService(
        pipe, slots=SLOTS, segment=SEGMENT, tx_max=256, tp_max=256, max_new=500,
    )
    svc = TTSService(pipe, continuous=cont)
    server = serve(svc, port=PORT)
    base = dict(text=TEXT_120, text_lang="en", ref_audio_path=ref_path)

    def get(params, timeout=600):
        q = urllib.parse.urlencode(params)
        t0 = time.perf_counter()
        with urllib.request.urlopen(f"http://127.0.0.1:{PORT}/tts?{q}", timeout=timeout) as r:
            body = r.read()
        return time.perf_counter() - t0, body

    # warmup: compile prefill/segment/S2 (all buckets the load will touch)
    get(dict(base, seed="1"))

    sr = pipe.mel_cfg.sampling_rate
    results = []
    lock = threading.Lock()

    def client(i):
        lat, body = get(dict(base, seed=str(100 + i)))
        with lock:
            results.append((lat, (len(body) - 44) / 2 / sr))  # wav header = 44 B

    threads = [threading.Thread(target=client, args=(i,)) for i in range(N_CLIENTS)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    # probe under full load: issued midway, measures admission latency
    time.sleep(1.0)
    probe_lat, probe_body = get(dict(base, seed="999"))
    for t in threads:
        t.join(timeout=900)
    wall = time.perf_counter() - t0
    audio_s = sum(a for _, a in results) + (len(probe_body) - 44) / 2 / sr
    lats = sorted(lat for lat, _ in results)
    out = {
        "throughput_audio_s_per_s": round(audio_s / wall, 1),
        "n_clients": N_CLIENTS,
        "slots": SLOTS,
        "segment_tokens": SEGMENT,
        "wall_s": round(wall, 2),
        "audio_s_total": round(audio_s, 1),
        "latency_p50_s": round(lats[len(lats) // 2], 2),
        "latency_p95_s": round(lats[int(len(lats) * 0.95)], 2),
        "probe_latency_s": round(probe_lat, 2),
    }
    server.shutdown()
    cont.close()
    return out


def main():
    from gpt_sovits_tpu.dsp.audio_io import save_wav

    rng = np.random.default_rng(0)
    ref_path = "/tmp/gsvt_bench_ref.wav"
    save_wav(ref_path, (rng.standard_normal(32000 * 5) * 0.1).astype(np.float32), 32000)

    # --- continuous HTTP throughput on v2 (the serving-throughput config) ---
    pipe_v2 = build_pipeline("v2")
    pipe_v2.set_ref_audio(ref_path)
    http = bench_continuous_http(pipe_v2, ref_path)

    # --- pipeline.run RTF on v2ProPlus (the bench.py headline config) ---
    pipe_pp = build_pipeline("v2ProPlus")
    pipe_pp.set_ref_audio(ref_path)
    utt_s, audio_s, sr = bench_pipeline_rtf(pipe_pp)
    rtf = utt_s / audio_s
    ttfb = bench_ttfb(pipe_pp)

    # fresh bench.py twin (same code, same chip, same quant defaults) —
    # reading an archived BENCH_r*.json would compare against a stale build
    bench_py = None
    try:
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            capture_output=True, text=True, timeout=900,
            env=dict(os.environ, GSVT_SKIP_CONTRACTS="1"),
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        parsed = json.loads(line)
        # like-for-like: the e2e row includes the int16 wav fetch that
        # pipeline.run must pay; the plain utterance row stops at
        # block_until_ready
        bench_py = parsed.get(
            "e2e_utterance_s_v2proplus", parsed["utterance_s"]["v2ProPlus"]
        ) / 20.0
    except Exception:
        pass

    out = {
        "metric": "serving_e2e_1chip",
        "value": http["throughput_audio_s_per_s"],
        "unit": "audio_s_per_s_http_continuous",
        "http_continuous": http,
        "pipeline_rtf_v2proplus": round(rtf, 5),
        "pipeline_utterance_s": round(utt_s, 4),
        "pipeline_audio_s": round(audio_s, 2),
        "bench_py_rtf_v2proplus": round(bench_py, 5) if bench_py else None,
        "pipeline_vs_bench_py": round(rtf / bench_py, 3) if bench_py else None,
        "streaming_ttfb_s": round(ttfb, 4),
        "hardware": "TPU v5e (1 chip, attached via tunnel)",
        "note": "all numbers through shipped surfaces: pipeline.run / run_streaming / HTTP /tts with continuous batching; int16 wire, int8 S1 weights+KV by default on TPU",
    }
    print(json.dumps(out))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "benchmarks", "BENCH_serving_e2e_r05.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
