"""Training REST service tests: CRUD, upload+slice, orchestration, status,
inference — over a real socket with fake training steps."""

import json
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from gpt_sovits_tpu.dsp.audio_io import save_wav
from gpt_sovits_tpu.serve.training_service import TrainingService, TrainingSteps, serve_training


@pytest.fixture()
def service(tmp_path):
    calls = []

    def fake_prepare(manifest, exp_dir):
        calls.append(("prepare", manifest))

    def fake_s2(exp_dir, ckpt_dir):
        calls.append(("train_s2", ckpt_dir))

    def fake_s1(exp_dir, ckpt_dir):
        calls.append(("train_s1", ckpt_dir))

    def fake_synth(ckpt_dir, text, lang, ref):
        return 16000, (np.zeros(1600) + 100).astype(np.int16)

    svc = TrainingService(str(tmp_path / "chars"), TrainingSteps(fake_prepare, fake_s2, fake_s1, fake_synth))
    srv = serve_training(svc, port=0)
    host, port = srv.server_address
    yield f"http://{host}:{port}", svc, calls, tmp_path
    srv.shutdown()


def _req(url, method="GET", data=None, query=""):
    req = urllib.request.Request(url + query, data=data, method=method)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def test_character_lifecycle(service):
    base, svc, calls, tmp = service
    code, body, _ = _req(base + "/api/v1/characters", "POST", json.dumps({"name": "alice"}).encode())
    assert code == 201
    code, body, _ = _req(base + "/api/v1/characters", "POST", json.dumps({"name": "alice"}).encode())
    assert code == 409
    code, body, _ = _req(base + "/api/v1/characters")
    assert code == 200 and body and json.loads(body)["characters"][0]["name"] == "alice"

    # upload audio -> sliced
    rng = np.random.default_rng(0)
    wav_path = tmp / "up.wav"
    seg = (rng.standard_normal(16000 * 5) * 0.3).astype(np.float32)
    audio = np.concatenate([seg, np.zeros(16000, np.float32), seg])
    save_wav(str(wav_path), audio, 16000)
    code, body, _ = _req(base + "/api/v1/characters/alice/audio", "POST", open(wav_path, "rb").read(), "?filename=up.wav")
    assert code == 200 and json.loads(body)["slices"] == 2

    # manifest
    entries = [["up_0000.wav", "en", "hello there"], ["up_0001.wav", "en", "general kenobi"]]
    code, body, _ = _req(
        base + "/api/v1/characters/alice/manifest", "POST", json.dumps({"entries": entries}).encode()
    )
    assert code == 200

    # training lifecycle
    code, body, _ = _req(base + "/api/v1/characters/alice/training/start", "POST", b"")
    assert code == 202
    for _ in range(100):
        code, body, _ = _req(base + "/api/v1/characters/alice/training/status")
        st = json.loads(body)
        if st["state"] in ("trained", "failed"):
            break
        time.sleep(0.05)
    assert st["state"] == "trained", st
    assert [c[0] for c in calls] == ["prepare", "train_s2", "train_s1"]

    # inference with auto-selected reference
    code, body, ctype = _req(
        base + "/api/v1/inference", "POST", json.dumps({"character": "alice", "text": "hi"}).encode()
    )
    assert code == 200 and ctype == "audio/wav" and body[:4] == b"RIFF"

    # delete
    code, _, _ = _req(base + "/api/v1/characters/alice", "DELETE")
    assert code == 200
    code, _, _ = _req(base + "/api/v1/characters/alice/training/status")
    assert code == 404


def test_inference_untrained_rejected(service):
    base, svc, _, _ = service
    _req(base + "/api/v1/characters", "POST", json.dumps({"name": "bob"}).encode())
    code, body, _ = _req(base + "/api/v1/inference", "POST", json.dumps({"character": "bob", "text": "x"}).encode())
    assert code == 400 and b"not trained" in body


def test_failed_step_reported(tmp_path):
    def boom(manifest, exp_dir):
        raise RuntimeError("no data")

    svc = TrainingService(str(tmp_path / "c"), TrainingSteps(boom, boom, boom))
    svc.store.create("x")
    svc.start_training("x")
    for _ in range(100):
        st = svc.training_status("x")
        if st["state"] in ("trained", "failed"):
            break
        time.sleep(0.02)
    assert st["state"] == "failed" and "no data" in st["error"]


def test_label_editing(service):
    base, svc, _, tmp = service
    _req(base + "/api/v1/characters", "POST", json.dumps({"name": "carol"}).encode())
    svc.store.write_manifest("carol", [("a.wav", "en", "hello world"), ("b.wav", "en", "oops txet")])
    code, body, _ = _req(base + "/api/v1/characters/carol/labels")
    assert code == 200
    labels = json.loads(body)["labels"]
    assert len(labels) == 2 and labels[1]["text"] == "oops txet"
    # fix label 1
    code, body, _ = _req(
        base + "/api/v1/characters/carol/labels/1", "POST", json.dumps({"text": "fixed text"}).encode()
    )
    assert code == 200 and json.loads(body)["labels"][1]["text"] == "fixed text"
    # delete label 0
    code, body, _ = _req(
        base + "/api/v1/characters/carol/labels/0", "POST", json.dumps({"delete": True}).encode()
    )
    labels = json.loads(body)["labels"]
    assert len(labels) == 1 and labels[0]["text"] == "fixed text"
    # out of range
    code, _, _ = _req(base + "/api/v1/characters/carol/labels/9", "POST", b"{}")
    assert code == 404


def test_audio_files_process_default_and_jobs(service):
    """New endpoint groups (ref training_service.py): audio files/process/
    status, default character, training check_status/clean, async inference."""
    base, svc, calls, tmp = service
    _req(base + "/api/v1/characters", "POST", json.dumps({"name": "carol"}).encode())

    # upload raw (without implicit manifest), then /audio/process re-slices
    rng = np.random.default_rng(1)
    seg = (rng.standard_normal(16000 * 3) * 0.3).astype(np.float32)
    seg[16000:20000] = 0.0  # a silence so the slicer has a cut point
    import io

    from gpt_sovits_tpu.dsp.audio_io import save_wav as _sw

    p = tmp / "raw.wav"
    _sw(str(p), seg, 16000)
    code, body, _ = _req(base + "/api/v1/characters/carol/audio", "POST", p.read_bytes(), query="?filename=raw.wav")
    assert code == 200
    code, body, _ = _req(base + "/api/v1/characters/carol/audio/process", "POST", b"{}")
    assert code == 200 and json.loads(body)["slices"] >= 1
    code, body, _ = _req(base + "/api/v1/characters/carol/audio/status")
    assert json.loads(body)["audio_state"] == "processed"
    code, body, _ = _req(base + "/api/v1/characters/carol/audio/files")
    files = json.loads(body)
    assert "raw.wav" in files["raw"] and files["dataset"]

    # delete the raw upload (dataset slices stay for inference's auto-ref)
    code, _, _ = _req(base + "/api/v1/characters/carol/audio/files/raw.wav", "DELETE")
    assert code == 200
    code, _, _ = _req(base + "/api/v1/characters/carol/audio/files/raw.wav", "DELETE")
    assert code == 404

    # default character
    code, _, _ = _req(base + "/api/v1/characters/carol/set_default", "POST", b"")
    assert code == 200
    code, body, _ = _req(base + "/api/v1/default_character")
    assert json.loads(body)["name"] == "carol"

    # check_status: no artifacts yet -> invalid
    code, body, _ = _req(base + "/api/v1/characters/carol/training/check_status", "POST", b"")
    assert code == 200 and json.loads(body)["valid"] is False

    # fake-train then async inference job
    svc.store.set_status("carol", state="trained")
    code, body, _ = _req(
        base + "/api/v1/inference", "POST",
        json.dumps({"character": "carol", "text": "hello", "async": True}).encode(),
    )
    assert code == 202
    job_id = json.loads(body)["inference_id"]
    for _ in range(50):
        code, body, _ = _req(base + f"/api/v1/inference/{job_id}")
        if json.loads(body)["status"] == "completed":
            break
        time.sleep(0.1)
    assert json.loads(body)["status"] == "completed"
    code, wav, ctype = _req(base + f"/api/v1/inference/{job_id}/download")
    assert code == 200 and ctype == "audio/wav" and wav[:4] == b"RIFF"

    # default-character inference (no "character" field)
    code, wav, _ = _req(base + "/api/v1/inference", "POST", json.dumps({"text": "hi"}).encode())
    assert code == 200 and wav[:4] == b"RIFF"

    # clean resets
    code, _, _ = _req(base + "/api/v1/characters/carol/training/clean", "POST", b"")
    assert code == 200
    assert svc.store.status("carol")["state"] == "created"


# ---------------------------------------------------------------------------
# Production step wiring (serve/training_steps.py — reference
# server/training_steps.py + service_config.py)
# ---------------------------------------------------------------------------


def test_service_config_env_overrides(monkeypatch):
    from gpt_sovits_tpu.serve.training_steps import ServiceConfig

    monkeypatch.setenv("GSVT_SERVICE_ROOT", "/tmp/chars")
    monkeypatch.setenv("GSVT_S2_EPOCHS", "3")
    monkeypatch.setenv("GSVT_VERSION", "v3")
    monkeypatch.setenv("GSVT_ASR", "false")
    cfg = ServiceConfig()
    assert cfg.root == "/tmp/chars" and cfg.s2_epochs == 3
    assert cfg.is_cfm and not cfg.is_pro
    assert cfg.asr_enabled is False


def test_manifest_text_lookup(tmp_path):
    from gpt_sovits_tpu.serve.training_steps import _manifest_text_for

    ds = tmp_path / "dataset"
    ds.mkdir()
    (ds / "files.list").write_text(f"{ds}/a_0000.wav|spk|ZH|你好世界\n{ds}/b_0001.wav|spk|EN|hello\n", encoding="utf-8")
    assert _manifest_text_for(str(ds / "b_0001.wav")) == "hello"
    assert _manifest_text_for(str(ds / "missing.wav")) is None


def test_step_wiring_routes_by_version(monkeypatch, tmp_path):
    """build_training_steps plumbs config into run_* (v2 -> GAN trainer,
    v3 -> CFM trainer) without touching real models."""
    from gpt_sovits_tpu import run as run_mod
    from gpt_sovits_tpu.serve.training_steps import ServiceConfig, build_training_steps

    calls = []
    monkeypatch.setattr(run_mod, "run_prepare", lambda m, e, **kw: calls.append(("prepare", kw["version"])))
    monkeypatch.setattr(run_mod, "run_train_s2", lambda e, c, **kw: calls.append(("s2", kw["version"], kw["pretrained_s2g"])))
    monkeypatch.setattr(run_mod, "run_train_v3", lambda e, c, **kw: calls.append(("v3", kw["version"], kw["lora_rank"])))
    monkeypatch.setattr(run_mod, "run_train_s1", lambda e, c, **kw: calls.append(("s1", kw["epochs"])))

    cfg = ServiceConfig(version="v2", pretrained_s2g="g.pth", s1_epochs=2, asr_enabled=False)
    steps = build_training_steps(cfg)
    steps.prepare("m.list", str(tmp_path))
    steps.train_s2(str(tmp_path), str(tmp_path))
    steps.train_s1(str(tmp_path), str(tmp_path))
    assert calls == [("prepare", "v2"), ("s2", "v2", "g.pth"), ("s1", 2)]

    calls.clear()
    steps = build_training_steps(ServiceConfig(version="v3", lora_rank=8, asr_enabled=False))
    steps.train_s2(str(tmp_path), str(tmp_path))
    assert calls == [("v3", "v3", 8)]


def test_synthesize_requires_trained_weights(tmp_path):
    from gpt_sovits_tpu.serve.training_steps import ServiceConfig, build_training_steps

    steps = build_training_steps(ServiceConfig(asr_enabled=False))
    with pytest.raises(RuntimeError, match="no trained weights"):
        steps.synthesize(str(tmp_path), "hi", "en", str(tmp_path / "ref.wav"))
