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


# ---------------------------------------------------------------------------
# hardening: artifact ledger, stale detection, crash recovery, resume
# (reference check_training_status_from_files / _clean_training_artifacts /
#  invalidate_processing_status, server/training_service.py:754-935)
# ---------------------------------------------------------------------------


def _artifact_steps(record=None, block=None, crash_in=None):
    """Fake steps that write real artifacts, optionally blocking or raising."""
    import os
    import threading as _t

    record = record if record is not None else []

    def prepare(manifest, exp_dir):
        record.append("prepare")
        if crash_in == "prepare":
            raise RuntimeError("boom in prepare")
        os.makedirs(exp_dir, exist_ok=True)
        with open(os.path.join(exp_dir, "2-name2text.txt"), "w") as f:
            f.write("a\tphones\n")
        with open(os.path.join(exp_dir, "6-name2semantic.tsv"), "w") as f:
            f.write("a\t1 2 3\n")
        for sub in ("4-cnhubert", "5-wav32k"):
            os.makedirs(os.path.join(exp_dir, sub), exist_ok=True)
            with open(os.path.join(exp_dir, sub, "a.bin"), "w") as f:
                f.write("x")

    def train_s2(exp_dir, ckpt_dir):
        record.append("train_s2")
        if block is not None:
            block.wait(10)
        if crash_in == "train_s2":
            # simulate crash mid-write: partial artifact then death
            os.makedirs(ckpt_dir, exist_ok=True)
            with open(os.path.join(ckpt_dir, "s2G-e1.pth"), "w") as f:
                f.write("partial")
            raise RuntimeError("boom in train_s2")
        os.makedirs(ckpt_dir, exist_ok=True)
        with open(os.path.join(ckpt_dir, "s2G-e8.pth"), "w") as f:
            f.write("weights")

    def train_s1(exp_dir, ckpt_dir):
        record.append("train_s1")
        os.makedirs(ckpt_dir, exist_ok=True)
        with open(os.path.join(ckpt_dir, "s1-e15.ckpt"), "w") as f:
            f.write("weights")

    def synth(ckpt_dir, text, lang, ref):
        return 16000, (np.zeros(1600) + 100).astype(np.int16)

    return TrainingSteps(prepare, train_s2, train_s1, synth), record


def _mk_char(svc, tmp, name):
    from gpt_sovits_tpu.dsp.audio_io import save_wav as _sw

    svc.store.create(name)
    rng = np.random.default_rng(0)
    seg = (rng.standard_normal(16000 * 3) * 0.3).astype(np.float32)
    wav = tmp / f"{name}.wav"
    _sw(str(wav), seg, 16000)
    svc.store.add_audio(name, "up.wav", open(wav, "rb").read())
    svc.store.write_manifest(name, [("up_0000.wav", "en", "hello")])


def _wait_state(svc, name, states, timeout=60.0):
    # generous: instant on the pass path, but under a loaded xdist run
    # (16 workers compiling XLA) the worker thread can be starved for
    # seconds — 5 s flaked (round 5)
    t0 = time.time()
    while time.time() - t0 < timeout:
        st = svc.training_status(name)
        if st.get("state") in states:
            return st
        time.sleep(0.02)
    return svc.training_status(name)


def test_resume_skips_completed_steps(tmp_path):
    steps, record = _artifact_steps()
    svc = TrainingService(str(tmp_path / "c"), steps)
    _mk_char(svc, tmp_path, "a")
    svc.start_training("a")
    st = _wait_state(svc, "a", ("trained", "failed"))
    assert st["state"] == "trained"
    assert record == ["prepare", "train_s2", "train_s1"]
    chk = svc.check_training_status("a")
    assert chk["valid"] and all(v == "completed" for v in chk["steps"].values()), chk

    # re-run: everything completed and inputs unchanged -> nothing re-runs
    svc.start_training("a")
    _wait_state(svc, "a", ("trained", "failed"))
    assert record == ["prepare", "train_s2", "train_s1"]


def test_crash_midstep_cleanup_and_resume(tmp_path):
    steps, record = _artifact_steps(crash_in="train_s2")
    svc = TrainingService(str(tmp_path / "c"), steps)
    _mk_char(svc, tmp_path, "a")
    svc.start_training("a")
    st = _wait_state(svc, "a", ("trained", "failed"))
    assert st["state"] == "failed" and "train_s2" in st["error"]
    # partial s2 artifact exists but no ledger entry -> "partial"
    chk = svc.check_training_status("a")
    assert chk["steps"]["prepare"] == "completed"
    assert chk["steps"]["train_s2"] == "partial"
    assert not chk["valid"]

    # resume with a fixed step impl: prepare skipped, s2 partial cleaned+rerun
    good, record2 = _artifact_steps()
    svc.steps = good
    svc.start_training("a")
    st = _wait_state(svc, "a", ("trained", "failed"))
    assert st["state"] == "trained"
    assert record2 == ["train_s2", "train_s1"], record2  # prepare NOT re-run
    import os

    ck = os.path.join(svc.store.path("a"), "ckpt")
    assert "s2G-e1.pth" not in os.listdir(ck)  # partial artifact removed
    assert "s2G-e8.pth" in os.listdir(ck)


def test_orphaned_training_state_reconciled(tmp_path):
    steps, _ = _artifact_steps()
    svc = TrainingService(str(tmp_path / "c"), steps)
    _mk_char(svc, tmp_path, "a")
    # simulate a dead worker: status says training, but no live thread
    svc.store.set_status("a", state="training", step="train_s2")
    st = svc.training_status("a")
    assert st["state"] == "interrupted"
    # and a fresh start is allowed afterwards
    svc.start_training("a")
    st = _wait_state(svc, "a", ("trained", "failed"))
    assert st["state"] == "trained"


def test_dataset_change_marks_steps_stale(tmp_path):
    steps, record = _artifact_steps()
    svc = TrainingService(str(tmp_path / "c"), steps)
    _mk_char(svc, tmp_path, "a")
    svc.start_training("a")
    assert _wait_state(svc, "a", ("trained", "failed"))["state"] == "trained"

    # add another dataset file -> signature changes -> steps stale
    import os

    ds = os.path.join(svc.store.path("a"), "dataset")
    with open(os.path.join(ds, "extra.wav"), "wb") as f:
        f.write(b"RIFF0000WAVE")
    chk = svc.check_training_status("a")
    assert all(v == "stale" for v in chk["steps"].values()), chk
    assert not chk["valid"]
    assert svc.store.status("a")["state"] == "outdated"

    # retraining re-runs everything (stale steps cleaned first)
    svc.start_training("a")
    assert _wait_state(svc, "a", ("trained", "failed"))["state"] == "trained"
    assert record == ["prepare", "train_s2", "train_s1"] * 2


def test_audio_upload_invalidates_trained(tmp_path):
    steps, _ = _artifact_steps()
    svc = TrainingService(str(tmp_path / "c"), steps)
    srv = serve_training(svc, port=0)
    host, port = srv.server_address
    base = f"http://{host}:{port}"
    try:
        _mk_char(svc, tmp_path, "a")
        svc.start_training("a")
        assert _wait_state(svc, "a", ("trained", "failed"))["state"] == "trained"
        from gpt_sovits_tpu.dsp.audio_io import save_wav as _sw

        wav = tmp_path / "more.wav"
        rng = np.random.default_rng(1)
        _sw(str(wav), (rng.standard_normal(16000 * 2) * 0.3).astype(np.float32), 16000)
        code, _, _ = _req(base + "/api/v1/characters/a/audio", "POST", open(wav, "rb").read(), "?filename=more.wav")
        assert code == 200
        assert svc.store.status("a")["state"] == "outdated"
    finally:
        srv.shutdown()
