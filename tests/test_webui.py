"""Master webui panel tests (serve/webui.py — reference webui.py equivalent):
page serving, background jobs with logs, real slice/denoise jobs, one-click
chaining, label editing over a .list manifest."""

import json
import os
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from gpt_sovits_tpu.dsp.audio_io import save_wav
from gpt_sovits_tpu.serve.webui import JobRunner, serve_webui


@pytest.fixture()
def panel():
    srv = serve_webui(port=0)
    host, port = srv.server_address
    yield f"http://{host}:{port}"
    srv.shutdown()


def _req(base, path, method="GET", data=None):
    req = urllib.request.Request(base + path, data=data, method=method)
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def _wait_job(base, job_id, timeout=60):
    for _ in range(timeout * 10):
        _, body = _req(base, f"/api/jobs/{job_id}")
        j = json.loads(body)
        if j["state"] != "running":
            return j
        time.sleep(0.1)
    raise TimeoutError(job_id)


def test_page_and_unknown_routes(panel):
    code, body = _req(panel, "/")
    assert code == 200 and b"control panel" in body
    code, _ = _req(panel, "/api/nope")
    assert code == 404
    code, _ = _req(panel, "/api/run/nope", "POST", b"{}")
    assert code == 404


def test_job_runner_logs_and_failure():
    r = JobRunner()
    jid = r.start("boom", lambda log: (log("starting"), 1 / 0))
    for _ in range(100):
        if r.get(jid)["state"] != "running":
            break
        time.sleep(0.05)
    j = r.get(jid)
    assert j["state"] == "failed" and "ZeroDivisionError" in j["error"]
    assert j["log"] == ["starting"]
    assert r.list()[0]["id"] == jid and "log" not in r.list()[0]


def test_slice_then_denoise_jobs(panel, tmp_path):
    rng = np.random.default_rng(0)
    wav = np.concatenate([
        (rng.standard_normal(16000 * 2) * 0.3).astype(np.float32),
        np.zeros(16000, np.float32),
        (rng.standard_normal(16000 * 2) * 0.3).astype(np.float32),
    ])
    save_wav(str(tmp_path / "raw.wav"), wav, 16000)

    code, body = _req(panel, "/api/run/slice", "POST", json.dumps(
        {"input": str(tmp_path / "raw.wav"), "out_dir": str(tmp_path / "sliced")}).encode())
    assert code == 202
    j = _wait_job(panel, json.loads(body)["id"])
    assert j["state"] == "done", j["error"]
    slices = [f for f in os.listdir(tmp_path / "sliced") if f.endswith(".wav")]
    assert slices and any("slices" in line for line in j["log"])

    code, body = _req(panel, "/api/run/denoise", "POST", json.dumps(
        {"in_dir": str(tmp_path / "sliced"), "out_dir": str(tmp_path / "den")}).encode())
    j = _wait_job(panel, json.loads(body)["id"])
    assert j["state"] == "done", j["error"]
    assert sorted(os.listdir(tmp_path / "den")) == sorted(slices)


def test_prepare_job_end_to_end(panel, tmp_path):
    rng = np.random.default_rng(1)
    save_wav(str(tmp_path / "u0.wav"), (rng.standard_normal(16000) * 0.2).astype(np.float32), 16000)
    manifest = tmp_path / "files.list"
    manifest.write_text(f"{tmp_path / 'u0.wav'}|spk|en|hello panel test\n")
    code, body = _req(panel, "/api/run/prepare", "POST", json.dumps(
        {"list": str(manifest), "exp_dir": str(tmp_path / "exp")}).encode())
    assert code == 202
    j = _wait_job(panel, json.loads(body)["id"], timeout=120)
    assert j["state"] == "done", j["error"]
    assert os.path.exists(tmp_path / "exp" / "2-name2text.txt")


def test_label_editing(panel, tmp_path):
    lst = tmp_path / "files.list"
    lst.write_text("/a.wav|spk|ZH|你好\n/b.wav|spk|EN|hi there\n", encoding="utf-8")
    code, body = _req(panel, f"/api/labels?list={lst}")
    assert code == 200 and len(json.loads(body)["labels"]) == 2

    code, body = _req(panel, "/api/labels", "POST", json.dumps(
        {"list": str(lst), "index": 1, "text": "hi | edited", "lang": "en"}).encode())
    assert code == 200
    labels = json.loads(body)["labels"]
    assert labels[1]["text"] == "hi   edited" and labels[1]["lang"] == "en"

    code, body = _req(panel, "/api/labels", "POST", json.dumps(
        {"list": str(lst), "index": 0, "delete": True}).encode())
    assert len(json.loads(body)["labels"]) == 1
    assert "edited" in lst.read_text()

    code, _ = _req(panel, "/api/labels", "POST", json.dumps(
        {"list": str(lst), "index": 99, "delete": True}).encode())
    assert code == 400


def test_i18n_page_rendering():
    """Locale maps are injected into the page (ref tools/i18n/): lang query
    param or Accept-Language selects zh/ja/ko; unknown falls back to en."""
    from gpt_sovits_tpu.serve.webui import _render_page
    from gpt_sovits_tpu.utils.i18n import I18nAuto, resolve_language

    assert resolve_language("zh") == "zh_CN"
    assert resolve_language("ja-JP") == "ja_JP"
    assert resolve_language("ko") == "ko_KR"
    assert resolve_language("fr_FR") == "fr_FR"  # now a real locale
    assert resolve_language("xx_XX") == "en_US"
    assert I18nAuto("zh_CN")("Training") == "训练"
    assert I18nAuto("ja")("Jobs") == "ジョブ"
    assert I18nAuto("ko")("Run") == "실행"
    assert I18nAuto("en")("Training") == "Training"
    for lang, probe in [("zh_CN", "控制面板"), ("ja_JP", "コントロールパネル"), ("ko_KR", "제어판")]:
        page = _render_page(lang)
        assert probe in page
        assert "const tr" in page and "__I18N_JSON__" not in page
