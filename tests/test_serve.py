"""HTTP API tests: full request path over a real socket with the tiny
pipeline from test_pipeline."""

import json
import urllib.parse
import urllib.request

import numpy as np
import pytest

from gpt_sovits_tpu.dsp.audio_io import save_wav
from gpt_sovits_tpu.serve.api import TTSService, serve, wav_bytes

from test_pipeline import pipeline  # tiny-model fixture  # noqa: F401


@pytest.fixture(scope="module")
def server(pipeline, tmp_path_factory):  # noqa: F811
    rng = np.random.default_rng(0)
    ref = tmp_path_factory.mktemp("serve") / "ref.wav"
    save_wav(str(ref), (rng.standard_normal(8000) * 0.1).astype(np.float32), 8000)
    swaps = []
    service = TTSService(pipeline, weight_loader=lambda which, path: swaps.append((which, path)))
    srv = serve(service, port=0)
    host, port = srv.server_address
    yield f"http://{host}:{port}", str(ref), swaps
    srv.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def test_health(server):
    base, _, _ = server
    code, body, _ = _get(base + "/health")
    assert code == 200 and json.loads(body)["status"] == "ok"


def test_tts_get_wav(server):
    base, ref, _ = server
    q = urllib.parse.urlencode(
        {"text": "Hello there world", "text_lang": "en", "ref_audio_path": ref, "seed": 3, "max_sec": 2}
    )
    code, body, ctype = _get(base + "/tts?" + q)
    assert code == 200, body
    assert ctype == "audio/wav"
    assert body[:4] == b"RIFF"
    assert len(body) > 1000


def test_tts_post_json_raw(server):
    base, ref, _ = server
    req = urllib.request.Request(
        base + "/tts",
        data=json.dumps(
            {"text": "Short test", "text_lang": "en", "ref_audio_path": ref, "media_type": "raw", "seed": 1}
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers.get("Content-Type") == "audio/raw"
        assert len(r.read()) > 500


def test_tts_validation_errors(server):
    base, ref, _ = server
    code, body, _ = _get(base + "/tts?text=hi&text_lang=en")
    assert code == 400 and b"ref_audio_path" in body
    q = urllib.parse.urlencode({"text": "hi", "text_lang": "xx", "ref_audio_path": ref})
    code, body, _ = _get(base + "/tts?" + q)
    assert code == 400 and b"not supported" in body
    q = urllib.parse.urlencode(
        {"text": "hi there", "text_lang": "en", "ref_audio_path": ref, "text_split_method": "cut99"}
    )
    code, body, _ = _get(base + "/tts?" + q)
    assert code == 400 and b"cut99" in body


def test_set_weights_endpoint(server):
    base, _, swaps = server
    code, body, _ = _get(base + "/set_gpt_weights?weights_path=/tmp/x.npz")
    assert code == 200 and json.loads(body)["message"] == "success"
    assert swaps[-1] == ("gpt", "/tmp/x.npz")


def test_wav_bytes_header():
    b = wav_bytes(np.zeros(100, np.int16), 32000)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    assert len(b) == 44 + 200


def test_tts_streaming_mode(server):
    base, ref, _ = server
    q = urllib.parse.urlencode(
        {"text": "First sentence. Second one!", "text_lang": "en", "ref_audio_path": ref,
         "seed": 4, "streaming_mode": "true"}
    )
    with urllib.request.urlopen(base + "/tts?" + q) as r:
        assert r.status == 200
        data = r.read()
    assert data[:4] == b"RIFF"
    # streaming header declares zero length; actual PCM follows
    import struct
    declared = struct.unpack("<I", data[40:44])[0]
    assert declared == 0
    assert len(data) > 44 + 1000


def test_legacy_api_contract(server):
    """Legacy api.py endpoints: /change_refer + GET '/' with query params."""
    base, ref, _ = server

    # no default ref and no params -> 400 (api.py:1115-1129)
    code, body, _c = _get(base + "/?" + urllib.parse.urlencode({"text": "hi there", "text_language": "en"}))
    assert code == 400

    # set a default reference (api.py handle_change)
    q = urllib.parse.urlencode({"refer_wav_path": ref, "prompt_text": "hello ref", "prompt_language": "en"})
    code, body, _c = _get(base + "/change_refer?" + q)
    assert code == 200 and json.loads(body)["code"] == 0

    # legacy GET / now synthesizes with the default reference
    q = urllib.parse.urlencode({"text": "hello there. nice day.", "text_language": "en", "cut_punc": ".", "top_k": 5})
    code, body, _c = _get(base + "/?" + q)
    assert code == 200 and body[:4] == b"RIFF"

    # display-name language mapping
    q = urllib.parse.urlencode({"text": "good morning", "text_language": "英文"})
    code, body, _c = _get(base + "/?" + q)
    assert code == 200 and body[:4] == b"RIFF"

def test_set_refer_audio_endpoint(server, tmp_path):
    """GET /set_refer_audio pre-sets the reference (api_v2.py:441-448)."""
    base, ref, _ = server
    code, body, _ = _get(base + "/set_refer_audio?" + urllib.parse.urlencode({"refer_audio_path": ref}))
    assert code == 200 and json.loads(body)["message"] == "success"
    # bad path -> 400 with Exception payload (api_v2 contract)
    code, body, _ = _get(base + "/set_refer_audio?refer_audio_path=/nonexistent.wav")
    assert code == 400 and b"Exception" in body


def test_tts_with_aux_ref_audio_paths(server, tmp_path):
    """aux_ref_audio_paths: multi-reference tone fusion through the API;
    missing aux paths are skipped like the reference (TTS.py:1106)."""
    rng = np.random.default_rng(5)
    aux = tmp_path / "aux.wav"
    save_wav(str(aux), (rng.standard_normal(6000) * 0.2).astype(np.float32), 8000)
    base, ref, _ = server
    req = urllib.request.Request(
        base + "/tts",
        data=json.dumps({
            "text": "Aux fusion test", "text_lang": "en", "ref_audio_path": ref,
            "aux_ref_audio_paths": [str(aux), "/missing/skipped.wav"], "seed": 2,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.read()[:4] == b"RIFF"
    # GET form: comma-separated list
    q = urllib.parse.urlencode({
        "text": "Aux fusion get", "text_lang": "en", "ref_audio_path": ref,
        "aux_ref_audio_paths": str(aux), "seed": 2,
    })
    code, body, _ = _get(base + "/tts?" + q)
    assert code == 200 and body[:4] == b"RIFF"


def test_tts_media_type_ogg_aac(server, monkeypatch):
    """ogg/aac media types (reference packers api_v2.py:176-233): encoded
    via adapters when an encoder exists, documented 400 otherwise."""
    import gpt_sovits_tpu.serve.api as api_mod

    base, ref, _ = server
    # no soundfile/ffmpeg in this image -> documented 400
    q = urllib.parse.urlencode(
        {"text": "Hi", "text_lang": "en", "ref_audio_path": ref, "media_type": "ogg", "seed": 1}
    )
    code, body, _ = _get(base + "/tts?" + q)
    assert code == 400 and (b"soundfile" in body or b"ffmpeg" in body)
    # bogus format still rejected up front
    q = urllib.parse.urlencode(
        {"text": "Hi", "text_lang": "en", "ref_audio_path": ref, "media_type": "mp9"}
    )
    code, body, _ = _get(base + "/tts?" + q)
    assert code == 400 and b"not supported" in body
    # wired through when an encoder is present (packer stub)
    monkeypatch.setitem(api_mod._PACKERS, "ogg", lambda a, sr: b"OggS" + a.tobytes()[:64])
    q = urllib.parse.urlencode(
        {"text": "Hi", "text_lang": "en", "ref_audio_path": ref, "media_type": "ogg", "seed": 1}
    )
    code, body, ctype = _get(base + "/tts?" + q)
    assert code == 200 and ctype == "audio/ogg" and body[:4] == b"OggS"


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def test_speaker_registry(server):
    """Legacy api.py speaker_list equivalent (api.py:358-369,843-850):
    register named weight sets + per-speaker default reference, switch
    via the `spk` request param."""
    base, ref, swaps = server
    # empty registry
    code, body, _ = _get(base + "/speakers")
    assert code == 200 and json.loads(body)["speakers"] == {}
    # register requires a name; weight paths must exist
    code, body, _ = _post(base + "/speakers", {"gpt_weights": "/tmp/x.npz"})
    assert code == 400 and b"name" in body
    code, body, _ = _post(base + "/speakers", {"name": "alice", "gpt_weights": "/nonexistent/w.npz"})
    assert code == 400 and b"not found" in body
    # register a speaker whose entry carries a default reference
    code, body, _ = _post(
        base + "/speakers",
        {"name": "alice", "refer_wav_path": ref, "prompt_text": "hi", "prompt_language": "en"},
    )
    assert code == 200, body
    code, body, _ = _get(base + "/speakers")
    listing = json.loads(body)
    assert "alice" in listing["speakers"]
    # unknown speaker -> 400
    q = urllib.parse.urlencode({"text": "hello", "text_lang": "en", "ref_audio_path": ref, "spk": "bob"})
    code, body, _ = _get(base + "/tts?" + q)
    assert code == 400 and b"unknown speaker" in body
    # spk fills the missing reference from the registry entry
    q = urllib.parse.urlencode({"text": "hello there", "text_lang": "en", "spk": "alice", "seed": 5})
    code, body, ctype = _get(base + "/tts?" + q)
    assert code == 200, body
    assert body[:4] == b"RIFF"
    code, body, _ = _get(base + "/speakers")
    assert json.loads(body)["current"] == "alice"


def test_speaker_weight_swap(server, tmp_path):
    base, ref, swaps = server
    w = tmp_path / "bob_s1.npz"
    w.write_bytes(b"x")
    code, body, _ = _post(
        base + "/speakers",
        {"name": "bob", "gpt_weights": str(w), "refer_wav_path": ref, "prompt_text": "hi", "prompt_language": "en"},
    )
    assert code == 200, body
    n_swaps = len(swaps)
    q = urllib.parse.urlencode({"text": "switch voices now", "text_lang": "en", "spk": "bob", "seed": 2})
    code, body, _ = _get(base + "/tts?" + q)
    assert code == 200, body
    assert ("gpt", str(w)) in swaps[n_swaps:]
    # same speaker again: no second swap
    n_swaps = len(swaps)
    code, body, _ = _get(base + "/tts?" + q)
    assert code == 200, body
    assert len(swaps) == n_swaps


def test_tts_mixed_language_zh_mode(server, monkeypatch):
    """text_lang=zh on text with embedded English must route latin runs to
    the en g2p (reference get_phones_and_bert, TextPreprocessor.py:158-169)
    and still produce audio over the full api_v2 contract."""
    import urllib.parse

    from gpt_sovits_tpu.infer import pipeline as pl

    seen = []
    orig = pl.runs_for_language

    def spy(text, language):
        runs = orig(text, language)
        seen.append((language, runs))
        return runs

    monkeypatch.setattr(pl, "runs_for_language", spy)
    base, ref, _ = server
    q = urllib.parse.urlencode(
        {"text": "我在用iPhone工作", "text_lang": "zh", "ref_audio_path": ref, "seed": 3, "max_sec": 2}
    )
    code, body, ctype = _get(base + "/tts?" + q)
    assert code == 200, body
    assert ctype == "audio/wav" and body[:4] == b"RIFF"
    zh_calls = [runs for lang, runs in seen if lang == "zh"]
    assert zh_calls, f"no zh-mode segmentation observed: {seen}"
    langs = [r["lang"] for r in zh_calls[0]]
    assert "en" in langs and "zh" in langs, langs


def test_gui_client_core(server, tmp_path):
    """The desktop client's REST core (serve/gui_client.py TTSClient) —
    counterpart of the reference PyQt client (inference_gui.py) — against
    the live test server: health, weight swap, synthesis to file."""
    from gpt_sovits_tpu.serve.gui_client import TTSClient, synthesize_to_file

    base, ref, swaps = server
    c = TTSClient(base)
    assert c.health()
    ok, _ = c.set_gpt_weights("/tmp/some_weights.ckpt")
    assert ok and swaps[-1] == ("gpt", "/tmp/some_weights.ckpt")
    out = synthesize_to_file(
        c, str(tmp_path / "gui_out.wav"),
        text="hello from the desktop client", text_lang="en",
        ref_audio_path=ref, seed=3, max_sec=2,
    )
    with open(out, "rb") as f:
        data = f.read()
    assert data[:4] == b"RIFF" and len(data) > 1000
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        synthesize_to_file(c, str(tmp_path / "x.wav"), text="", text_lang="en", ref_audio_path=ref)
