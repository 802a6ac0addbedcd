"""REST client example for the TTS and training services.

Counterpart of the reference's client_example.py: exercises synthesis via
the api_v2-compatible endpoint and the character-training lifecycle.

Usage:
  python examples/rest_client.py tts --host http://127.0.0.1:9880 \
      --text "Hello world" --lang en --ref /path/ref.wav --out out.wav
  python examples/rest_client.py train --host http://127.0.0.1:9881 \
      --name alice --audio /path/long.wav --lang en --text "transcript"
"""

from __future__ import annotations

import argparse
import json
import time
import urllib.parse
import urllib.request


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, r.read()


def _post(url, data: bytes, ctype="application/json"):
    req = urllib.request.Request(url, data=data, headers={"Content-Type": ctype}, method="POST")
    with urllib.request.urlopen(req) as r:
        return r.status, r.read()


def cmd_tts(a):
    q = urllib.parse.urlencode(
        {"text": a.text, "text_lang": a.lang, "ref_audio_path": a.ref,
         "prompt_text": a.ref_text or "", "seed": a.seed}
    )
    code, body = _get(f"{a.host}/tts?{q}")
    assert code == 200, body
    with open(a.out, "wb") as f:
        f.write(body)
    print(f"wrote {a.out} ({len(body)} bytes)")


def cmd_train(a):
    base = f"{a.host}/api/v1"
    _post(f"{base}/characters", json.dumps({"name": a.name}).encode())
    with open(a.audio, "rb") as f:
        code, body = _post(f"{base}/characters/{a.name}/audio?filename=upload.wav", f.read(), "audio/wav")
    n = json.loads(body)["slices"]
    print(f"uploaded, {n} slices")
    entries = [[f"upload_{i:04d}.wav", a.lang, a.text] for i in range(n)]
    _post(f"{base}/characters/{a.name}/manifest", json.dumps({"entries": entries}).encode())
    _post(f"{base}/characters/{a.name}/training/start", b"")
    while True:
        code, body = _get(f"{base}/characters/{a.name}/training/status")
        st = json.loads(body)
        print("status:", st.get("state"), st.get("step"))
        if st.get("state") in ("trained", "failed"):
            break
        time.sleep(5)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("tts")
    t.add_argument("--host", default="http://127.0.0.1:9880")
    t.add_argument("--text", required=True)
    t.add_argument("--lang", default="auto")
    t.add_argument("--ref", required=True)
    t.add_argument("--ref-text")
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--out", default="out.wav")
    t.set_defaults(fn=cmd_tts)
    tr = sub.add_parser("train")
    tr.add_argument("--host", default="http://127.0.0.1:9881")
    tr.add_argument("--name", required=True)
    tr.add_argument("--audio", required=True)
    tr.add_argument("--lang", default="en")
    tr.add_argument("--text", required=True)
    tr.set_defaults(fn=cmd_train)
    a = p.parse_args()
    a.fn(a)


if __name__ == "__main__":
    main()
