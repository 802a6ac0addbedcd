"""text/g2pw.py: polyphone disambiguation over a synthetic G2PWModel bundle.

Builds a bundle in the exact on-disk format the real G2PWModel ships
(g2pW.onnx + char tables + bopomofo maps) with a deterministic classifier
graph, and drives the full __call__/correct paths.
"""

import json

import numpy as np
import pytest

from gpt_sovits_tpu.text.g2pw import G2PW, tokenize_and_map, wordize_and_map
from gpt_sovits_tpu.utils.onnx_lite import Graph, Node, encode_model

transformers = pytest.importorskip("transformers")


@pytest.fixture()
def bundle(tmp_path):
    d = tmp_path / "G2PWModel"
    d.mkdir()
    # labels sorted: CH2, H2, X2, ZH3
    (d / "POLYPHONIC_CHARS.txt").write_text("长\tCH2\n长\tZH3\n行\tX2\n行\tH2", encoding="utf-8")
    (d / "MONOPHONIC_CHARS.txt").write_text("好\tHAO3", encoding="utf-8")
    (d / "bopomofo_to_pinyin_wo_tune_dict.json").write_text(
        json.dumps({"CH": "chang", "ZH": "zhang", "X": "xing", "H": "hang", "HAO": "hao"}), encoding="utf-8"
    )
    (d / "char_bopomofo_dict.json").write_text("{}", encoding="utf-8")
    (d / "config.py").write_text("use_mask = True\nuse_char_phoneme = False\n", encoding="utf-8")

    # chars sorted: 行(idx 0), 长(idx 1)
    table = np.array(
        [
            [0.0, 0.0, 5.0, 0.0],  # 行 -> X2
            [0.0, 0.0, 0.0, 5.0],  # 长 -> ZH3
        ],
        np.float32,
    )
    g = Graph(
        nodes=[
            Node("Gather", ["table", "char_ids"], ["logits"], {"axis": 0}),
            Node("Mul", ["logits", "phoneme_mask"], ["masked"], {}),
            Node("Softmax", ["masked"], ["probs"], {"axis": -1}),
        ],
        initializers={"table": table},
        inputs=["input_ids", "token_type_ids", "attention_mask", "phoneme_mask", "char_ids", "position_ids"],
        outputs=["probs"],
    )
    (d / "g2pW.onnx").write_bytes(encode_model(g))

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "长", "行", "好", "我", "们", "马", "a", "b"]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab), encoding="utf-8")
    tok = transformers.BertTokenizer(vocab_file=str(vf))
    return str(d), tok


def test_wordize_tokenize_maps(bundle):
    _, tok = bundle
    words, t2w, w2t = wordize_and_map("我们 ab长")
    assert words == ["我", "们", "ab", "长"]
    assert t2w == [0, 1, None, 2, 2, 3]
    tokens, text2token, token2text = tokenize_and_map(tok, "我们长")
    assert tokens == ["我", "们", "长"]
    assert text2token == [0, 1, 2]


def test_polyphonic_prediction(bundle):
    d, tok = bundle
    g = G2PW(d, tok)
    (res,) = g(["我长好行"])
    assert res[0] is None  # not covered -> caller's base pinyin
    assert res[1] == "zhang3"  # model pick ZH3
    assert res[2] == "hao3"  # monophonic dict
    assert res[3] == "xing2"  # model pick X2


def test_correct_overlay(bundle):
    d, tok = bundle
    g = G2PW(d, tok)
    base = ["wo3", "chang2", "hao4", "hang2"]
    out = g.correct("我长好行", base)
    assert out == ["wo3", "zhang3", "hao3", "xing2"]


def test_enable_routes_chinese_g2p(bundle):
    d, tok = bundle
    from gpt_sovits_tpu.text import g2pw as mod
    from gpt_sovits_tpu.text.chinese import _g2pw_segment

    assert _g2pw_segment("长行") is None  # disabled -> no overlay
    mod.enable(d, tok)
    try:
        out = _g2pw_segment("长行")
        assert out == ["zhang3", "xing2"]
    finally:
        mod.disable()


def test_cli_download_g2pw_bundle_loads(bundle, tmp_path, monkeypatch):
    """`download --g2pw` output dir is accepted by g2pw (zip fetch mocked:
    the reference's auto-download flow, text/g2pw/onnx_api.py:58-76)."""
    import os
    import shutil
    import urllib.request
    import zipfile

    d, tok = bundle
    src_zip = tmp_path / "src.zip"
    with zipfile.ZipFile(src_zip, "w") as zf:
        for name in os.listdir(d):
            zf.write(os.path.join(d, name), f"G2PWModel_1.1/{name}")

    def fake_retrieve(url, dest, reporthook=None):
        shutil.copy(src_zip, dest)

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
    from gpt_sovits_tpu.utils.download import download_g2pw

    dest = tmp_path / "pretrained"
    model_dir = download_g2pw(str(dest))
    assert os.path.isdir(model_dir)
    assert os.path.exists(os.path.join(str(dest), "G2PWModel"))  # alias
    g = G2PW(model_dir, tok)
    assert g(["我们长"])[0][-1] in ("zhang4", "zhang3")
    # idempotent: second call short-circuits without refetching
    assert download_g2pw(str(dest)) == model_dir
