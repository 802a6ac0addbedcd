"""Data pipeline + prepare stages + checkpoint I/O, end-to-end on a tiny
synthetic corpus."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.dsp.audio_io import save_wav
from gpt_sovits_tpu.prepare.extract import (
    merge_semantic_shards,
    merge_text_shards,
    normalize_wav32k,
    prepare_audio,
    prepare_semantic,
    prepare_text,
)
from gpt_sovits_tpu.train.ckpt import (
    export_weights,
    latest_checkpoint,
    load_checkpoint,
    load_weights,
    save_checkpoint,
)
from gpt_sovits_tpu.train.data import BucketSampler, S1Dataset, S2Dataset
from gpt_sovits_tpu.utils.config import MelConfig

MEL = MelConfig(sampling_rate=32000, n_fft=2048, win_size=2048, hop_size=640)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    exp_dir = root / "exp"
    exp_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        name = f"utt{i}.wav"
        dur = 32000 + i * 8000
        save_wav(str(wav_dir / name), (rng.standard_normal(dur) * 0.1).astype(np.float32), 32000)
        lines.append(f"{wav_dir / name}|spk|en|hello world this is sample number {i} with words")
    manifest = root / "files.list"
    manifest.write_text("\n".join(lines))
    return str(manifest), str(exp_dir)


def test_prepare_stages(corpus):
    manifest, exp_dir = corpus

    n = 0
    for part in range(2):
        n += prepare_text(manifest, exp_dir, part=part, num_parts=2)
    merge_text_shards(exp_dir, 2)
    assert n == 4
    assert os.path.exists(os.path.join(exp_dir, "2-name2text.txt"))

    def fake_hubert(wav16):
        t = len(wav16) // 320
        return np.random.default_rng(1).standard_normal((t, 16)).astype(np.float32)

    n = prepare_audio(manifest, exp_dir, hubert_fn=fake_hubert)
    assert n == 4
    assert len(os.listdir(os.path.join(exp_dir, "5-wav32k"))) == 4

    def fake_latent(ssl):
        return np.arange(len(ssl) // 2) % 7

    prepare_semantic(manifest, exp_dir, extract_latent_fn=fake_latent)
    merge_semantic_shards(exp_dir, 1)
    assert os.path.exists(os.path.join(exp_dir, "6-name2semantic.tsv"))


def test_normalize_wav32k():
    x = np.sin(np.linspace(0, 50, 32000)).astype(np.float32) * 0.4
    y = normalize_wav32k(x)
    assert y is not None and np.abs(y).max() <= 1.0
    assert normalize_wav32k(x * 10) is None  # clipped input filtered


def test_s1_dataset_and_sampler(corpus):
    _, exp_dir = corpus
    ds = S1Dataset(exp_dir, max_sec=54, frame_rate=25, bert_dim=8)
    assert len(ds) >= 2  # some may be filtered by phones/sec ratio
    sampler = BucketSampler(ds.lengths(), batch_size=2, seed=7)
    batches = sampler.epoch_batches(0)
    assert batches and all(len(b) == 2 for b in batches)
    batch = ds.collate(batches[0])
    assert batch["phoneme_ids"].shape[0] == 2
    assert batch["semantic_ids"].shape[0] == 2
    assert (batch["semantic_lens"] > 0).all()
    # deterministic per epoch, different across epochs
    again = sampler.epoch_batches(0)
    np.testing.assert_array_equal(batches[0], again[0])


def test_s2_dataset(corpus):
    _, exp_dir = corpus
    ds = S2Dataset(exp_dir, mel_cfg=MEL, min_frames=4, max_frames=1600)
    assert len(ds) >= 2
    batch = ds.collate([0, 1])
    assert batch["spec"].shape[2] == MEL.n_fft // 2 + 1
    assert batch["wav"].shape[1] == batch["spec"].shape[1] * MEL.hop_size
    assert batch["ssl"].shape[1] == batch["spec"].shape[1] * 2


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.asarray(5)}
    p = save_checkpoint(state, str(tmp_path), 5)
    assert latest_checkpoint(str(tmp_path)) == p
    restored = load_checkpoint(p, jax.tree_util.tree_map(np.zeros_like, state))
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))


def test_export_weights_roundtrip(tmp_path):
    params = {"enc": {"w": jnp.ones((3, 2))}, "enc_q": {"w": jnp.zeros((2,))}, "emb": jnp.arange(4)}
    path = str(tmp_path / "model.npz")
    export_weights(params, path, config={"version": "v2"}, info="3epoch")
    tree, meta = load_weights(path)
    assert meta["info"] == "3epoch"
    assert meta["config"]["version"] == "v2"
    assert "enc_q" not in tree  # dropped like reference savee
    np.testing.assert_array_equal(np.asarray(tree["enc"]["w"]), np.ones((3, 2)))


def test_check_details(corpus, tmp_path):
    """Dataset sanity checks (tools/my_utils.py check_details equivalent)."""
    from gpt_sovits_tpu.prepare.extract import check_details

    manifest, exp_dir = corpus
    assert check_details(list_file=manifest) == []
    # artifacts were built by the earlier prepare test in this module
    assert check_details(exp_dir=exp_dir) == []

    bad = tmp_path / "bad.list"
    bad.write_text("only|three|fields")
    probs = check_details(list_file=str(bad))
    assert any("wav|speaker|lang|text" in p for p in probs)
    probs = check_details(list_file=str(tmp_path / "missing.list"))
    assert probs
    empty = tmp_path / "emptyexp"
    empty.mkdir()
    probs = check_details(exp_dir=str(empty))
    assert len(probs) >= 3
