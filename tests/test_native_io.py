"""Native IO library (native/gsvt_io.cc via ctypes): parity with python."""

import numpy as np
import pytest

from gpt_sovits_tpu import native
from gpt_sovits_tpu.dsp.audio_io import load_wav, save_wav

pytestmark = pytest.mark.skipif(native.load() is None, reason="native library not built (no g++)")


def test_wav_batch_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    refs = []
    for i, n in enumerate([1000, 2500, 777]):
        x = (rng.standard_normal(n) * 0.3).astype(np.float32)
        p = str(tmp_path / f"a{i}.wav")
        save_wav(p, x, 16000 + i)
        paths.append(p)
        refs.append(load_wav(p)[0])
    max_len = max(len(r) for r in refs)
    out, lengths, srs, status = native.wav_batch(paths, max_len)
    assert (status == 0).all()
    assert list(srs) == [16000, 16001, 16002]
    for i, r in enumerate(refs):
        assert lengths[i] == len(r)
        np.testing.assert_allclose(out[i, : len(r)], r, atol=1e-6)
        assert (out[i, len(r):] == 0).all()


def test_wav_batch_stereo_downmix(tmp_path):
    rng = np.random.default_rng(1)
    st = (rng.standard_normal((800, 2)) * 0.3).astype(np.float32)
    p = str(tmp_path / "st.wav")
    save_wav(p, st, 32000)
    want = load_wav(p)[0]  # python mono downmix
    out, lengths, srs, status = native.wav_batch([p], 1024)
    assert status[0] == 0 and lengths[0] == len(want)
    np.testing.assert_allclose(out[0, : len(want)], want, atol=1e-6)


def test_wav_batch_missing_file(tmp_path):
    out, lengths, srs, status = native.wav_batch([str(tmp_path / "nope.wav")], 64)
    assert status[0] != 0 and lengths[0] == 0


@pytest.mark.parametrize("dtype", [np.float32, np.float16])
def test_npy_batch(tmp_path, dtype):
    rng = np.random.default_rng(2)
    paths, refs = [], []
    for i, rows in enumerate([50, 81]):
        a = rng.standard_normal((rows, 24)).astype(dtype)
        p = str(tmp_path / f"f{i}.npy")
        np.save(p, a)
        paths.append(p)
        refs.append(a.astype(np.float32))
    out, rows, status = native.npy_batch(paths, 100, 24)
    assert (status == 0).all()
    for i, r in enumerate(refs):
        assert rows[i] == r.shape[0]
        np.testing.assert_allclose(out[i, : r.shape[0]], r, atol=1e-6)


def test_npy_batch_wrong_cols(tmp_path):
    p = str(tmp_path / "bad.npy")
    np.save(p, np.zeros((5, 7), np.float32))
    out, rows, status = native.npy_batch([p], 10, 24)
    assert status[0] != 0 and rows[0] == 0


def test_data_iterator_prefetch_equivalent():
    class FakeDS:
        def collate(self, idxs):
            return {"idxs": list(idxs)}

    class FakeSampler:
        def epoch_batches(self, epoch):
            return [np.array([i, i + 1]) for i in range(5)]

    from gpt_sovits_tpu.train.data import data_iterator

    plain = [b["idxs"] for b in data_iterator(FakeDS(), FakeSampler(), 0, prefetch=0)]
    pre = [b["idxs"] for b in data_iterator(FakeDS(), FakeSampler(), 0, prefetch=2)]
    assert plain == pre


def test_data_iterator_prefetch_propagates_errors():
    class BadDS:
        def collate(self, idxs):
            raise RuntimeError("boom")

    class FakeSampler:
        def epoch_batches(self, epoch):
            return [np.array([0]), np.array([1])]

    from gpt_sovits_tpu.train.data import data_iterator

    with pytest.raises(RuntimeError, match="boom"):
        list(data_iterator(BadDS(), FakeSampler(), 0, prefetch=2))
