"""Numerical parity vs the reference PyTorch implementation.

Dual-instantiation with shared random weights (the reference's own test
pattern, BigVGAN tests/test_cuda_vs_torch_model.py): build the torch
reference model, export its state_dict through our checkpoint mapping, run
both on the same inputs, require allclose. This validates the entire S2
decode stack (VQ decode -> TextEncoder/MRTE -> flow reverse -> HiFiGAN)
and the S1 greedy decode loop end-to-end.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from gpt_sovits_tpu.models.t2s import T2SDecoder, generate, t2s_loss
from gpt_sovits_tpu.models.vits import SynthesizerTrn
from gpt_sovits_tpu.utils.checkpoint_compat import s1_params_from_torch, s2_params_from_torch
from gpt_sovits_tpu.utils.config import S1Config, S2Config

from reference_oracle import load_reference

S2_TINY = S2Config(
    version="v1",
    spec_channels=65,
    segment_size=8,
    # the reference MRTE hard-codes 192-channel content encodings
    # (mrte_model.py:12 content_enc_channels=192), so parity runs at 192
    inter_channels=192,
    hidden_channels=192,
    filter_channels=64,
    n_heads=2,
    n_layers=4,
    kernel_size=3,
    upsample_rates=(8, 8),
    upsample_initial_channel=64,
    upsample_kernel_sizes=(16, 16),
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3, 5),),
    gin_channels=512,  # ge feeds the 512-wide MRTE addition directly
    mrte_hidden=512,  # reference MRTE hidden_size is a hard-coded 512
    ssl_dim=768,  # reference hard-codes ssl_dim=768
    n_codes=1024,
)


@pytest.fixture(scope="module")
def ref_modules():
    return load_reference()


def _ref_s2(ref_models):
    torch.manual_seed(0)
    m = ref_models.SynthesizerTrn(
        S2_TINY.spec_channels,
        S2_TINY.segment_size * 64,
        S2_TINY.inter_channels,
        S2_TINY.hidden_channels,
        S2_TINY.filter_channels,
        S2_TINY.n_heads,
        S2_TINY.n_layers,
        S2_TINY.kernel_size,
        0.0,  # p_dropout=0 for deterministic comparison
        "1",
        list(S2_TINY.resblock_kernel_sizes),
        [list(d) for d in S2_TINY.resblock_dilation_sizes],
        list(S2_TINY.upsample_rates),
        S2_TINY.upsample_initial_channel,
        list(S2_TINY.upsample_kernel_sizes),
        gin_channels=S2_TINY.gin_channels,
        semantic_frame_rate="25hz",
        freeze_quantizer=True,
        version="v1",
    ).eval()
    return m


def test_s2_decode_parity(ref_modules):
    ref_models, _ = ref_modules
    ref = _ref_s2(ref_models)

    rng = np.random.default_rng(0)
    b, tc, tt, tr = 1, 12, 7, 16
    codes = rng.integers(0, 1024, (b, tc))
    # v1 phoneme vocab is 322 symbols
    text = rng.integers(0, 322, (b, tt))
    refer = (rng.standard_normal((b, S2_TINY.spec_channels, tr)) * 0.3 + 1.0).astype(np.float32)

    with torch.no_grad():
        wav_ref = ref.decode(
            torch.from_numpy(codes[None, 0:1]),  # ref expects (n_q? B, T) -> decode uses codes.size(2)*2 => (1,B,T)
            torch.from_numpy(text),
            torch.from_numpy(refer),
            noise_scale=0.0,
        ).numpy()

    model = SynthesizerTrn(S2_TINY)
    params = s2_params_from_torch(ref.state_dict(), S2_TINY)
    wav_ours = model.apply(
        params,
        jnp.asarray(codes),
        jnp.full((b,), tc, jnp.int32),
        jnp.asarray(text),
        jnp.full((b,), tt, jnp.int32),
        jnp.asarray(refer.transpose(0, 2, 1)),
        jnp.full((b,), tr, jnp.int32),
        noise_rng=None,
        noise_scale=0.0,
        method=SynthesizerTrn.decode,
    )
    wav_ours = np.asarray(wav_ours)[..., 0]
    assert wav_ours.shape == wav_ref[:, 0].shape
    np.testing.assert_allclose(wav_ours, wav_ref[:, 0], atol=2e-4, rtol=1e-3)


def test_s2_extract_latent_parity(ref_modules):
    ref_models, _ = ref_modules
    ref = _ref_s2(ref_models)
    rng = np.random.default_rng(1)
    ssl = rng.standard_normal((1, 768, 20)).astype(np.float32)
    with torch.no_grad():
        codes_ref = ref.extract_latent(torch.from_numpy(ssl)).numpy()  # (B, n_q, T)
    model = SynthesizerTrn(S2_TINY)
    params = s2_params_from_torch(ref.state_dict(), S2_TINY)
    codes_ours = np.asarray(model.apply(params, jnp.asarray(ssl.transpose(0, 2, 1)), method=SynthesizerTrn.extract_latent))
    np.testing.assert_array_equal(codes_ours, codes_ref[:, 0])


S1_TINY_CONFIG = {
    "model": {
        "vocab_size": 41,
        "phoneme_vocab_size": 37,
        "embedding_dim": 64,
        "hidden_dim": 64,
        "head": 4,
        "linear_units": 128,
        "n_layer": 2,
        "dropout": 0.0,
        "EOS": 40,
        "random_bert": 0,
    }
}

S1_TINY = S1Config(
    vocab_size=41,
    phoneme_vocab_size=37,
    embedding_dim=64,
    hidden_dim=64,
    num_heads=4,
    ffn_dim=256,  # torch TransformerEncoderLayer uses d_model*4
    num_layers=2,
    eos_id=40,
    bert_dim=1024,
    max_len=512,
)


def test_s1_greedy_decode_parity(ref_modules):
    _, ref_t2s = ref_modules
    torch.manual_seed(0)
    ref = ref_t2s.Text2SemanticDecoder(S1_TINY_CONFIG).eval()

    rng = np.random.default_rng(2)
    b, tx, tp = 1, 9, 6
    phones = rng.integers(0, 37, (b, tx))
    bert = rng.standard_normal((b, 1024, tx)).astype(np.float32) * 0.1
    prompts = rng.integers(0, 40, (b, tp))

    with torch.no_grad():
        y_ref, idx_ref = ref.infer_panel_naive(
            torch.from_numpy(phones),
            torch.tensor([tx]),
            torch.from_numpy(prompts),
            torch.from_numpy(bert),
            top_k=1,
            top_p=1.0,
            early_stop_num=-1,
            temperature=1.0,
            repetition_penalty=1.0,
        )
    ref_tokens = y_ref[0, tp:].numpy()  # generated tokens (exclusive of final)

    model = T2SDecoder(S1_TINY)
    params = s1_params_from_torch(ref.state_dict(), S1_TINY)
    out = generate(
        model, params,
        jnp.asarray(phones), jnp.asarray([tx]),
        jnp.asarray(bert.transpose(0, 2, 1)), jnp.asarray(prompts), jnp.asarray([tp]),
        jax.random.PRNGKey(0),
        max_new_tokens=48, top_k=1, top_p=1.0, temperature=1.0, repetition_penalty=1.0,
    )
    n = int(out.lengths[0])
    # compare the overlap (the reference runs to its 1500-step cap when
    # random weights never emit EOS; ours is capped at max_new_tokens)
    m = min(n, len(ref_tokens))
    assert m >= 40
    np.testing.assert_array_equal(np.asarray(out.tokens[0, :m]), ref_tokens[:m])


def test_s1_training_logits_parity(ref_modules):
    """Teacher-forced forward: our loss path must see the same logits."""
    _, ref_t2s = ref_modules
    torch.manual_seed(3)
    ref = ref_t2s.Text2SemanticDecoder(S1_TINY_CONFIG).eval()

    rng = np.random.default_rng(4)
    b, tx, ty = 2, 8, 10
    phones = rng.integers(0, 37, (b, tx))
    bert = rng.standard_normal((b, 1024, tx)).astype(np.float32) * 0.1
    y = rng.integers(0, 40, (b, ty))

    with torch.no_grad():
        # reference loss via forward_old (no DPO); compare our loss value
        loss_ref, _ = ref.forward_old(
            torch.from_numpy(phones),
            torch.tensor([tx, tx]),
            torch.from_numpy(y),
            torch.tensor([ty, ty]),
            torch.from_numpy(bert),
        )

    model = T2SDecoder(S1_TINY)
    params = s1_params_from_torch(ref.state_dict(), S1_TINY)
    loss_ours, aux = t2s_loss(
        model, params,
        jnp.asarray(phones), jnp.asarray([tx, tx]),
        jnp.asarray(y), jnp.asarray([ty, ty]),
        jnp.asarray(bert.transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(float(loss_ours), float(loss_ref), rtol=2e-4)


def test_discriminator_weight_import_parity(ref_modules):
    """d_params_from_torch: pretrained s2D state dict drives our
    MultiPeriodDiscriminator to the same outputs as the reference's."""
    import torch

    from gpt_sovits_tpu.models.discriminators import MultiPeriodDiscriminator
    from gpt_sovits_tpu.utils.checkpoint_compat import d_params_from_torch

    ref_models, _ = ref_modules
    torch.manual_seed(0)
    ref_d = ref_models.MultiPeriodDiscriminator().eval()
    sd = ref_d.state_dict()

    params = d_params_from_torch(sd)
    ours = MultiPeriodDiscriminator()

    rng = np.random.default_rng(0)
    y = rng.standard_normal((1, 4096, 1)).astype(np.float32) * 0.2
    yh = rng.standard_normal((1, 4096, 1)).astype(np.float32) * 0.2
    outs_r, outs_g, fr, fg = ours.apply(params, jnp.asarray(y), jnp.asarray(yh))
    with torch.no_grad():
        t_r, t_g, t_fr, t_fg = ref_d(torch.from_numpy(y.transpose(0, 2, 1)), torch.from_numpy(yh.transpose(0, 2, 1)))
    assert len(outs_r) == len(t_r) == 6
    for a, b in zip(outs_r, t_r):
        np.testing.assert_allclose(np.asarray(a).ravel(), b.numpy().ravel(), rtol=2e-4, atol=2e-5)
    for a, b in zip(outs_g, t_g):
        np.testing.assert_allclose(np.asarray(a).ravel(), b.numpy().ravel(), rtol=2e-4, atol=2e-5)
