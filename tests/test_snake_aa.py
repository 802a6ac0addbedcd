"""Fused anti-aliased snake Pallas kernel vs the XLA composition.

Runs in interpreter mode on CPU (tests) and compiled on TPU (bench).
Pattern mirrors the reference's own CUDA-kernel tests
(BigVGAN/tests/test_activation.py): same weights, same input, allclose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt_sovits_tpu.models.bigvgan import downsample1d, snake_beta, upsample1d


def _xla_ref(x, alpha, beta, logscale=True):
    h = upsample1d(x, 2)
    h = snake_beta(h, alpha, beta, logscale)
    return downsample1d(h, 2)


@pytest.mark.parametrize("t,c", [(64, 8), (200, 16), (512, 128)])
def test_snake_aa_fused_matches_composition(t, c, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from gpt_sovits_tpu.ops.pallas import snake_aa

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, t, c)) * 0.5).astype(np.float32)
    alpha = (rng.standard_normal(c) * 0.1).astype(np.float32)
    beta = (rng.standard_normal(c) * 0.1).astype(np.float32)

    ref = np.asarray(_xla_ref(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta), logscale=True))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            snake_aa.snake_aa_fused(
                jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta), logscale=True, tile_t=128, tile_c=min(c, 128)
            )
        )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


# fold factors and channel counts of the production BigVGAN plan
# (ops/folded_bigvgan.py: ch 768..24, r chosen so r*ch is a 128 multiple),
# plus a fallback case (R not a lane multiple) and a ragged Q
@pytest.mark.parametrize(
    "r,ch,q",
    [(1, 768, 48), (2, 192, 100), (4, 96, 96), (8, 48, 70), (16, 24, 40), (2, 64, 60), (16, 24, 33)],
)
def test_snake_aa_folded_matches_composition(r, ch, q):
    from jax.experimental.pallas import tpu as pltpu

    from gpt_sovits_tpu.ops.pallas import snake_aa

    rng = np.random.default_rng(1)
    t = q * r
    xu = (rng.standard_normal((2, t, ch)) * 0.5).astype(np.float32)
    alpha = (rng.standard_normal(ch) * 0.1).astype(np.float32)
    beta = (rng.standard_normal(ch) * 0.1).astype(np.float32)

    ref = np.asarray(_xla_ref(jnp.asarray(xu), jnp.asarray(alpha), jnp.asarray(beta), logscale=True))
    x_folded = jnp.asarray(xu.reshape(2, q, r * ch))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            snake_aa.snake_aa_folded(
                x_folded, jnp.asarray(alpha), jnp.asarray(beta), r=r, ch=ch, logscale=True, tile_q=16
            )
        )
    assert out.shape == x_folded.shape
    np.testing.assert_allclose(out.reshape(2, t, ch), ref, atol=2e-5, rtol=1e-4)
