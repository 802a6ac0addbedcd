"""ScaledAdam (k2/icefall) as an optax GradientTransformation.

Counterpart of the reference's AR/modules/optim.py (593 LoC, used only for
S1 training). Core behaviors reproduced:

  * per-tensor learning-rate scaling by the parameter's RMS (updates are
    proportional to the size of the tensor they update)
  * Adam-style first/second moments on the *normalized* gradient
  * an explicit scalar "scale" learning channel per tensor: the projection
    of the gradient onto the parameter direction learns the tensor's
    magnitude separately from its direction
  * scalar parameters (ndim 0/1, e.g. norms/biases) fall back to plain Adam
    with the base lr

The reference's batched-parameter machinery (BatchedOptimizer) exists for
CUDA launch-overhead reasons and is unnecessary under jit. Round 5 adds
the reference-faithful median clipping_scale (optim.py:279-358
`_get_clipping_scale`): the rms-weighted gradient norm is recorded in a
ring buffer each step; every `clipping_update_period` steps the clip
threshold re-estimates to clipping_scale x median(buffer); gradients
scale by min(1, threshold/norm) once a full period has been observed.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class ScaledAdamState(NamedTuple):
    count: chex.Array
    m: optax.Updates  # first moment (direction)
    v: optax.Updates  # second moment (direction)
    scale_m: optax.Updates  # first moment of the scale channel (per tensor)
    scale_v: optax.Updates  # second moment of the scale channel
    norm_buf: chex.Array  # (clipping_update_period,) recent rms-weighted grad norms
    norm_threshold: chex.Array  # () current clip threshold (clipping_scale * median)


def scaled_adam(
    learning_rate=0.025,
    *,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-8,
    param_rms_min: float = 1e-5,
    scale_lr_scale: float = 0.1,
    clipping_scale: float | None = 2.0,
    clipping_update_period: int = 100,
) -> optax.GradientTransformation:
    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)
    period = clipping_update_period

    def init(params):
        import numpy as _np

        zeros = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
        # device_put distinct host arrays: tiny jnp constants are cached and
        # would alias, which breaks buffer donation of the optimizer state
        scalar_zeros = lambda: jax.tree_util.tree_map(lambda p: jax.device_put(_np.zeros(())), params)
        return ScaledAdamState(
            jnp.zeros((), jnp.int32), zeros(params), zeros(params),
            scalar_zeros(), scalar_zeros(),
            jnp.zeros((period,), jnp.float32), jnp.zeros((), jnp.float32),
        )

    def update(grads, state, params):
        if params is None:
            raise ValueError("scaled_adam requires params")
        count = state.count + 1
        lr = sched(state.count)

        # --- median-based clipping (ref optim.py:279-358) ---------------
        # norm of the RMS-WEIGHTED gradient: matrices contribute
        # (g * param_rms)^2 (their effective update magnitude under the
        # rms-scaled lr), scalars/vectors plain g^2
        norm_buf, threshold = state.norm_buf, state.norm_threshold
        if clipping_scale is not None:

            def sumsq(g, p):
                if p.ndim <= 1:
                    return jnp.sum(g.astype(jnp.float32) ** 2)
                rms = jnp.maximum(jnp.sqrt(jnp.mean(p * p)), param_rms_min)
                return jnp.sum((g.astype(jnp.float32) * rms) ** 2)

            tot_norm = jnp.sqrt(
                sum(jax.tree_util.tree_leaves(jax.tree_util.tree_map(sumsq, grads, params)))
            )
            step = state.count  # 0-based, matches the reference's `step`
            record = step > 0  # ref returns early at step 0 (others' state uninitialized)
            norm_buf = jnp.where(
                record, norm_buf.at[jax.lax.rem(step, period)].set(tot_norm), norm_buf
            )
            at_update = record & (jax.lax.rem(step, period) == 0)
            threshold = jnp.where(
                at_update, clipping_scale * jnp.median(norm_buf), threshold
            )
            factor = jnp.where(
                step >= period,
                jnp.minimum(1.0, threshold / (tot_norm + 1e-20)),
                1.0,
            )
            grads = jax.tree_util.tree_map(lambda g: g * factor, grads)
        bc1 = 1 - b1**count
        bc2 = 1 - b2**count

        def upd(g, p, m, v, sm, sv):
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * (g * g)
            m_hat = m / bc1
            v_hat = v / bc2
            direction = m_hat / (jnp.sqrt(v_hat) + eps)
            if p.ndim <= 1:
                # scalars/vectors: plain Adam at base lr (ref: scalar_lr_scale)
                return -lr * direction, m, v, sm, sv
            rms = jnp.sqrt(jnp.mean(p * p))
            rms = jnp.maximum(rms, param_rms_min)
            delta = -lr * rms * direction
            # scale channel: grad of loss wrt log-scale of the tensor is
            # <g, p> (direction fixed); learn it with its own Adam moments
            sg = jnp.sum(g * p) / jnp.maximum(rms, param_rms_min)
            sm = b1 * sm + (1 - b1) * sg
            sv = b2 * sv + (1 - b2) * sg * sg
            s_dir = (sm / bc1) / (jnp.sqrt(sv / bc2) + eps)
            delta = delta - (lr * scale_lr_scale) * s_dir * (p / jnp.maximum(rms, param_rms_min))
            return delta, m, v, sm, sv

        flat = jax.tree_util.tree_map(upd, grads, params, state.m, state.v, state.scale_m, state.scale_v)
        deltas = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        new_m = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        new_v = jax.tree_util.tree_map(lambda t: t[2], flat, is_leaf=lambda x: isinstance(x, tuple))
        new_sm = jax.tree_util.tree_map(lambda t: t[3], flat, is_leaf=lambda x: isinstance(x, tuple))
        new_sv = jax.tree_util.tree_map(lambda t: t[4], flat, is_leaf=lambda x: isinstance(x, tuple))
        return deltas, ScaledAdamState(count, new_m, new_v, new_sm, new_sv, norm_buf, threshold)

    return optax.GradientTransformation(init, update)


def scaled_adam_with_clip(learning_rate=0.025, *, grad_clip: float = 1.0, **kw) -> optax.GradientTransformation:
    """Back-compat alias: ScaledAdam now carries the reference's own
    median clipping_scale internally; the extra global-norm clip is kept
    for callers that set a hard bound."""
    return optax.chain(optax.clip_by_global_norm(grad_clip), scaled_adam(learning_rate, **kw))
