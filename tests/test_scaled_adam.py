"""ScaledAdam optimizer tests: convergence, rms-proportional steps."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpt_sovits_tpu.train.scaled_adam import scaled_adam, scaled_adam_with_clip


def test_converges_on_quadratic():
    target = {"w": jnp.asarray([[2.0, -3.0], [1.0, 4.0]]), "b": jnp.asarray([0.5, -0.5])}
    params = {"w": jnp.ones((2, 2)) * 0.1, "b": jnp.zeros(2)}
    opt = scaled_adam_with_clip(0.05)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(
            lambda p: sum(jnp.sum((p[k] - target[k]) ** 2) for k in p)
        )(params)
        upd, state = opt.update(grads, state, params)
        return optax.apply_updates(params, upd), state, loss

    for _ in range(800):
        params, state, loss = step(params, state)
    assert float(loss) < 1e-2, float(loss)


def test_step_scales_with_param_rms():
    opt = scaled_adam(0.01)
    big = {"w": jnp.ones((4, 4)) * 10.0}
    small = {"w": jnp.ones((4, 4)) * 0.1}
    g = {"w": jnp.ones((4, 4))}
    ub, _ = opt.update(g, opt.init(big), big)
    us, _ = opt.update(g, opt.init(small), small)
    # larger tensors take proportionally larger steps
    assert np.abs(np.asarray(ub["w"])).mean() > 10 * np.abs(np.asarray(us["w"])).mean()


def test_scalar_params_plain_adam():
    opt = scaled_adam(0.01)
    p = {"s": jnp.asarray(5.0), "v": jnp.ones(3)}
    g = {"s": jnp.asarray(1.0), "v": jnp.ones(3)}
    u, _ = opt.update(g, opt.init(p), p)
    np.testing.assert_allclose(float(u["s"]), -0.01, rtol=1e-3)


def test_median_clipping_scale_matches_reference_semantics():
    """Reference _get_clipping_scale (optim.py:279-358): after a full
    clipping_update_period of steady gradients, a spike gets scaled by
    threshold/norm where threshold = clipping_scale * median of the
    recorded rms-weighted norms; before a full period, no clipping."""
    import jax
    import jax.numpy as jnp

    from gpt_sovits_tpu.train.scaled_adam import scaled_adam

    period = 8
    tx = scaled_adam(0.01, clipping_scale=2.0, clipping_update_period=period)
    params = {"w": jnp.ones((4, 4)) * 0.5}
    state = tx.init(params)
    g_steady = {"w": jnp.full((4, 4), 0.1)}

    # run a full period of steady grads (steps 0..period)
    for _ in range(period + 1):
        _, state = tx.update(g_steady, state, params)
    thr = float(state.norm_threshold)
    assert thr > 0  # threshold estimated at step % period == 0
    # rms-weighted steady norm
    rms = float(jnp.sqrt(jnp.mean(params["w"] ** 2)))
    steady_norm = 0.1 * rms * 4  # sqrt(16 * (0.1*rms)^2)
    assert abs(thr - 2.0 * steady_norm) / thr < 1e-4

    # a 100x spike: update magnitude must reflect clipping to ~threshold
    g_spike = {"w": jnp.full((4, 4), 10.0)}
    up_spike, st2 = tx.update(g_spike, state, params)
    # compare against an unclipped twin at the same moment state
    tx_noclip = scaled_adam(0.01, clipping_scale=None)
    from gpt_sovits_tpu.train.scaled_adam import ScaledAdamState

    state_nc = ScaledAdamState(
        state.count, state.m, state.v, state.scale_m, state.scale_v,
        state.norm_buf, state.norm_threshold,
    )
    up_noclip, _ = tx_noclip.update(g_spike, state_nc, params)
    # Adam-style normalization mutes the clip in a single delta; what the
    # clip protects is the MOMENTS. m after the spike = b1*m + (1-b1)*g*f:
    # solve for the factor f applied to the spike gradient
    m_prev = state.m["w"]
    f_clip = (st2.m["w"] - 0.9 * m_prev) / (0.1 * g_spike["w"])
    expected = thr / float(10.0 * rms * 4)  # thr / spike rms-weighted norm
    assert abs(float(f_clip.mean()) - expected) / expected < 1e-3
    del up_spike, up_noclip

    # before a full period: no clipping even for spikes
    tx2 = scaled_adam(0.01, clipping_scale=2.0, clipping_update_period=period)
    st = tx2.init(params)
    _, st = tx2.update(g_steady, st, params)
    up_early, _ = tx2.update(g_spike, st, params)
    st_nc = ScaledAdamState(
        st.count, st.m, st.v, st.scale_m, st.scale_v, st.norm_buf, st.norm_threshold
    )
    up_early_nc, _ = tx_noclip.update(g_spike, st_nc, params)
    assert float(jnp.linalg.norm(up_early["w"] - up_early_nc["w"])) < 1e-6
