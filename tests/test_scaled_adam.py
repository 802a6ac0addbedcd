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
