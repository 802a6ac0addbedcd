"""v2 folded HiFiGAN generator: conv vs taps lowering, trace-timed."""
import os, sys, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from scripts._trace_time import device_time

def main():
    from gpt_sovits_tpu.models.vits import SynthesizerTrn
    from gpt_sovits_tpu.ops.folded_conv import fold_generator_params, generator_apply
    from gpt_sovits_tpu.utils.config import s2_config_for_version

    cfg = s2_config_for_version("v2")
    key = jax.random.PRNGKey(0)
    import types
    s2 = SynthesizerTrn(cfg)
    # build only the decoder (Generator) params via the model init
    b, t = 4, 1000  # 4 utterances x 20 s latent (hop 640)
    text = jnp.zeros((b, 120), jnp.int32)
    tl = jnp.full((b,), 120, jnp.int32)
    refer = jax.random.normal(key, (b, 250, cfg.spec_channels)) * 0.3 + 1.0
    rl = jnp.full((b,), 250, jnp.int32)
    params = jax.jit(functools.partial(s2.init, method=SynthesizerTrn.init_all))(
        {"params": key, "noise": key, "slice": key},
        jnp.zeros((b, 100, cfg.ssl_dim)), refer, rl, text, tl,
    )
    folded = fold_generator_params(params["params"]["dec"], cfg, dtype=jnp.bfloat16)
    z = (jax.random.normal(key, (b, t, cfg.inter_channels)) * 0.3).astype(jnp.bfloat16)
    ge = (jax.random.normal(key, (b, 1, cfg.gin_channels)) * 0.3).astype(jnp.bfloat16)
    static = {k: v for k, v in folded.items() if k != "arrays"}
    for mode in ("conv", "taps"):
        os.environ["GSVT_VOC_CONV"] = mode
        # pads are STATIC conv metadata — pass only the arrays as jit args
        f = jax.jit(lambda arrs, z, g, _m=mode: generator_apply({"arrays": arrs, **static}, z, g))
        dt = device_time(f, folded["arrays"], z, ge, n=5)
        print(f"v2 folded generator b{b} T{t}: {mode} {dt*1e3:.1f} ms", flush=True)

if __name__ == "__main__":
    main()
