"""Trace breakdown of one CFM call: where do the DiT's cycles go?
Aggregates device events by op category over an 8-step b6 CFM."""
import os, sys, glob, gzip, json, re, tempfile, shutil, functools
from collections import defaultdict
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from gpt_sovits_tpu.models.dit import DiT, DiTConfig
from gpt_sovits_tpu.models.v3 import cfm_inference

cfg = DiTConfig()
key = jax.random.PRNGKey(0)
b, t, t_ref, steps = 6, 934, 468, 8
dit = DiT(cfg)
x0 = jnp.zeros((1, t, cfg.mel_dim), jnp.bfloat16)
shapes = jax.eval_shape(dit.init, key, x0, x0, jnp.zeros((1,)), jnp.zeros((1,)),
                        jnp.zeros((1, t, cfg.text_dim), jnp.bfloat16), jnp.ones((1, t), bool))
params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)
mu = jax.random.normal(key, (b, t, cfg.text_dim)).astype(jnp.bfloat16)
prompt = (jax.random.normal(key, (b, t_ref, cfg.mel_dim)) * 0.1).astype(jnp.bfloat16)
lens = jnp.full((b,), t, jnp.int32)

g = jax.jit(lambda p, m, l, pr, k: cfm_inference(dit, p, m, l, pr, k, n_steps=steps).astype(jnp.float32))
jax.block_until_ready(g(params, mu, lens, prompt, key))
d = tempfile.mkdtemp(prefix="dittrace_")
with jax.profiler.trace(d):
    jax.block_until_ready(g(params, mu, lens, prompt, key))
files = glob.glob(os.path.join(d, "**", "*.trace.json.gz"), recursive=True)
with gzip.open(sorted(files)[-1]) as f:
    tr = json.load(f)
ev = tr["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in ev if e.get("ph") == "M" and e.get("name") == "process_name"}
tot = defaultdict(float); cnt = defaultdict(int); examples = {}
for e in ev:
    if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
        n = e.get("name", "")
        if n.startswith("jit_") or n.startswith("jit("):
            continue
        base = re.sub(r"[.\d]+$", "", n)
        tot[base] += e.get("dur", 0); cnt[base] += 1
        if base not in examples or e["dur"] > examples[base][0]:
            examples[base] = (e["dur"], e.get("args", {}).get("long_name", "")[:200])
print(f"device total: {sum(tot.values())/1e3:.1f} ms for {steps} steps b{b}")
for name, dsum in sorted(tot.items(), key=lambda kv: -kv[1])[:14]:
    print(f"{dsum/1e3:9.2f} ms x{cnt[name]:5d}  {name[:40]}")
    print(f"            biggest: {examples[name][0]/1e3:.3f} ms  {examples[name][1][:170]}")
shutil.rmtree(d, ignore_errors=True)
