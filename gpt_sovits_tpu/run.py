"""Library entry points for the pipeline steps.

The reference drives each step as a subprocess with env-var config
(webui.py:1082-1096, server/training_steps.py `StepProcessor`/`ConfigGenerator`
building per-step env + configs). Here the steps are plain functions shared by
the CLI (`gpt_sovits_tpu.cli`) and the training REST service
(`serve/training_steps.py`) — one controller process, typed arguments instead
of an env-var ABI.
"""

from __future__ import annotations

import os
import sys
from typing import Callable, Optional

import numpy as np


def _overlay_params(dst: dict, src: dict) -> dict:
    """Recursively overlay mapped pretrained weights onto an initialized
    param tree (keys absent from the ckpt — e.g. enc_q dropped by savee —
    keep their fresh init, like the reference's strict=False load)."""
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _overlay_params(out[k], v)
        else:
            out[k] = v
    return out


def _dp_mesh(data_parallel: bool, batch_size: int):
    """(data,)-mesh over all local devices for DP training (replaces the
    reference's mp.spawn + DDP NCCL allreduce, s2_train.py:58-85: params
    replicated, batch sharded over `data`, gradient mean via compiler psum)."""
    if not data_parallel:
        return None
    import jax

    from gpt_sovits_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    if n <= 1:
        return None
    if batch_size % n:
        raise ValueError(f"batch_size {batch_size} not divisible by {n} devices")
    return make_mesh(n, 1)


def _dp_place(mesh, state, batch_fn):
    """Replicate state over the mesh; return a per-batch sharding fn.

    Batches go through `global_batch_from_local`: single-host this shards
    the local batch over the data axis; multi-host each process feeds its
    own slice of the global batch (per-host input sharding over DCN,
    replacing the reference's env-var i_part/all_parts ABI)."""
    if mesh is None:
        return state, batch_fn
    import jax

    from gpt_sovits_tpu.parallel.launch import global_batch_from_local
    from gpt_sovits_tpu.parallel.mesh import replicated

    state = jax.device_put(state, replicated(mesh))
    return state, lambda b: global_batch_from_local(batch_fn(b), mesh)


def _dp_sampler_args(mesh, batch_size: int) -> dict:
    """Per-host sampler arguments for DP: each host draws disjoint batches
    of batch_size/process_count items; _dp_place assembles the global
    batch (DistributedBucketSampler num_replicas/rank equivalent)."""
    import jax

    if mesh is None or jax.process_count() == 1:
        return {"batch_size": batch_size}
    pc = jax.process_count()
    if batch_size % pc:
        raise ValueError(f"batch_size {batch_size} not divisible by {pc} hosts")
    return {"batch_size": batch_size // pc, "num_shards": pc, "shard_id": jax.process_index()}


def run_prepare(
    list_file: str,
    exp_dir: str,
    *,
    version: str = "v2",
    bert: Optional[str] = None,
    hubert: Optional[str] = None,
    s2: Optional[str] = None,
    sv: Optional[str] = None,
    log: Callable[..., None] = print,
) -> None:
    """Dataset feature extraction (reference prepare_datasets/1-get-text.py,
    2-get-hubert-wav32k.py, 2-get-sv.py, 3-get-semantic.py in one call)."""
    import jax

    from gpt_sovits_tpu.prepare import extract
    from gpt_sovits_tpu.utils.loaders import load_bert, load_hubert, load_s2, load_sv

    os.makedirs(exp_dir, exist_ok=True)
    for problem in extract.check_details(list_file=list_file):  # my_utils.check_details
        log(f"warning: {problem}", file=sys.stderr)

    bert_fn = None
    if bert:
        import jax.numpy as jnp

        bert_model, bert_params, tok = load_bert(bert)

        def bert_fn(norm_text, word2ph):
            ids = tok(norm_text, return_tensors="np")["input_ids"]
            hidden = np.asarray(bert_model.apply(bert_params, jnp.asarray(ids))[-3])[0, 1:-1]
            return np.repeat(hidden, word2ph, axis=0)

    extract.prepare_text(list_file, exp_dir, version=version, bert_fn=bert_fn)
    extract.merge_text_shards(exp_dir, 1)

    hubert_model, hubert_params = load_hubert(hubert)
    if hubert_params is not None:
        import jax.numpy as jnp

        hub_fwd = jax.jit(hubert_model.apply)
        extract.prepare_audio(list_file, exp_dir, hubert_fn=lambda w: np.asarray(hub_fwd(hubert_params, jnp.asarray(w[None])))[0])

    if s2:
        import jax.numpy as jnp

        model, params, _ = load_s2(s2, version if version in ("v1", "v2") else None)
        _ext = jax.jit(lambda pp, t: model.apply(pp, t, method=type(model).extract_latent))
        ext = lambda t: _ext(params, t)
        extract.prepare_semantic(list_file, exp_dir, extract_latent_fn=lambda ssl: np.asarray(ext(jnp.asarray(ssl[None])))[0])
        extract.merge_semantic_shards(exp_dir, 1)

    if sv:
        import jax.numpy as jnp

        from gpt_sovits_tpu.models.eres2net import kaldi_fbank

        sv_model, sv_params = load_sv(sv)
        _svf = jax.jit(lambda pp, w: sv_model.apply(pp, kaldi_fbank(w)))
        fwd = lambda w: _svf(sv_params, w)
        extract.prepare_sv(list_file, exp_dir, sv_fn=lambda w: np.asarray(fwd(jnp.asarray(w[None])))[0])
    log("prepare done:", exp_dir)


def run_train_s1(
    exp_dir: str,
    ckpt_dir: str,
    *,
    batch_size: int = 8,
    epochs: int = 15,
    save_every: int = 5,
    dpo: bool = False,
    pretrained_s1: Optional[str] = None,
    model_cfg=None,
    data_parallel: bool = False,
    log: Callable[..., None] = print,
) -> None:
    """S1 AR text->semantic training (reference s1_train.py)."""
    import jax

    from gpt_sovits_tpu.models.t2s import T2SDecoder
    from gpt_sovits_tpu.train import ckpt as ckpt_io
    from gpt_sovits_tpu.train.data import BucketSampler, S1Dataset, data_iterator
    from gpt_sovits_tpu.train.s1_train import init_state, make_train_step
    from gpt_sovits_tpu.utils.config import S1Config, TrainConfig

    from gpt_sovits_tpu.utils.metrics import MetricsLogger

    cfg = model_cfg or S1Config()
    tc = TrainConfig(batch_size=batch_size, epochs=epochs, grad_accum=4)
    mesh = _dp_mesh(data_parallel, batch_size)
    model = T2SDecoder(cfg)
    ds = S1Dataset(exp_dir)
    sampler = BucketSampler(ds.lengths(), seed=tc.seed, **_dp_sampler_args(mesh, tc.batch_size))
    if not sampler.epoch_batches(0):
        raise RuntimeError("no training batches (dataset too small for batch size)")
    state = init_state(jax.random.PRNGKey(tc.seed), model, tc)
    latest = ckpt_io.latest_checkpoint(ckpt_dir)
    if latest:
        state = ckpt_io.load_checkpoint(latest, state)
        log("resumed from", latest)
    elif pretrained_s1:
        from gpt_sovits_tpu.utils.checkpoint_compat import load_torch_checkpoint, s1_params_from_torch

        ck = load_torch_checkpoint(pretrained_s1)
        mapped = s1_params_from_torch(ck.get("weight", ck), cfg)
        state = state.replace(params={"params": _overlay_params(state.params["params"], mapped["params"])})
        log("loaded pretrained", pretrained_s1)
    step_fn = make_train_step(model, tc, use_dpo=dpo)
    state, place = _dp_place(mesh, state, lambda b: {k: jax.numpy.asarray(v) for k, v in b.items()})
    mlog = MetricsLogger(os.path.join(ckpt_dir, "logs"), echo=False)
    for epoch in range(tc.epochs):
        for batch in data_iterator(ds, sampler, epoch):
            state, metrics = step_fn(state, place(batch), jax.random.PRNGKey(epoch))
        log(f"epoch {epoch}: loss={float(metrics['loss']):.3f} acc={float(metrics['acc']):.3f}")
        mlog.log(int(state.step), **{k: float(v) for k, v in metrics.items()})
        if (epoch + 1) % save_every == 0:
            ckpt_io.save_checkpoint(state, ckpt_dir, int(state.step))
            ckpt_io.export_weights(state.params["params"], os.path.join(ckpt_dir, f"s1-e{epoch + 1}.npz"),
                                   config={"model": "s1"}, info=f"{epoch + 1}epoch")
            # reference-format .ckpt, loadable by the PyTorch project too
            # (s1_train.py my_model_ckpt fp16 weights-only export)
            from gpt_sovits_tpu.utils.checkpoint_compat import s1_params_to_torch, save_reference_pth

            save_reference_pth(
                s1_params_to_torch(state.params, cfg),
                os.path.join(ckpt_dir, f"s1-e{epoch + 1}.ckpt"),
                config={"model": {"t2s": "gpt_sovits_tpu"}}, info=f"{epoch + 1}epoch",
            )
    mlog.close()
    log("train-s1 done")


def run_train_s2(
    exp_dir: str,
    ckpt_dir: str,
    *,
    version: str = "v2",
    batch_size: int = 8,
    epochs: int = 8,
    save_every: int = 4,
    pretrained_s2g: Optional[str] = None,
    pretrained_s2d: Optional[str] = None,
    model_cfg=None,
    data_parallel: bool = False,
    log: Callable[..., None] = print,
) -> None:
    """S2 SoVITS GAN training (reference s2_train.py)."""
    import jax

    from gpt_sovits_tpu.train import ckpt as ckpt_io
    from gpt_sovits_tpu.train.data import BucketSampler, S2Dataset, data_iterator
    from gpt_sovits_tpu.train.s2_train import init_state, make_train_step
    from gpt_sovits_tpu.utils.config import MelConfig, TrainConfig, s2_config_for_version

    from gpt_sovits_tpu.utils.metrics import MetricsLogger

    s2 = model_cfg or s2_config_for_version(version)
    tc = TrainConfig(batch_size=batch_size, epochs=epochs)
    mel = MelConfig()
    mesh = _dp_mesh(data_parallel, batch_size)
    ds = S2Dataset(exp_dir, version=version, mel_cfg=mel)
    sampler = BucketSampler(ds.lengths(), seed=tc.seed, **_dp_sampler_args(mesh, tc.batch_size))
    batches = sampler.epoch_batches(0)
    if not batches:
        raise RuntimeError("no training batches (dataset too small for batch size)")
    sample = ds.collate(batches[0])
    state, gen, disc = init_state(jax.random.PRNGKey(tc.seed), s2, tc, {k: jax.numpy.asarray(v) for k, v in sample.items()})
    latest = ckpt_io.latest_checkpoint(ckpt_dir)
    if latest:  # auto-resume newest full ckpt (s2_train.py:206-231)
        state = ckpt_io.load_checkpoint(latest, state)
        log("resumed from", latest)
    else:  # resume-else-pretrained (s2_train.py:232-275)
        from gpt_sovits_tpu.utils.checkpoint_compat import (
            d_params_from_torch,
            load_torch_checkpoint,
            s2_params_from_torch,
        )

        if pretrained_s2g:
            ck = load_torch_checkpoint(pretrained_s2g)
            mapped = s2_params_from_torch(ck.get("weight", ck), s2)
            state = state.replace(params_g={"params": _overlay_params(state.params_g["params"], mapped["params"])})
            log("loaded pretrained", pretrained_s2g)
        if pretrained_s2d:
            ck = load_torch_checkpoint(pretrained_s2d)
            periods = (2, 3, 5, 7, 11, 17, 23) if s2.is_pro else (2, 3, 5, 7, 11)
            mapped = d_params_from_torch(ck.get("weight", ck), periods)
            state = state.replace(params_d={"params": _overlay_params(state.params_d["params"], mapped["params"])})
            log("loaded pretrained", pretrained_s2d)
    step_fn = make_train_step(gen, disc, tc, mel, steps_per_epoch=max(len(batches), 1))
    state, place = _dp_place(mesh, state, lambda b: {k: jax.numpy.asarray(v) for k, v in b.items()})
    mlog = MetricsLogger(os.path.join(ckpt_dir, "logs"), echo=False)
    for epoch in range(tc.epochs):
        for batch in data_iterator(ds, sampler, epoch):
            state, metrics = step_fn(state, place(batch), jax.random.PRNGKey(epoch))
        log(f"epoch {epoch}: " + " ".join(f"{k}={float(v):.3f}" for k, v in metrics.items()))
        mlog.log(int(state.step), **{k: float(v) for k, v in metrics.items()})
        if (epoch + 1) % save_every == 0:
            ckpt_io.save_checkpoint(state, ckpt_dir, int(state.step))
            ckpt_io.export_weights(state.params_g["params"], os.path.join(ckpt_dir, f"s2G-e{epoch + 1}.npz"),
                                   config={"version": version}, info=f"{epoch + 1}epoch")
            # reference-format .pth (process_ckpt.savee container, enc_q
            # dropped) so fine-tunes trained here load in the reference too
            from gpt_sovits_tpu.utils.checkpoint_compat import s2_params_to_torch, save_reference_pth

            sd = s2_params_to_torch(state.params_g, s2)
            save_reference_pth(
                {k: v for k, v in sd.items() if not k.startswith("enc_q.")},
                os.path.join(ckpt_dir, f"s2G-e{epoch + 1}.pth"),
                model_version=version, config={"version": version}, info=f"{epoch + 1}epoch",
            )
    mlog.close()
    log("train-s2 done")


def run_train_v3(
    exp_dir: str,
    ckpt_dir: str,
    *,
    version: str = "v3",
    batch_size: int = 4,
    epochs: int = 4,
    save_every: int = 2,
    lora_rank: int = 0,
    pretrained: Optional[str] = None,
    model_cfg=None,
    data_parallel: bool = False,
    log: Callable[..., None] = print,
) -> None:
    """v3/v4 CFM fine-tune (reference s2_train_v3.py; lora_rank>0 for the
    s2_train_v3_lora.py LoRA variant)."""
    import jax
    import jax.numpy as jnp

    from gpt_sovits_tpu.models.v3 import SynthesizerTrnV3
    from gpt_sovits_tpu.train import ckpt as ckpt_io
    from gpt_sovits_tpu.train.data import BucketSampler, V3Dataset, data_iterator
    from gpt_sovits_tpu.train.s2_train_v3 import (
        V3TrainState,
        init_lora,
        init_state,
        make_lora_optimizer,
        make_lora_train_step,
        make_train_step,
        merge_lora,
    )
    from gpt_sovits_tpu.utils.config import TrainConfig, s2_config_for_version

    from gpt_sovits_tpu.utils.metrics import MetricsLogger

    cfg = model_cfg or s2_config_for_version(version)
    tc = TrainConfig(batch_size=batch_size, epochs=epochs)
    mesh = _dp_mesh(data_parallel, batch_size)
    ds = V3Dataset(exp_dir, version=version)
    sampler = BucketSampler(ds.lengths(), seed=tc.seed, **_dp_sampler_args(mesh, tc.batch_size))
    batches = sampler.epoch_batches(0)
    if not batches:
        raise RuntimeError("no training batches (dataset too small for batch size)")
    sample = {k: jnp.asarray(v) for k, v in ds.collate(batches[0]).items()}
    model = SynthesizerTrnV3(cfg)
    state = init_state(jax.random.PRNGKey(tc.seed), model, tc, sample)
    steps_per_epoch = max(len(batches), 1)
    if lora_rank > 0:
        lora = init_lora(state.params, lora_rank, jax.random.PRNGKey(tc.seed + 1))
        state = V3TrainState(state.step, state.params, make_lora_optimizer(tc, steps_per_epoch).init(lora), lora)
        step_fn = make_lora_train_step(model, tc, steps_per_epoch)
    else:
        step_fn = make_train_step(model, tc, steps_per_epoch)
    latest = ckpt_io.latest_checkpoint(ckpt_dir)
    if latest:  # auto-resume (s2_train_v3.py resume-else-pretrained skeleton)
        state = ckpt_io.load_checkpoint(latest, state)
        log("resumed from", latest)
    elif pretrained:
        from gpt_sovits_tpu.utils.checkpoint_compat import load_torch_checkpoint, s2v3_params_from_torch

        ck = load_torch_checkpoint(pretrained)
        mapped = s2v3_params_from_torch(ck.get("weight", ck), cfg)
        state = state.replace(params={"params": _overlay_params(state.params["params"], mapped["params"])})
        log("loaded pretrained", pretrained)
    state, place = _dp_place(mesh, state, lambda b: {k: jnp.asarray(v) for k, v in b.items()})
    mlog = MetricsLogger(os.path.join(ckpt_dir, "logs"), echo=False)
    for epoch in range(tc.epochs):
        for batch in data_iterator(ds, sampler, epoch):
            state, metrics = step_fn(state, place(batch), jax.random.PRNGKey(epoch))
        log(f"epoch {epoch}: " + " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items()))
        mlog.log(int(state.step), **{k: float(v) for k, v in metrics.items()})
        if (epoch + 1) % save_every == 0:
            ckpt_io.save_checkpoint(state, ckpt_dir, int(state.step))
            params = merge_lora(state.params, state.lora) if state.lora is not None else state.params
            extra = {"lora_rank": lora_rank} if lora_rank > 0 else {}
            ckpt_io.export_weights(
                params["params"], os.path.join(ckpt_dir, f"s2G-{version}-e{epoch + 1}.npz"),
                config={"version": version, **extra}, info=f"{epoch + 1}epoch",
            )
            # reference-format v3/v4 .pth (merged weights, version-byte header)
            from gpt_sovits_tpu.utils.checkpoint_compat import s2v3_params_to_torch, save_reference_pth

            save_reference_pth(
                s2v3_params_to_torch(params, cfg),
                os.path.join(ckpt_dir, f"s2G-{version}-e{epoch + 1}.pth"),
                model_version=version, config={"version": version, **extra}, info=f"{epoch + 1}epoch",
            )
    mlog.close()
    log("train-v3 done")


def latest_step_model(directory: str, ext: str) -> str:
    """Newest-step weight file in a directory (get_trained_models.py:23
    `get_final_step_model` — same filename conventions: `-e15`, `_e48_s336`,
    `step_1000`, `_1000.`)."""
    import re

    if not os.path.isdir(directory):
        return ""
    best, best_step = "", -1
    for f in sorted(os.listdir(directory)):
        if not f.endswith(ext):
            continue
        step = -1
        m = re.search(r"_e(\d+)_s(\d+)", f)
        if m:
            step = int(m.group(2))
        else:
            m = re.search(r"-e(\d+)", f) or re.search(r"step_(\d+)", f) or re.search(r"_(\d+)\.", f)
            if m:
                step = int(m.group(1))
        if step > best_step:
            best, best_step = os.path.join(directory, f), step
    return best
