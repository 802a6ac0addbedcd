"""Command-line driver.

Single-controller replacement for the reference's webui orchestration
(webui.py spawning every step as a subprocess with env-var config —
SURVEY.md §1 L6). Subcommands mirror the reference workflow:

  slice       cut long recordings at silences        (tools/slicer2.py)
  separate    UVR5 vocal separation                  (tools/uvr5/)
  denoise     spectral-gate denoiser                 (tools/cmd-denoise.py)
  asr         transcribe slices -> .list manifest    (tools/asr/)
  prepare     feature extraction stages 1a/1b/1c     (prepare_datasets/)
  train-s1    AR text->semantic training             (s1_train.py)
  train-s2    SoVITS GAN training                    (s2_train.py)
  train-v3    CFM fine-tune (--lora for LoRA)        (s2_train_v3*.py)
  tts         synthesize from the command line       (inference_cli.py)
  serve       HTTP API                               (api_v2.py)
  export      StableHLO deployment artifacts         (onnx_export.py)
  list-models newest trained weights per version     (get_trained_models.py)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def cmd_slice(args):
    from gpt_sovits_tpu.dsp.audio_io import load_wav, save_wav
    from gpt_sovits_tpu.dsp.slicer import Slicer

    os.makedirs(args.out_dir, exist_ok=True)
    wav, sr = load_wav(args.input)
    slicer = Slicer(sr, threshold=args.threshold, min_length=args.min_length,
                    min_interval=args.min_interval, hop_size=args.hop_size,
                    max_sil_kept=args.max_sil_kept)
    base = os.path.splitext(os.path.basename(args.input))[0]
    for i, chunk in enumerate(slicer.slice(wav)):
        save_wav(os.path.join(args.out_dir, f"{base}_{i:04d}.wav"), chunk, sr)
    print(f"wrote {i + 1} slices to {args.out_dir}")


def cmd_denoise(args):
    from gpt_sovits_tpu.corpus.denoise import spectral_gate
    from gpt_sovits_tpu.dsp.audio_io import load_wav, save_wav

    os.makedirs(args.out_dir, exist_ok=True)
    names = [f for f in os.listdir(args.in_dir) if f.lower().endswith(".wav")]
    for name in names:
        wav, sr = load_wav(os.path.join(args.in_dir, name))
        save_wav(os.path.join(args.out_dir, name), spectral_gate(wav, sr), sr)
    print(f"denoised {len(names)} files -> {args.out_dir}")


def cmd_separate(args):
    """Vocal separation (uvr5 webui equivalent, tools/uvr5/webui.py:45)."""
    from gpt_sovits_tpu.corpus.uvr5 import separate_vocals
    from gpt_sovits_tpu.dsp.audio_io import load_wav, save_wav

    os.makedirs(args.vocal_dir, exist_ok=True)
    os.makedirs(args.other_dir, exist_ok=True)
    paths = (
        [os.path.join(args.in_dir, f) for f in sorted(os.listdir(args.in_dir)) if f.lower().endswith(".wav")]
        if args.in_dir
        else [args.input]
    )
    for path in paths:
        wav, sr = load_wav(path, mono=False)
        if wav.ndim == 2:
            wav = wav.T  # (L, C) -> (C, L)
        vocals, other = separate_vocals(
            wav, sr, backend=args.backend, model_path=args.model, config_path=args.config, agg=args.agg
        )
        base = os.path.splitext(os.path.basename(path))[0]
        save_wav(os.path.join(args.vocal_dir, f"vocal_{base}.wav"), vocals.T if vocals.ndim == 2 else vocals, sr)
        save_wav(os.path.join(args.other_dir, f"instrument_{base}.wav"), other.T if other.ndim == 2 else other, sr)
    print(f"separated {len(paths)} files -> {args.vocal_dir} / {args.other_dir}")


def cmd_prepare(args):
    import jax

    from gpt_sovits_tpu.prepare import extract
    from gpt_sovits_tpu.utils.loaders import load_bert, load_hubert, load_s2, load_sv

    os.makedirs(args.exp_dir, exist_ok=True)
    for problem in extract.check_details(list_file=args.list):  # my_utils.check_details
        print(f"warning: {problem}", file=sys.stderr)

    bert_fn = None
    if args.bert:
        import jax.numpy as jnp

        bert, bert_params, tok = load_bert(args.bert)

        def bert_fn(norm_text, word2ph):
            ids = tok(norm_text, return_tensors="np")["input_ids"]
            hidden = np.asarray(bert.apply(bert_params, jnp.asarray(ids))[-3])[0, 1:-1]
            return np.repeat(hidden, word2ph, axis=0)

    extract.prepare_text(args.list, args.exp_dir, version=args.version, bert_fn=bert_fn)
    extract.merge_text_shards(args.exp_dir, 1)

    hubert, hubert_params = load_hubert(args.hubert)
    if hubert_params is not None:
        import jax.numpy as jnp

        hub_fwd = jax.jit(hubert.apply)
        extract.prepare_audio(args.list, args.exp_dir, hubert_fn=lambda w: np.asarray(hub_fwd(hubert_params, jnp.asarray(w[None])))[0])

    if args.s2:
        import jax.numpy as jnp

        model, params, _ = load_s2(args.s2, args.version if args.version in ("v1", "v2") else None)
        ext = jax.jit(lambda s: model.apply(params, s, method=type(model).extract_latent))
        extract.prepare_semantic(args.list, args.exp_dir, extract_latent_fn=lambda ssl: np.asarray(ext(jnp.asarray(ssl[None])))[0])
        extract.merge_semantic_shards(args.exp_dir, 1)

    if args.sv:
        import jax.numpy as jnp

        from gpt_sovits_tpu.models.eres2net import kaldi_fbank

        sv_model, sv_params = load_sv(args.sv)
        fwd = jax.jit(lambda w: sv_model.apply(sv_params, kaldi_fbank(w)))
        extract.prepare_sv(args.list, args.exp_dir, sv_fn=lambda w: np.asarray(fwd(jnp.asarray(w[None])))[0])
    print("prepare done:", args.exp_dir)


def cmd_train_s1(args):
    import jax

    from gpt_sovits_tpu.models.t2s import T2SDecoder
    from gpt_sovits_tpu.train import ckpt as ckpt_io
    from gpt_sovits_tpu.train.data import BucketSampler, S1Dataset, data_iterator
    from gpt_sovits_tpu.train.s1_train import init_state, make_train_step
    from gpt_sovits_tpu.utils.config import S1Config, TrainConfig

    cfg = S1Config()
    tc = TrainConfig(batch_size=args.batch_size, epochs=args.epochs, grad_accum=4)
    model = T2SDecoder(cfg)
    ds = S1Dataset(args.exp_dir)
    sampler = BucketSampler(ds.lengths(), tc.batch_size, seed=tc.seed)
    state = init_state(jax.random.PRNGKey(tc.seed), model, tc)
    latest = ckpt_io.latest_checkpoint(args.ckpt_dir)
    if latest:
        state = ckpt_io.load_checkpoint(latest, state)
        print("resumed from", latest)
    elif getattr(args, "pretrained_s1", None):
        from gpt_sovits_tpu.utils.checkpoint_compat import load_torch_checkpoint, s1_params_from_torch

        ck = load_torch_checkpoint(args.pretrained_s1)
        mapped = s1_params_from_torch(ck.get("weight", ck), cfg)
        state = state.replace(params={"params": _overlay_params(state.params["params"], mapped["params"])})
        print("loaded pretrained", args.pretrained_s1)
    step_fn = make_train_step(model, tc, use_dpo=args.dpo)
    for epoch in range(tc.epochs):
        for batch in data_iterator(ds, sampler, epoch):
            state, metrics = step_fn(state, {k: jax.numpy.asarray(v) for k, v in batch.items()}, jax.random.PRNGKey(epoch))
        print(f"epoch {epoch}: loss={float(metrics['loss']):.3f} acc={float(metrics['acc']):.3f}")
        if (epoch + 1) % args.save_every == 0:
            ckpt_io.save_checkpoint(state, args.ckpt_dir, int(state.step))
            ckpt_io.export_weights(state.params["params"], os.path.join(args.ckpt_dir, f"s1-e{epoch + 1}.npz"),
                                   config={"model": "s1"}, info=f"{epoch + 1}epoch")
            # reference-format .ckpt, loadable by the PyTorch project too
            # (s1_train.py my_model_ckpt fp16 weights-only export)
            from gpt_sovits_tpu.utils.checkpoint_compat import s1_params_to_torch, save_reference_pth

            save_reference_pth(
                s1_params_to_torch(state.params, cfg),
                os.path.join(args.ckpt_dir, f"s1-e{epoch + 1}.ckpt"),
                config={"model": {"t2s": "gpt_sovits_tpu"}}, info=f"{epoch + 1}epoch",
            )
    print("train-s1 done")


def cmd_train_s2(args):
    import jax

    from gpt_sovits_tpu.train import ckpt as ckpt_io
    from gpt_sovits_tpu.train.data import BucketSampler, S2Dataset, data_iterator
    from gpt_sovits_tpu.train.s2_train import init_state, make_train_step
    from gpt_sovits_tpu.utils.config import MelConfig, TrainConfig, s2_config_for_version

    s2 = s2_config_for_version(args.version)
    tc = TrainConfig(batch_size=args.batch_size, epochs=args.epochs)
    mel = MelConfig()
    ds = S2Dataset(args.exp_dir, version=args.version, mel_cfg=mel)
    sampler = BucketSampler(ds.lengths(), tc.batch_size, seed=tc.seed)
    batches = sampler.epoch_batches(0)
    if not batches:
        sys.exit("no training batches (dataset too small for batch size)")
    sample = ds.collate(batches[0])
    state, gen, disc = init_state(jax.random.PRNGKey(tc.seed), s2, tc, {k: jax.numpy.asarray(v) for k, v in sample.items()})
    latest = ckpt_io.latest_checkpoint(args.ckpt_dir)
    if latest:  # auto-resume newest full ckpt (s2_train.py:206-231)
        state = ckpt_io.load_checkpoint(latest, state)
        print("resumed from", latest)
    else:  # resume-else-pretrained (s2_train.py:232-275)
        from gpt_sovits_tpu.utils.checkpoint_compat import (
            d_params_from_torch,
            load_torch_checkpoint,
            s2_params_from_torch,
        )

        if getattr(args, "pretrained_s2g", None):
            ck = load_torch_checkpoint(args.pretrained_s2g)
            mapped = s2_params_from_torch(ck.get("weight", ck), s2)
            state = state.replace(params_g={"params": _overlay_params(state.params_g["params"], mapped["params"])})
            print("loaded pretrained", args.pretrained_s2g)
        if getattr(args, "pretrained_s2d", None):
            ck = load_torch_checkpoint(args.pretrained_s2d)
            periods = (2, 3, 5, 7, 11, 17, 23) if s2.is_pro else (2, 3, 5, 7, 11)
            mapped = d_params_from_torch(ck.get("weight", ck), periods)
            state = state.replace(params_d={"params": _overlay_params(state.params_d["params"], mapped["params"])})
            print("loaded pretrained", args.pretrained_s2d)
    step_fn = make_train_step(gen, disc, tc, mel, steps_per_epoch=max(len(batches), 1))
    for epoch in range(tc.epochs):
        for batch in data_iterator(ds, sampler, epoch):
            state, metrics = step_fn(state, {k: jax.numpy.asarray(v) for k, v in batch.items()}, jax.random.PRNGKey(epoch))
        print(f"epoch {epoch}: " + " ".join(f"{k}={float(v):.3f}" for k, v in metrics.items()))
        if (epoch + 1) % args.save_every == 0:
            ckpt_io.save_checkpoint(state, args.ckpt_dir, int(state.step))
            ckpt_io.export_weights(state.params_g["params"], os.path.join(args.ckpt_dir, f"s2G-e{epoch + 1}.npz"),
                                   config={"version": args.version}, info=f"{epoch + 1}epoch")
            # reference-format .pth (process_ckpt.savee container, enc_q
            # dropped) so fine-tunes trained here load in the reference too
            from gpt_sovits_tpu.utils.checkpoint_compat import s2_params_to_torch, save_reference_pth

            sd = s2_params_to_torch(state.params_g, s2)
            save_reference_pth(
                {k: v for k, v in sd.items() if not k.startswith("enc_q.")},
                os.path.join(args.ckpt_dir, f"s2G-e{epoch + 1}.pth"),
                model_version=args.version, config={"version": args.version}, info=f"{epoch + 1}epoch",
            )
    print("train-s2 done")


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


def cmd_train_v3(args):
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

    cfg = s2_config_for_version(args.version)
    tc = TrainConfig(batch_size=args.batch_size, epochs=args.epochs)
    ds = V3Dataset(args.exp_dir, version=args.version)
    sampler = BucketSampler(ds.lengths(), tc.batch_size, seed=tc.seed)
    batches = sampler.epoch_batches(0)
    if not batches:
        sys.exit("no training batches (dataset too small for batch size)")
    sample = {k: jnp.asarray(v) for k, v in ds.collate(batches[0]).items()}
    model = SynthesizerTrnV3(cfg)
    state = init_state(jax.random.PRNGKey(tc.seed), model, tc, sample)
    steps_per_epoch = max(len(batches), 1)
    if args.lora_rank > 0:
        lora = init_lora(state.params, args.lora_rank, jax.random.PRNGKey(tc.seed + 1))
        state = V3TrainState(state.step, state.params, make_lora_optimizer(tc, steps_per_epoch).init(lora), lora)
        step_fn = make_lora_train_step(model, tc, steps_per_epoch)
    else:
        step_fn = make_train_step(model, tc, steps_per_epoch)
    latest = ckpt_io.latest_checkpoint(args.ckpt_dir)
    if latest:  # auto-resume (s2_train_v3.py resume-else-pretrained skeleton)
        state = ckpt_io.load_checkpoint(latest, state)
        print("resumed from", latest)
    elif getattr(args, "pretrained", None):
        from gpt_sovits_tpu.utils.checkpoint_compat import load_torch_checkpoint, s2v3_params_from_torch

        ck = load_torch_checkpoint(args.pretrained)
        mapped = s2v3_params_from_torch(ck.get("weight", ck), cfg)
        state = state.replace(params={"params": _overlay_params(state.params["params"], mapped["params"])})
        print("loaded pretrained", args.pretrained)
    for epoch in range(tc.epochs):
        for batch in data_iterator(ds, sampler, epoch):
            state, metrics = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()}, jax.random.PRNGKey(epoch))
        print(f"epoch {epoch}: " + " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items()))
        if (epoch + 1) % args.save_every == 0:
            ckpt_io.save_checkpoint(state, args.ckpt_dir, int(state.step))
            params = merge_lora(state.params, state.lora) if state.lora is not None else state.params
            extra = {"lora_rank": args.lora_rank} if args.lora_rank > 0 else {}
            ckpt_io.export_weights(
                params["params"], os.path.join(args.ckpt_dir, f"s2G-{args.version}-e{epoch + 1}.npz"),
                config={"version": args.version, **extra}, info=f"{epoch + 1}epoch",
            )
            # reference-format v3/v4 .pth (merged weights, version-byte header)
            from gpt_sovits_tpu.utils.checkpoint_compat import s2v3_params_to_torch, save_reference_pth

            save_reference_pth(
                s2v3_params_to_torch(params, cfg),
                os.path.join(args.ckpt_dir, f"s2G-{args.version}-e{epoch + 1}.pth"),
                model_version=args.version, config={"version": args.version, **extra}, info=f"{epoch + 1}epoch",
            )
    print("train-v3 done")


def cmd_tts(args):
    from gpt_sovits_tpu.dsp.audio_io import save_wav
    from gpt_sovits_tpu.utils.loaders import build_pipeline

    pipe = build_pipeline(
        s1_path=args.s1, s2_path=args.s2, version=args.version,
        hubert_path=args.hubert, bert_path=args.bert, sv_path=args.sv,
    )
    pipe.set_ref_audio(args.ref_audio, ref_text=args.ref_text)
    sr, audio = pipe.run(args.text, args.lang, seed=args.seed, cut_method=args.cut)
    save_wav(args.output, audio.astype(np.float32) / 32768.0, sr)
    print(f"wrote {args.output} ({len(audio) / sr:.2f}s @ {sr} Hz)")


def cmd_serve(args):
    from gpt_sovits_tpu.serve.api import TTSService, serve
    from gpt_sovits_tpu.utils.loaders import build_pipeline

    pipe = build_pipeline(
        s1_path=args.s1, s2_path=args.s2, version=args.version,
        hubert_path=args.hubert, bert_path=args.bert, sv_path=args.sv,
    )
    service = TTSService(pipe)
    server = serve(service, host=args.host, port=args.port)
    print(f"serving on {args.host}:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


def cmd_asr(args):
    """Transcribe a directory of slices into the training `.list` manifest
    (tools/asr/ equivalent; external ASR backends are optional deps)."""
    from gpt_sovits_tpu.corpus.asr import transcribe_dir

    out = transcribe_dir(args.in_dir, args.output, language=args.language, speaker=args.speaker)
    print(f"wrote manifest: {out}")


def _latest_step_model(directory: str, ext: str) -> str:
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


def cmd_list_models(args):
    """List trained weights per version dir as JSON (get_trained_models.py)."""
    import json

    out = {}
    for version in ("v1", "v2", "v2Pro", "v2ProPlus", "v3", "v4"):
        suffix = "" if version == "v1" else f"_{version}"
        gpt = _latest_step_model(os.path.join(args.root, f"GPT_weights{suffix}"), ".ckpt")
        sovits = _latest_step_model(os.path.join(args.root, f"SoVITS_weights{suffix}"), ".pth")
        if gpt or sovits:
            out[version] = {"gpt": gpt, "sovits": sovits}
    print(json.dumps(out, indent=2))


def cmd_export(args):
    from gpt_sovits_tpu.utils.export import export_s1_step, export_s2_decode
    from gpt_sovits_tpu.utils.loaders import load_s1, load_s2

    os.makedirs(args.out_dir, exist_ok=True)
    if args.s1:
        model, params = load_s1(args.s1)
        blob = export_s1_step(model, params)
        open(os.path.join(args.out_dir, "s1_step.stablehlo"), "wb").write(blob)
    if args.s2:
        model, params, version = load_s2(args.s2, args.version)
        blob = export_s2_decode(model, params)
        open(os.path.join(args.out_dir, f"s2_decode_{version}.stablehlo"), "wb").write(blob)
    print("export done:", args.out_dir)


def main(argv=None):
    p = argparse.ArgumentParser(prog="gpt_sovits_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("slice")
    s.add_argument("input")
    s.add_argument("--out-dir", required=True)
    s.add_argument("--threshold", type=float, default=-34.0)
    s.add_argument("--min-length", type=int, default=4000)
    s.add_argument("--min-interval", type=int, default=300)
    s.add_argument("--hop-size", type=int, default=10)
    s.add_argument("--max-sil-kept", type=int, default=500)
    s.set_defaults(fn=cmd_slice)

    s = sub.add_parser("denoise")
    s.add_argument("--in-dir", required=True)
    s.add_argument("--out-dir", required=True)
    s.set_defaults(fn=cmd_denoise)

    s = sub.add_parser("prepare")
    s.add_argument("--list", required=True)
    s.add_argument("--exp-dir", required=True)
    s.add_argument("--version", default="v2")
    s.add_argument("--bert")
    s.add_argument("--hubert")
    s.add_argument("--s2")
    s.add_argument("--sv")
    s.set_defaults(fn=cmd_prepare)

    s = sub.add_parser("train-s1")
    s.add_argument("--exp-dir", required=True)
    s.add_argument("--ckpt-dir", required=True)
    s.add_argument("--batch-size", type=int, default=8)
    s.add_argument("--epochs", type=int, default=15)
    s.add_argument("--save-every", type=int, default=5)
    s.add_argument("--dpo", action="store_true")
    s.add_argument("--pretrained-s1", help="reference s1*.ckpt to fine-tune from")
    s.set_defaults(fn=cmd_train_s1)

    s = sub.add_parser("train-s2")
    s.add_argument("--exp-dir", required=True)
    s.add_argument("--ckpt-dir", required=True)
    s.add_argument("--version", default="v2")
    s.add_argument("--batch-size", type=int, default=8)
    s.add_argument("--epochs", type=int, default=8)
    s.add_argument("--save-every", type=int, default=4)
    s.add_argument("--pretrained-s2g", help="reference s2G*.pth to fine-tune from")
    s.add_argument("--pretrained-s2d", help="reference s2D*.pth discriminator warm start")
    s.set_defaults(fn=cmd_train_s2)

    s = sub.add_parser("train-v3", help="v3/v4 CFM fine-tune (s2_train_v3.py; --lora-rank for LoRA)")
    s.add_argument("--exp-dir", required=True)
    s.add_argument("--ckpt-dir", required=True)
    s.add_argument("--version", default="v3", choices=["v3", "v4"])
    s.add_argument("--batch-size", type=int, default=4)
    s.add_argument("--epochs", type=int, default=4)
    s.add_argument("--save-every", type=int, default=2)
    s.add_argument("--lora-rank", type=int, default=0, help=">0: train LoRA deltas only (s2_train_v3_lora.py)")
    s.add_argument("--pretrained", help="reference v3/v4 SoVITS .pth to fine-tune from")
    s.set_defaults(fn=cmd_train_v3)

    s = sub.add_parser("tts")
    s.add_argument("--text", required=True)
    s.add_argument("--lang", default="auto")
    s.add_argument("--ref-audio", required=True)
    s.add_argument("--ref-text")
    s.add_argument("--output", default="output.wav")
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--cut", default="cut5")
    s.add_argument("--s1")
    s.add_argument("--s2")
    s.add_argument("--version")
    s.add_argument("--hubert")
    s.add_argument("--bert")
    s.add_argument("--sv")
    s.set_defaults(fn=cmd_tts)

    s = sub.add_parser("serve")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=9880)
    s.add_argument("--s1")
    s.add_argument("--s2")
    s.add_argument("--version")
    s.add_argument("--hubert")
    s.add_argument("--bert")
    s.add_argument("--sv")
    s.set_defaults(fn=cmd_serve)

    s = sub.add_parser("export")
    s.add_argument("--out-dir", required=True)
    s.add_argument("--s1")
    s.add_argument("--s2")
    s.add_argument("--version")
    s.set_defaults(fn=cmd_export)

    s = sub.add_parser("asr", help="transcribe slices into the training .list manifest (tools/asr)")
    s.add_argument("--in-dir", required=True)
    s.add_argument("--output", required=True, help="path of the .list manifest to write")
    s.add_argument("--language", default="zh")
    s.add_argument("--speaker", default="speaker")
    s.set_defaults(fn=cmd_asr)

    s = sub.add_parser("list-models", help="newest trained GPT/SoVITS weights per version (get_trained_models.py)")
    s.add_argument("--root", default=".", help="directory holding GPT_weights*/SoVITS_weights* dirs")
    s.set_defaults(fn=cmd_list_models)

    s = sub.add_parser("separate", help="UVR5 vocal separation (roformer/vr/mdx/hpss)")
    g = s.add_mutually_exclusive_group(required=True)
    g.add_argument("--input")
    g.add_argument("--in-dir")
    s.add_argument("--vocal-dir", required=True)
    s.add_argument("--other-dir", required=True)
    s.add_argument("--model", help="UVR5 weight file (.ckpt/.pth/.onnx); omit for HPSS fallback")
    s.add_argument("--config", help="roformer YAML (optional)")
    s.add_argument("--backend", default="auto", choices=["auto", "roformer", "vr", "mdx", "hpss"])
    s.add_argument("--agg", type=int, default=10, help="VR aggressiveness 0-100")
    s.set_defaults(fn=cmd_separate)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
