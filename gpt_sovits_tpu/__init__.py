"""gpt_sovits_tpu — a TPU-native few-shot voice-cloning TTS framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of GPT-SoVITS
(reference: lesliegaga/GPT-SoVITS): a two-stage pipeline where an
autoregressive text-to-semantic transformer (S1) feeds a VITS-derived /
flow-matching acoustic decoder (S2), with CNHuBERT-style SSL features, BERT
text features and speaker-verification timbre conditioning.

Layout (mirrors SURVEY.md section 1's layer map, TPU-first):
  dsp/       L0 audio/DSP primitives (STFT/mel as MXU matmuls, SOLA, slicer)
  text/      L1 text frontend (g2p, normalization, symbols, segmentation)
  models/    L2+L3 neural blocks and model families (S1 AR, VITS, CFM-DiT,
             vocoders, SSL encoder, speaker embedder)
  ops/       Pallas TPU kernels + XLA-level fused ops
  parallel/  mesh construction, sharding rules, collectives
  train/     jitted train steps (S1, S2-GAN, S2-CFM, LoRA), data, checkpoints
  infer/     the serving pipeline (reference: TTS_infer_pack/TTS.py)
  serve/     HTTP API (reference: api_v2.py)
  prepare/   dataset feature-extraction stages (reference: prepare_datasets/)
  utils/     config trees, reference-checkpoint interop, logging
"""

__version__ = "0.1.0"
