#!/bin/bash
# End-to-end few-shot fine-tune + inference from the command line.
# Counterpart of the reference's test_demo.sh (9-step pipeline): slice ->
# denoise -> ASR -> feature extraction -> SoVITS training -> GPT training ->
# synthesis, all through the single-controller CLI (no subprocess/env-var
# orchestration).
set -euo pipefail

INPUT_AUDIO=${INPUT_AUDIO:-input_audio/speaker.wav}   # a >=1 min recording
WORK=${WORK:-./work}
EXP=${EXP:-my_speaker}
LANG=${LANG_ID:-zh}

# pretrained assets (download once; see gpt_sovits_tpu/utils/download.py)
BERT=${BERT:-pretrained_models/chinese-roberta-wwm-ext-large}
HUBERT=${HUBERT:-pretrained_models/chinese-hubert-base}
PRETRAINED_S2G=${PRETRAINED_S2G:-pretrained_models/gsv-v2final-pretrained/s2G2333k.pth}
PRETRAINED_S2D=${PRETRAINED_S2D:-pretrained_models/gsv-v2final-pretrained/s2D2333k.pth}
PRETRAINED_S1=${PRETRAINED_S1:-pretrained_models/gsv-v2final-pretrained/s1bert25hz-5kh-longer-epoch=12-step=369668.ckpt}

CLI="python -m gpt_sovits_tpu.cli"

echo "== 1/7 slice =="
$CLI slice "$INPUT_AUDIO" --out-dir "$WORK/sliced"

echo "== 2/7 denoise =="
$CLI denoise --in-dir "$WORK/sliced" --out-dir "$WORK/denoised"

echo "== 3/7 asr -> .list manifest =="
$CLI asr --in-dir "$WORK/denoised" --output "$WORK/$EXP.list" --language "$LANG" --speaker "$EXP"

echo "== 4/7 feature extraction (stages 1a/1b/1c) =="
$CLI prepare --list "$WORK/$EXP.list" --exp-dir "$WORK/exp/$EXP" \
  --version v2 --bert "$BERT" --hubert "$HUBERT" --s2 "$PRETRAINED_S2G"

echo "== 5/7 SoVITS (S2) fine-tune =="
$CLI train-s2 --exp-dir "$WORK/exp/$EXP" --ckpt-dir "$WORK/ckpt/$EXP/s2" \
  --version v2 --batch-size 8 --epochs 8 --save-every 4 \
  --pretrained-s2g "$PRETRAINED_S2G" --pretrained-s2d "$PRETRAINED_S2D"

echo "== 6/7 GPT (S1) fine-tune =="
$CLI train-s1 --exp-dir "$WORK/exp/$EXP" --ckpt-dir "$WORK/ckpt/$EXP/s1" \
  --batch-size 8 --epochs 15 --save-every 5 --pretrained-s1 "$PRETRAINED_S1"

echo "== 7/7 synthesize =="
REF_WAV=$(ls "$WORK/denoised"/*.wav | head -1)
REF_TEXT=$(head -1 "$WORK/$EXP.list" | awk -F'|' '{print $4}')
S1_CKPT=$(ls -v "$WORK/ckpt/$EXP/s1"/s1-e*.ckpt | tail -1)
S2_CKPT=$(ls -v "$WORK/ckpt/$EXP/s2"/s2G-e*.pth | tail -1)
$CLI tts --text "欢迎使用TPU原生的语音合成框架。" --lang "$LANG" \
  --ref-audio "$REF_WAV" --ref-text "$REF_TEXT" \
  --s1 "$S1_CKPT" --s2 "$S2_CKPT" \
  --hubert "$HUBERT" --bert "$BERT" --output "$WORK/out.wav"
echo "wrote $WORK/out.wav"
