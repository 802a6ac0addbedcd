#!/usr/bin/env bash
# Install gpt_sovits_tpu + (optionally) download pretrained assets.
# Counterpart of the reference install.sh (device/source selection there
# becomes a jax-variant choice here: tpu | cpu).
set -euo pipefail

DEVICE=tpu
DOWNLOAD=0
for arg in "$@"; do
  case "$arg" in
    --device=*) DEVICE="${arg#*=}" ;;
    --download-models) DOWNLOAD=1 ;;
    -h|--help)
      echo "usage: install.sh [--device=tpu|cpu] [--download-models]"; exit 0 ;;
    *) echo "unknown arg: $arg" >&2; exit 1 ;;
  esac
done

python -m pip install -e .

case "$DEVICE" in
  tpu) python -m pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html ;;
  cpu) python -m pip install jax ;;
  *) echo "unknown device: $DEVICE" >&2; exit 1 ;;
esac

if [ "$DOWNLOAD" = 1 ]; then
  python -c "from gpt_sovits_tpu.utils.download import download_all; download_all('pretrained_models')"
fi
echo "install done (device=$DEVICE)"
