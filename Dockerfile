# gpt_sovits_tpu — TPU-native serving/training image.
# For Cloud TPU VMs use a jax[tpu] wheel matching the runtime.
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY gpt_sovits_tpu ./gpt_sovits_tpu

RUN pip install --no-cache-dir -e . \
    && pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html || \
       pip install --no-cache-dir jax  # CPU fallback for non-TPU hosts

EXPOSE 9880 9881
ENTRYPOINT ["python", "-m", "gpt_sovits_tpu.cli"]
CMD ["serve", "--host", "0.0.0.0", "--port", "9880"]
