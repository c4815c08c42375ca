# pocket-tts-tpu serving image (TPU hosts provide libtpu via the runtime).
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml ./
COPY pocket_tts_tpu ./pocket_tts_tpu
COPY scripts ./scripts

RUN pip install --no-cache-dir "jax[tpu]" pydantic pyyaml numpy scipy safetensors \
    huggingface_hub requests

EXPOSE 8000
ENTRYPOINT ["python", "-m", "pocket_tts_tpu"]
CMD ["serve", "--host", "0.0.0.0", "--port", "8000"]
