# TPU-native ddpm_diffusion_model_tpu runtime image.
# Counterpart of the reference's CUDA image (its Dockerfile pins
# pytorch/pytorch:2.1.0-cuda11.8 and CUDA_VISIBLE_DEVICES=0); here the base
# is plain Python + jax[tpu] over libtpu, and the native decode pipeline's
# build deps (g++, libjpeg/libpng headers) are included.

FROM python:3.12-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libjpeg-dev libpng-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint chex einops numpy pillow datasets pytest

COPY ddpm_diffusion_model_tpu /workspace/ddpm_diffusion_model_tpu
COPY tests /workspace/tests
COPY bench.py README.md /workspace/

ENV PYTHONPATH=/workspace

RUN mkdir -p /workspace/data /workspace/checkpoints /workspace/samples

CMD ["python", "-m", "ddpm_diffusion_model_tpu.cli", "train", "--preset", \
     "celeba64_low", "--data", "synthetic", "--epochs", "1", "--no-samples"]
