# memex_tpu service image (reference ships a 2-stage Dockerfile:1-38).
# Assumes a base image with JAX + TPU libtpu preinstalled (e.g. a Cloud TPU
# base); only the native components are built in-image.

FROM python:3.12-slim AS build
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make poppler-utils && rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY native/ native/
RUN make -C native

FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends \
    poppler-utils && rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY --from=build /app/native/build native/build
COPY memex_tpu/ memex_tpu/
COPY examples/ examples/
COPY pyproject.toml README.md ./
# jax[tpu], flax, aiohttp etc. are expected from the base image or:
# RUN pip install "jax[tpu]" flax aiohttp requests safetensors jsonschema

ENV HOST=0.0.0.0 PORT=8181
EXPOSE 8181
CMD ["python", "-m", "memex_tpu", "serve", "--roles", "Api,Worker"]
