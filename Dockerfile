# Runtime image for the TPU-native Outline RAG service.
#
# Two stages: a build stage compiles the native library and minified
# assets; the runtime stage carries only what serving needs. The JAX TPU
# runtime comes from the base image appropriate to the deployment (Cloud
# TPU VMs ship their own libtpu); CPU fallback works out of the box.

FROM python:3.12-slim AS build
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*
WORKDIR /src
COPY . .
RUN make -C outline_rag_tpu/native \
    && python tools/build_assets.py

FROM python:3.12-slim
WORKDIR /app
COPY --from=build /src /app
RUN pip install --no-cache-dir \
        "jax[tpu]" numpy httpx cryptography optax \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax numpy httpx cryptography optax
RUN pip install --no-cache-dir -e . --no-deps

ENV HOST=0.0.0.0 PORT=8000 DATA_DIR=/data
VOLUME /data
EXPOSE 8000
HEALTHCHECK --interval=30s --timeout=5s \
    CMD python -c "import urllib.request,os;urllib.request.urlopen(f'http://127.0.0.1:{os.environ.get(\"PORT\",8000)}/healthz')" || exit 1
ENTRYPOINT ["/bin/sh", "/app/entrypoint.sh"]
