# quiver-tpu container image (reference: Dockerfile — two-stage, non-root,
# healthcheck, env-var config surface). JAX wheels are large; the TPU wheel
# is selected at build time via JAX_VARIANT (cpu for local dev, tpu for
# Cloud TPU VMs).
FROM python:3.12-slim AS builder
ARG JAX_VARIANT=cpu
WORKDIR /build
COPY pyproject.toml README.md ./
COPY quiver_tpu ./quiver_tpu
# build the native WAL engine from source so the image never ships a
# checked-in binary (quiver_tpu/native/Makefile)
RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/* \
    && make -C quiver_tpu/native
RUN pip install --no-cache-dir --prefix=/install . \
    && if [ "$JAX_VARIANT" = "tpu" ]; then \
         pip install --no-cache-dir --prefix=/install 'jax[tpu]' \
           -f https://storage.googleapis.com/jax-releases/libtpu_releases.html; \
       fi

FROM python:3.12-slim
RUN useradd --create-home --uid 10001 quiver
COPY --from=builder /install /usr/local
USER quiver
WORKDIR /home/quiver
ENV QUIVER_DATA_DIR=/home/quiver/data \
    QUIVER_HOST=0.0.0.0 \
    QUIVER_PORT=8080 \
    QUIVER_METRICS_PORT=9090 \
    QUIVER_DEFAULT_ENGINE=hybrid \
    QUIVER_LOG_LEVEL=info
EXPOSE 8080 9090
HEALTHCHECK --interval=30s --timeout=5s --start-period=30s \
    CMD python -c "import urllib.request,os;urllib.request.urlopen(f'http://127.0.0.1:{os.environ.get(\"QUIVER_PORT\",8080)}/health',timeout=3)" || exit 1
VOLUME ["/home/quiver/data"]
ENTRYPOINT ["quiver-tpu"]
CMD ["serve"]
