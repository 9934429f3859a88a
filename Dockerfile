# Containerized run environment for dynode_tpu.
#
# The reference ships a CPU container (reference: Dockerfile:1, python:3.10 +
# poetry + /input and /output experiment mounts). This image keeps the same
# mount contract but installs the TPU stack: on a Cloud TPU VM run it with
# `--privileged --net=host` so libtpu can reach the chips; anywhere else it
# falls back to the CPU backend automatically.
#
# Build:  docker build -t dynode-tpu .
# Run:    docker run --privileged --net=host \
#           -v "$PWD/experiment:/input" -v "$PWD/results:/output" dynode-tpu \
#           python /input/run.py

FROM python:3.12-slim

# experiment-definition mount (read) and results mount (write)
RUN mkdir /input /output /app
WORKDIR /app

# install the framework itself (wheel ships dynode_tpu + the `dynode`
# compatibility alias); jax[tpu] brings libtpu for Cloud TPU VMs
COPY pyproject.toml README.md LICENSE /app/
COPY dynode_tpu/ /app/dynode_tpu/
COPY dynode/ /app/dynode/
RUN pip install --no-cache-dir "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
 && pip install --no-cache-dir /app

# persistent XLA compile cache across container restarts (mount a volume
# over /cache to keep warm-start compile times; see
# dynode_tpu.enable_compilation_cache)
ENV DYNODE_COMPILATION_CACHE=/cache
RUN mkdir /cache

CMD ["python", "-c", "import dynode_tpu, jax; print(dynode_tpu.__version__, jax.devices())"]
