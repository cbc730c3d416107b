# theia-tpu runtime container (TPU-host analogue of the reference's CUDA
# Dockerfile, /root/reference/Dockerfile:2-7: pin base image + python, install
# the framework and its deps). TPU VMs talk to the chips through libtpu,
# which ships inside the jax[tpu] wheel — no driver layer in the image.
ARG UBUNTU_VER=22.04
FROM ubuntu:${UBUNTU_VER}

SHELL ["/bin/bash", "-o", "pipefail", "-c"]
ARG DEBIAN_FRONTEND="noninteractive"
ENV LANG="C.UTF-8" LC_ALL="C.UTF-8"

ARG PYTHON_VER=3.10
RUN apt-get update \
    && apt-get install -y --no-install-recommends \
        python${PYTHON_VER} python${PYTHON_VER}-dev python3-pip \
        build-essential g++ \
        ffmpeg libgl1 libglib2.0-0 \
        ca-certificates git curl \
    && rm -rf /var/lib/apt/lists/* \
    && ln -sf /usr/bin/python${PYTHON_VER} /usr/local/bin/python

RUN python -m pip install --no-cache-dir --upgrade "pip>=24" "setuptools>=69" "wheel>=0.42"

# jax[tpu] pulls the matching libtpu; pin the floor the framework needs
# (jit(compiler_options=...) landed in 0.9).
RUN python -m pip install --no-cache-dir \
      "jax[tpu]>=0.9" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

WORKDIR /opt/theia-tpu
COPY pyproject.toml README.md ./
COPY theia_tpu ./theia_tpu
# extras mirror the reference's runtime: decode (opencv/sklearn viz),
# torch+transformers (HF weight import + teacher parity), video (av)
RUN python -m pip install --no-cache-dir ".[decode,torch,video,test]"

# multi-host training entry: each TPU-VM worker runs the same command; host
# topology comes from the TPU metadata (jax.distributed.initialize()).
ENTRYPOINT ["theia-train"]
CMD ["--help"]
