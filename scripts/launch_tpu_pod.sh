#!/usr/bin/env bash
# Multi-host TPU pod launcher (analog of the reference's SLURM scripts,
# /root/reference/scripts/slurm/train.sh): run the same command on every host
# of a TPU pod slice; jax.distributed.initialize() picks up the topology from
# the TPU runtime environment automatically.
#
# Usage (from a machine with gcloud access to the pod):
#   scripts/launch_tpu_pod.sh <tpu-name> <zone> experiment=train_uncapped_2AA
#
# Single-host multi-chip needs no launcher: jamun-tpu-train uses all local
# chips through the mesh by default.

set -euo pipefail
TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
shift 2

RUN_KEY="run_$(date +%Y%m%d_%H%M%S)"   # rank-consistent run key (train.sh:25-27 parity)

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all --command "
  cd ~/jamun-tpu &&
  python -m jamun_tpu.cmdline.train run_key=$RUN_KEY $*
"
