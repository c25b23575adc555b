#!/usr/bin/env bash
# Multi-host launch (reference: `node_run` — accelerate --num_machines 2 with
# static rendezvous).  TPU pods: run this same script on every host; JAX picks
# hosts up from the TPU runtime, or pass an explicit coordinator for CPU/GPU
# style rendezvous.
#
# Usage: COORDINATOR=host:port NUM_PROCS=2 PROC_ID=0 scripts/node_run.sh train configs/x.yaml
set -euo pipefail
CMD=${1:?train|eval}; CONF=${2:?config yaml}; shift 2
export CULLAVO_COORDINATOR=${COORDINATOR:-}
export CULLAVO_NUM_PROCS=${NUM_PROCS:-}
export CULLAVO_PROC_ID=${PROC_ID:-}
exec python -m cullavo_tpu.entry "$CMD" --conf_files "$CONF" ${@:+--overrides "$@"}
