#!/usr/bin/env bash
# Single-host launch (reference: `run` — accelerate launch over 7 GPUs).
# On TPU a single process drives all local chips; batch size scales by chip
# count through the mesh, not by process fan-out.
#
# Usage: scripts/run.sh {train|eval} configs/<workload>.yaml [K V ...]
set -euo pipefail
CMD=${1:?train|eval}; CONF=${2:?config yaml}; shift 2
exec python -m cullavo_tpu.entry "$CMD" --conf_files "$CONF" ${@:+--overrides "$@"}
