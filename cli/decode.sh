#!/bin/bash
# SLURM wrapper for pasero-decode (pasero/cli/decode.sh).
trap 'kill -INT $PID' INT
trap 'kill -TERM $PID' TERM
python -m cli.decode "$@" &
PID=$!
wait $PID
exit $?
