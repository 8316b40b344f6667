#!/bin/bash
# SLURM wrapper for pasero-train (pasero/cli/train.sh): forwards INT/TERM/USR1
# so the trainer can checkpoint (exit 143 triggers SLURM requeue) or warm-restart.
trap 'kill -INT $PID' INT
trap 'kill -TERM $PID' TERM
trap 'kill -USR1 $PID' USR1
python -m cli.train "$@" &
PID=$!
wait $PID
exit $?
