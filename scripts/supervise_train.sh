#!/bin/bash
# Elastic training supervisor: restarts training with checkpoint resume when
# the watchdog (exit 42) fires on a wedged device tunnel, or on crashes.
#
#   scripts/supervise_train.sh <logdir> [train.py overrides...]
#
# Example:
#   scripts/supervise_train.sh /tmp/run1 gym=trifinger_difficulty_4 \
#       args.num_envs=8192 args.max_epochs=20000 args.watchdog_timeout=600
set -u
LOGDIR=${1:?usage: supervise_train.sh <logdir> [overrides...]}
shift
MAX_RESTARTS=${MAX_RESTARTS:-10}
restarts=0
while true; do
    ckpt=$(ls -dt "$LOGDIR"/*/nn/last 2>/dev/null | head -1 || true)
    resume=()
    if [ -n "${ckpt:-}" ]; then
        echo "[supervisor] resuming from $ckpt"
        resume=("args.checkpoint=$ckpt")
    fi
    # ${resume[@]+...} guards the empty-array expansion under `set -u`
    # (bash < 4.4 treats "${resume[@]}" on an empty array as unbound)
    python "$(dirname "$0")/train.py" "args.logdir=$LOGDIR" "$@" ${resume[@]+"${resume[@]}"}
    code=$?
    if [ $code -eq 0 ]; then
        echo "[supervisor] training completed"
        exit 0
    fi
    restarts=$((restarts + 1))
    if [ $restarts -gt "$MAX_RESTARTS" ]; then
        echo "[supervisor] giving up after $MAX_RESTARTS restarts (last exit $code)"
        exit $code
    fi
    # A wedged device tunnel recovers only after ~5 min with NO client
    # attached; immediate restarts keep re-wedging it. Back off
    # exponentially (10s, 20s, ..., capped 10 min) so the remote end gets
    # the idle window it needs, and reset the budget once training makes
    # progress again (a checkpoint newer than the last failure).
    backoff=$((10 * (1 << (restarts - 1))))
    [ "$backoff" -gt 600 ] && backoff=600
    new_ckpt=$(ls -dt "$LOGDIR"/*/nn/last 2>/dev/null | head -1 || true)
    if [ -n "${new_ckpt:-}" ] && [ "${new_ckpt}" != "${ckpt:-}" ]; then
        restarts=1
        backoff=10
    fi
    echo "[supervisor] exit $code — restart $restarts/$MAX_RESTARTS in ${backoff}s"
    sleep "$backoff"
done
