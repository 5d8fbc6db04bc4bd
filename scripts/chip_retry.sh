#!/usr/bin/env bash
# Run a chip job with stall detection + retry: the tunneled compile
# service intermittently hangs a request forever (process sleeps on the
# RPC with no CPU and no output); a kill + rerun typically succeeds.
# Usage: chip_retry.sh <logfile> <stall_secs> <attempts> <cmd...>
set -u
LOG=$1; STALL=$2; TRIES=$3; shift 3

for a in $(seq 1 "$TRIES"); do
    : > "$LOG"
    "$@" >> "$LOG" 2>&1 &
    pid=$!
    while kill -0 "$pid" 2>/dev/null; do
        sleep 30
        now=$(date +%s)
        mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
        if [ $((now - mt)) -ge "$STALL" ]; then
            echo "[chip_retry] attempt $a stalled (${STALL}s no output); killing $pid" >> "$LOG"
            kill "$pid" 2>/dev/null
            sleep 5
            kill -9 "$pid" 2>/dev/null
            break
        fi
    done
    wait "$pid" 2>/dev/null
    rc=$?
    if ! grep -q "\[chip_retry\] attempt $a stalled" "$LOG"; then
        echo "[chip_retry] attempt $a finished rc=$rc" >> "$LOG"
        exit "$rc"
    fi
done
echo "[chip_retry] all $TRIES attempts stalled" >> "$LOG"
exit 99
