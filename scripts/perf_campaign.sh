#!/usr/bin/env bash
# One-command on-chip perf campaign for when the TPU tunnel is reachable:
#   1. headline bench (writes the BENCH json line to stdout)
#   2. encode FUSED_TILE x VMEM_LIMIT sweep (the round-1 calibration
#      lead: per-grid-step overhead amortizes with bigger tiles once the
#      scoped-VMEM budget allows them)
#   3. decode kernel-knob matrix (KB x i16 x window) + device-rows wall A/B
# Logs land in perf_logs/<timestamp>/ so a dropped tunnel mid-run loses
# nothing. Each phase is independently time-bounded.
set -u
cd "$(dirname "$0")/.."
TS=$(date +%Y%m%d_%H%M%S)
OUT="perf_logs/$TS"
mkdir -p "$OUT"
echo "logs: $OUT"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ==="
    timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
    local rc=$?
    tail -25 "$OUT/$name.log"
    echo "=== $name done rc=$rc ==="
}

# seed the persistent compilation cache with CURRENT source first: the
# round-3 bench's 109 s first-iteration was a cold cache (BENCHMARKS.md
# round-4 autopsy). The seed run compiles exactly what bench.py
# measures; the measured run then pays cache loads, not compiles.
# Re-run this after ANY source change to the jitted paths.
run seed_cache     1800 env BENCH_ITERS=2 python bench.py
run bench          1800 python bench.py
run sweep_enc      3600 python scripts/perf_sweep.py enc 10
run sweep_dec      5400 python scripts/perf_sweep.py dec 10
run bench_suite    2400 python bench_suite.py

echo "campaign complete; review $OUT/*.log, update BENCHMARKS.md and"
echo "bake the winning flags into the defaults"
