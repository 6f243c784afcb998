#!/usr/bin/env bash
# One-shot TPU revalidation after a relay outage (round-3 queue).
# The axon relay serializes clients: run ONE job at a time, never pipe
# long TPU jobs through `| tail` (output is swallowed until exit).
#
# Usage: bash scripts/tpu_revalidate.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_reval}"
mkdir -p "$OUT"

probe() {
    timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null
}
if ! probe; then
    echo "relay port 8082 refused; aborting" >&2
    exit 2
fi

run() {
    name="$1"; shift
    echo "=== $name: $* ===" | tee -a "$OUT/summary.txt"
    t0=$(date +%s)
    "$@" > "$OUT/$name.log" 2>&1
    rc=$?
    echo "$name rc=$rc ($(( $(date +%s) - t0 ))s)" | tee -a "$OUT/summary.txt"
    tail -5 "$OUT/$name.log" | tee -a "$OUT/summary.txt"
    return $rc
}

# 1. compiled-Mosaic parity of every Pallas path at production shapes.
# Bench numbers from a build whose kernels fail parity are worthless:
# everything below is gated on this rc.
if ! run burst_check timeout 3000 python -u scripts/tpu_burst_check.py; then
    echo "burst check FAILED; not benchmarking a non-parity build" \
        | tee -a "$OUT/summary.txt" >&2
    exit 1
fi

# 2. the headline + all-config benchmark (the driver-grade numbers)
run bench timeout 3000 python -u bench.py

# 3. spatial single-chip overhead on the headline system
BENCH_CONFIGS=0 BENCH_SPATIAL=1 run bench_spatial \
    timeout 3000 python -u bench.py

# 4. incremental-rebin ablation: bitwise-equal by test, faster or slower
# only the chip can say (flag stays off by default until this reads faster)
AZTPU_INCREMENTAL_REBIN=1 BENCH_CONFIGS=0 run bench_incr \
    timeout 3000 python -u bench.py || true

# 5. opt-in SRD solvent throughput (262k solvent, collision every step)
BENCH_MPCD=1 BENCH_CONFIGS=0 BENCH_STEPS=100 run bench_mpcd \
    timeout 3000 python -u bench.py || true

# 6. kernel schedule sweep (H x CB) — only worth reading if bench ran
run sweep timeout 3000 python -u scripts/sweep_kernel.py || true

echo "done; logs in $OUT" | tee -a "$OUT/summary.txt"
