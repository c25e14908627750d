#!/bin/bash
# Round-4 on-chip validation queue (VERDICT.md "Next round" #1).
#
# Runs the probes the round-3 tunnel outage left queued, SEQUENTIALLY
# (the remote compile helper is single-lane) and UNKILLED (CLAUDE.md:
# never timeout-kill an in-flight TPU compile).  Safe/known-compile
# stages run first so canonical artifacts refresh even if a later
# first-compile stage wedges; risky first compiles are staged tiny
# before full.  Each stage logs to benchmarks/logs_r4/NN_name.log.
set -u
cd /root/repo
# scripts live in benchmarks/, so the package root needs to be on the
# path explicitly; keep /root/.axon_site (axon backend registration)
export PYTHONPATH="/root/repo:${PYTHONPATH:-}:/root/.axon_site"
LOG=benchmarks/logs_r4
mkdir -p "$LOG"

stage() {
  local name="$1"; shift
  echo "=== stage $name: $* $(date -u +%H:%M:%S)" | tee -a "$LOG/QUEUE.log"
  "$@" > "$LOG/$name.log" 2>&1
  echo "=== stage $name exit=$? $(date -u +%H:%M:%S)" | tee -a "$LOG/QUEUE.log"
}

# -- safe tier (XLA scan programs + previously-compiled kernel families) --
stage 01_tier3d_scan     python benchmarks/tier_probe_3d.py 1048576 300
stage 02_kernel_matrix   python benchmarks/kernel_matrix.py
if [ -z "${RT_SKIP_BENCH_SUITE:-}" ]; then
  env RT_BENCH_SUITE=1 RT_BENCH_DF=1 RT_BENCH_ORACLES=1 \
    bash -c 'echo; python bench.py' > "$LOG/03_bench_suite.log" 2>&1
  echo "=== stage 03_bench_suite exit=$? $(date -u +%H:%M:%S)" | tee -a "$LOG/QUEUE.log"
fi

# -- first compiles, tiny canary then full --------------------------------
stage 04_dyn_tiny        python benchmarks/dynamic_probe.py --tiny
stage 05_dyn_full        python benchmarks/dynamic_probe.py
stage 06_f3d_tiny        env RT_PROBE_PALLAS3D=1 python benchmarks/tier_probe_3d.py 4096 8
stage 07_f3d_full        env RT_PROBE_PALLAS3D=1 python benchmarks/tier_probe_3d.py 1048576 300
stage 08_oriented_303    python benchmarks/oriented_probe.py --div 303
stage 09_oriented_4587   python benchmarks/oriented_probe.py --div 4587 --segs 4,6
stage 10_c1_probe        python benchmarks/c1_probe.py

echo "=== QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG/QUEUE.log"
