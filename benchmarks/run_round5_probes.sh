#!/bin/bash
# Round-5 on-chip validation queue — CHECKPOINTED (VERDICT r4 next #8).
#
# Same discipline as run_round4_probes.sh (sequential — the remote
# compile helper is single-lane; UNKILLED — CLAUDE.md compile rules;
# risky first compiles staged tiny before full) plus crash recovery:
# every stage writes $LOG/NN_name.done on success, and a RE-RUN of this
# script after a mid-queue death (TPU worker crash, tunnel wedge, host
# kill — the logs_r4/32 failure class) skips completed stages and
# resumes at the first unfinished one.  Failed stages don't block later
# independent stages and are retried on the next run.
#
#   bash benchmarks/run_round5_probes.sh              # run / resume
#   bash benchmarks/run_round5_probes.sh --selftest   # prove resume
#                                    # works after a simulated kill
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}:/root/.axon_site"
LOG=${RT_QUEUE_LOG:-benchmarks/logs_r5}

stage() {
  local name="$1"; shift
  if [ -f "$LOG/$name.done" ]; then
    echo "=== stage $name SKIP (checkpointed) $(date -u +%H:%M:%S)" \
      | tee -a "$LOG/QUEUE.log"
    return 0
  fi
  echo "=== stage $name: $* $(date -u +%H:%M:%S)" | tee -a "$LOG/QUEUE.log"
  "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== stage $name exit=$rc $(date -u +%H:%M:%S)" \
    | tee -a "$LOG/QUEUE.log"
  [ $rc -eq 0 ] && touch "$LOG/$name.done"
  return 0
}

# ---- self-test: a stage kills the whole queue mid-run; the re-run must
# skip finished stages and complete the rest (VERDICT r4 #8's "re-runs
# to completion after a simulated worker kill") ---------------------------
if [ "${1:-}" = "--selftest-inner" ]; then
  mkdir -p "$LOG"
  stage 01_a echo ok
  stage 02_b bash -c "if [ ! -f '$RT_QUEUE_SELFTEST/killed' ]; then
                        touch '$RT_QUEUE_SELFTEST/killed'; kill -9 \$PPID
                      fi; echo ok"
  stage 03_c echo ok
  exit 0
fi
if [ "${1:-}" = "--selftest" ]; then
  T=$(mktemp -d)
  export RT_QUEUE_LOG="$T/logs" RT_QUEUE_SELFTEST="$T"
  bash "$0" --selftest-inner || true      # first run dies inside 02_b
  bash "$0" --selftest-inner              # resume run
  for s in 01_a 02_b 03_c; do
    if [ ! -f "$T/logs/$s.done" ]; then
      echo "SELFTEST FAIL: stage $s did not complete"; exit 1
    fi
  done
  grep -q "SKIP (checkpointed)" "$T/logs/QUEUE.log" || {
    echo "SELFTEST FAIL: resume did not skip finished stages"; exit 1; }
  echo "SELFTEST OK: queue resumed to completion after a simulated kill"
  rm -rf "$T"
  exit 0
fi

mkdir -p "$LOG"

# -- safe tier: XLA scan programs (baselines incl. the 3-D scan rates) ----
stage 01_tier3d_scan     python benchmarks/tier_probe_3d.py 1048576 300

# -- round-5 first Mosaic compiles, tiny canaries BEFORE full rows --------
stage 02_canary_tiled3   python benchmarks/canary3d.py tiled3
stage 03_canary_dyn3     python benchmarks/canary3d.py dyn3

# -- canonical artifacts (kernel_matrix now holds the new families) -------
stage 04_kernel_matrix   python benchmarks/kernel_matrix.py
if [ ! -f "$LOG/05_bench_suite.done" ]; then
  env RT_BENCH_SUITE=1 RT_BENCH_DF=1 RT_BENCH_ORACLES=1 \
    bash -c 'echo; python bench.py' > "$LOG/05_bench_suite.log" 2>&1 \
    && touch "$LOG/05_bench_suite.done"
  echo "=== stage 05_bench_suite exit=$? $(date -u +%H:%M:%S)" \
    | tee -a "$LOG/QUEUE.log"
else
  echo "=== stage 05_bench_suite SKIP (checkpointed)" \
    | tee -a "$LOG/QUEUE.log"
fi

# -- VERDICT #6: full-size hazard-free parity for the dyn tiled kernel ----
stage 06_dyn_parity_tiny python benchmarks/dyn_tiled_fullsize_parity.py --tiny
stage 07_dyn_parity_full python benchmarks/dyn_tiled_fullsize_parity.py

# -- VERDICT #2/#4: 3-D eigenrays + df32 grid3 on the chip ----------------
stage 08_eig3_tiny       python benchmarks/eigenray3_tpu_probe.py --tiny
stage 09_eig3_full       python benchmarks/eigenray3_tpu_probe.py

# -- VERDICT #5: the eigenray TL-map host/chip crossover ------------------
stage 10_crossover       python benchmarks/eigenray_crossover_probe.py

# -- round-5 second wave: the 3-D DYNAMIC tiled kernel --------------------
# tiny canary BEFORE the full-size matrix row (first Mosaic compile of the
# 25-state window kernel), plus the honest same-medium scan baselines the
# tiled3 rows were missing (bounded trips: the scan+gather hazard class)
stage 11_canary_dyntiled3 python benchmarks/canary3d.py dyntiled3
stage 12_grid3_scan       python benchmarks/grid3_scan_probe.py
stage 13_kernel_matrix2   python benchmarks/kernel_matrix.py

# -- operating-point sweep: is the tiled3 row refresh-bound? --------------
stage 14_tiled3_sweep     python benchmarks/tiled3_sweep.py
stage 15_dyn3_tiled_sweep python benchmarks/tiled3_sweep.py --dynamic

# -- round-2 sweep: drift-predicted placement + exact in-kernel
# containment (new Mosaic programs: tiny canary again first) --------------
stage 16_canary_drift     python benchmarks/canary3d.py all
stage 17_tiled3_sweep2    python benchmarks/tiled3_sweep.py
stage 18_dyn3_sweep2      python benchmarks/tiled3_sweep.py --dynamic
# targeted refresh: c718d44 (drift placement) only changes the tiled3
# families; a full cold regen (~25 Mosaic compiles, cache lost with the
# session VM) would burn the remaining tunnel budget for identical rows
stage 19_kernel_matrix3   python benchmarks/kernel_matrix.py --only tiled3,dyn3_tiled

echo "=== QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG/QUEUE.log"
