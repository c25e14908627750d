"""The on-chip probe queue must survive a mid-stage death and resume.

VERDICT r4 next #8: logs_r4/32 showed a TPU worker crash killing a probe
run mid-queue; the round-5 runner checkpoints every stage
(benchmarks/run_round5_probes.sh) so a re-run after any death — worker
crash, tunnel wedge, host kill — skips completed stages and finishes the
rest.  The script's --selftest simulates exactly that: a stage kill -9s
the whole queue on its first attempt, then the harness re-runs and
asserts completion plus at least one checkpoint skip.  Pure shell (no
TPU, no JAX) so the property is tested on every suite run.
"""
import pathlib
import subprocess


def test_queue_resumes_after_simulated_kill():
    script = (pathlib.Path(__file__).resolve().parents[1]
              / "benchmarks" / "run_round5_probes.sh")
    out = subprocess.run(
        ["bash", str(script), "--selftest"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "SELFTEST OK" in out.stdout
