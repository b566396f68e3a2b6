"""Multi-controller (2-process localhost) validation (SURVEY.md §2c).

Launches benchmarks/multihost_validate.py: two OS processes with 4 virtual
CPU devices each join an 8-device global mesh via jax.distributed — the
runtime path a ≥2-host TPU deployment uses (DCN collectives between
controllers). The script validates cross-process AllReduce, the DP batch
driver, and the row-sharded large-N path spanning both processes.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_validation():
  script = os.path.join(REPO, "benchmarks", "multihost_validate.py")
  proc = subprocess.run(
      [sys.executable, script], capture_output=True, timeout=540, text=True)
  assert proc.returncode == 0, proc.stdout + proc.stderr
  assert '"ok": true' in proc.stdout
