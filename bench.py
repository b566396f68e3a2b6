"""Benchmark: end-to-end spectral clustering throughput vs the NumPy reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The headline metric is end-to-end icassp2018 clustering speedup at the
largest measured size (d=256 synthetic 2-speaker embeddings) over the
reference's NumPy/LAPACK pipeline on this host (recorded once into
benchmarks/baseline_numpy.json by benchmarks/measure_numpy_baseline.py —
the reference publishes no numbers of its own, SURVEY.md §6).

Quality bit: every reported speedup is verified against the reference's own
labels on the same fixture (benchmarks/reference_labels.npz, recorded by
benchmarks/record_reference_labels.py) via permutation-invariant comparison
— a speedup only counts if the answer matches (VERDICT r1 item 1). The JSON
carries "parity": true/false per measured solver.

Deliverability design (VERDICT r2 item 1 — the round-2 record was lost to a
461 s cold compile blowing the driver budget):
  * every solver leg runs in a SUBPROCESS with a timeout derived from the
    remaining deadline budget (SCT_BENCH_DEADLINE_S, default 500 s), so one
    slow cold compile can never prevent the final JSON from printing; leg
    stderr streams straight through, so even a timed-out leg leaves a trail;
  * INSURANCE-FIRST scheduling: a cheap N=2048 measurement is banked before
    the target-N attempt, because first-call latency through this backend's
    remote-compile tunnel is unpredictable (observed 136 s and 556 s for
    the SAME cached N=10240 program on the same day — the persistent
    compile cache is written but does not cut the first call; the cost is
    remote-side). The headline upgrades to the largest N that lands;
    anything less than the target is flagged "degraded";
  * truncated .jax_cache entries (a killed run leaves one; JAX then warns
    ZstdError and cold-compiles forever after) are detected and deleted
    before any compilation;
  * a warm-cache mirror (benchmarks/warm_cache/), if present, is restored
    into .jax_cache. NOTE: measured on this backend the mirror does NOT
    reduce first-call latency (see above), so it is no longer committed —
    budget structure, not cache warmth, is what guarantees the record.

Measures BOTH eigensolvers at the bench size:
  * SubspaceIteration — the O(N^2 k) top-k path, staged at N>=8192 (three
    small independently-cached programs; the monolith cold-compiles for
    minutes through this environment's remote-compile tunnel);
  * full eigh — the exact-parity path (same O(N^3) algorithm class as the
    reference's np.linalg.eig, reference utils.py:59); at N>=8192 the staged
    executor routes it through the host-staged spectral divide-and-conquer
    top-k solver (ops/dc.py) past the single-program HBM/compiler wall.

Runs on whatever backend jax selects (the real TPU chip under the driver).
Env knobs: SCT_BENCH_N, SCT_BENCH_SOLVER (limit to one solver),
SCT_BENCH_PRECISION, SCT_BENCH_DEADLINE_S, SCT_BENCH_SAVE_WARM=1.
"""

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

_START = time.time()
BASELINE_PATH = os.path.join(_HERE, "benchmarks", "baseline_numpy.json")
REF_LABELS_PATH = os.path.join(_HERE, "benchmarks", "reference_labels.npz")
CACHE_DIR = os.path.join(_HERE, ".jax_cache")
WARM_CACHE_DIR = os.path.join(_HERE, "benchmarks", "warm_cache")

# Leave this much of the budget for the final JSON print + interpreter exit.
_RESERVE_S = 10.0
# Don't bother starting a leg with less than this much budget left: jax
# import + backend init alone costs ~15-20 s in a subprocess.
_MIN_LEG_S = 45.0
# While the headline is unresolved, hold back this much budget from the top
# ladder rung so a smaller rung can still be measured if it times out. The
# remote-compile tunnel's cold time at N=10240 was observed anywhere from
# 136 s to 556 s for the SAME program on the same day — the persistent
# compile cache does not hit across processes on this backend, so budget
# splitting (not cache warmth) is what guarantees a non-empty record.
_FALLBACK_RESERVE_S = 150.0
# Cap on the insurance rung (N=2048 monolith first-calls in ~30-60 s
# through a healthy tunnel; see bench_r3_record.log).
_INSURANCE_CAP_S = 180.0


def _log(msg):
  print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Compile-cache hygiene.
# ---------------------------------------------------------------------------


def heal_compile_cache():
  """Delete truncated .jax_cache entries and restore the committed mirror.

  A TPU run killed mid-cache-write leaves a truncated zstd frame; JAX then
  warns `ZstdError: did not decompress full frame` on every read and
  recompiles cold each time WITHOUT overwriting the bad entry — the exact
  failure mode that cost round 2 its bench record (461 s cold compile).
  """
  os.makedirs(CACHE_DIR, exist_ok=True)
  try:
    import zstandard
  except ImportError:  # pragma: no cover - zstandard ships with jax here
    zstandard = None
  if zstandard is not None:
    for name in os.listdir(CACHE_DIR):
      path = os.path.join(CACHE_DIR, name)
      try:
        with open(path, "rb") as f:
          data = f.read()
        zstandard.ZstdDecompressor().decompress(data, max_output_size=1 << 31)
      except Exception:
        _log(f"# purging corrupt cache entry {name}")
        try:
          os.unlink(path)
        except OSError:
          pass
  if os.path.isdir(WARM_CACHE_DIR):
    for name in os.listdir(WARM_CACHE_DIR):
      dst = os.path.join(CACHE_DIR, name)
      if not os.path.exists(dst):
        shutil.copyfile(os.path.join(WARM_CACHE_DIR, name), dst)


def save_warm_cache():
  """Mirror current .jax_cache entries into the committed warm-cache dir."""
  os.makedirs(WARM_CACHE_DIR, exist_ok=True)
  for name in os.listdir(CACHE_DIR):
    dst = os.path.join(WARM_CACHE_DIR, name)
    if not os.path.exists(dst):
      shutil.copyfile(os.path.join(CACHE_DIR, name), dst)


# ---------------------------------------------------------------------------
# Shared fixture helpers.
# ---------------------------------------------------------------------------


def make_embeddings(n, d=256, k=2, seed=0):
  rng = np.random.RandomState(seed)
  centers = rng.randn(k, d) * 3
  labels = np.repeat(np.arange(k), n // k)
  return (centers[labels] + rng.randn(n, d) * 0.4).astype(np.float32)


def reference_labels(n):
  """Recorded reference labels for the bench fixture (or None)."""
  if not os.path.exists(REF_LABELS_PATH):
    return None
  with np.load(REF_LABELS_PATH) as z:
    key = f"labels_{n}"
    return z[key] if key in z.files else None


# ---------------------------------------------------------------------------
# Leg mode: measure one (solver, N) in this process, print one JSON line.
# ---------------------------------------------------------------------------


def run_leg(n, solver, repeats=3):
  import jax
  import jax.numpy as jnp

  jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

  from spectralcluster_tpu import configs, pipeline, utils
  from spectralcluster_tpu.precision import precise
  from spectralcluster_tpu.types import EigenSolver

  cfg = pipeline.PipelineConfig(
      refinement_options=configs.icassp2018_refinement_options(),
      min_clusters=2, max_clusters=7, custom_dist="cosine", max_iter=300,
      eigensolver=(EigenSolver[solver] if solver else EigenSolver.Auto),
      matmul_precision=os.environ.get("SCT_BENCH_PRECISION", "highest"))
  x = jnp.asarray(make_embeddings(n))
  key = jax.random.PRNGKey(0)

  # The staged executor splits the pipeline at the eig boundary into three
  # small programs: mandatory at N>=8192, where one monolithic program
  # either OOMs the remote compile helper (full eigh) or cold-compiles for
  # minutes (SubspaceIteration; 461 s in the round-2 record run).
  staged = n >= 8192 or os.environ.get("SCT_BENCH_STAGED") == "1"
  if staged and pipeline._staged_applicable(cfg, False):
    def fn(emb):
      labels, n_clusters, _, _ = pipeline.spectral_cluster_fixed_k_staged(
          emb, key, cfg)
      return labels, n_clusters
  else:
    staged = False

    @precise
    def run(emb):
      labels, n_clusters, _, _ = pipeline.spectral_cluster_fixed_k(
          emb, key, cfg)
      return labels, n_clusters

    fn = jax.jit(run)

  t0 = time.time()
  # device_get (not block_until_ready): on remote/tunneled backends only a
  # result fetch reliably waits for the full device execution.
  labels, n_clusters = jax.device_get(fn(x))
  compile_s = time.time() - t0
  times = []
  for _ in range(repeats):
    t0 = time.time()
    labels, n_clusters = jax.device_get(fn(x))
    times.append(time.time() - t0)

  ref = reference_labels(n)
  parity = None
  if ref is not None:
    parity = bool(np.array_equal(utils.enforce_ordered_labels(labels),
                                 np.asarray(ref, np.int64)))
  return {
      "latency_s": round(float(np.median(times)), 4),
      "compile_s": round(compile_s, 1),
      "n_clusters": int(n_clusters),
      "parity": parity,
      "staged": staged,
      "backend": jax.default_backend(),
  }


def leg_main():
  n = int(os.environ["SCT_LEG_N"])
  solver = os.environ.get("SCT_LEG_SOLVER") or None
  out = run_leg(n, solver)
  print(json.dumps(out), flush=True)


# ---------------------------------------------------------------------------
# Orchestrator mode: schedule legs under the deadline, print THE JSON line.
# ---------------------------------------------------------------------------


def _remaining(deadline_s):
  return deadline_s - (time.time() - _START) - _RESERVE_S


def run_leg_subprocess(n, solver, timeout_s):
  env = dict(os.environ)
  env["SCT_BENCH_LEG"] = "1"
  env["SCT_LEG_N"] = str(n)
  env["SCT_LEG_SOLVER"] = solver or ""
  # Leg stderr goes STRAIGHT to our stderr (unbuffered child): a timed-out
  # leg must still leave its progress trail in the driver log — losing the
  # diagnostics with the leg was how the round-3 warm-cache stall initially
  # presented as a silent "timeout after 442s".
  proc = subprocess.Popen(
      [sys.executable, "-u", os.path.abspath(__file__)],
      env=env, stdout=subprocess.PIPE, stderr=sys.stderr, text=True)
  try:
    stdout, _ = proc.communicate(timeout=timeout_s)
  except subprocess.TimeoutExpired:
    proc.kill()
    proc.communicate()
    return None, f"timeout after {timeout_s:.0f}s"
  if proc.returncode != 0:
    return None, f"rc={proc.returncode}"
  for line in reversed((stdout or "").strip().splitlines()):
    line = line.strip()
    if line.startswith("{"):
      try:
        return json.loads(line), None
      except json.JSONDecodeError:
        continue
  return None, "no JSON line in leg output"


def main():
  if os.environ.get("SCT_BENCH_LEG") == "1":
    leg_main()
    return

  deadline_s = float(os.environ.get("SCT_BENCH_DEADLINE_S", 500))
  heal_compile_cache()

  with open(BASELINE_PATH) as f:
    baseline = json.load(f)["results"]
  sizes = sorted(int(k) for k in baseline)
  n_target = int(os.environ.get("SCT_BENCH_N", 10240))
  if n_target not in sizes:
    n_target = sizes[-1]

  only = os.environ.get("SCT_BENCH_SOLVER")
  if only is not None:
    solvers = [only or None]             # SCT_BENCH_SOLVER= -> full eigh
  else:
    solvers = ["SubspaceIteration", None]  # both; subspace is the headline

  # First-call latency through this backend's remote-compile tunnel is
  # UNPREDICTABLE (observed 136 s and 556 s for the same N=10240 program on
  # the same day; the persistent compile cache is written but does not cut
  # the first call — the cost is remote-side). So: lock in a cheap
  # INSURANCE measurement first (N=2048 first-calls in well under a minute),
  # then gamble the remaining budget on the target size and upgrade the
  # headline if it lands. An empty record is the one unacceptable outcome
  # (it cost round 2 its bench artifact).
  headline_solver = solvers[0]
  htag = headline_solver or "full_eigh"
  extras = {}
  measured = {}   # n -> entry, for the headline solver

  def attempt(solver, tag, n, cap, min_s=_MIN_LEG_S):
    budget = _remaining(deadline_s)
    cap = min(cap, budget)
    if cap < min_s:
      extras.setdefault(tag, {}).setdefault(
          "skipped", f"insufficient budget ({budget:.0f}s left) for N={n}")
      _log(f"# {tag}: skipping N={n}, {budget:.0f}s budget left")
      return None
    _log(f"# {tag}: N={n} (budget {cap:.0f}s)")
    entry, err = run_leg_subprocess(n, solver, cap)
    if entry is None:
      extras.setdefault(tag, {})[f"N{n}"] = f"failed: {err}"
      _log(f"# {tag}: N={n} failed: {err}")
      return None
    base_s = baseline[str(n)]["predict_s"]
    entry["speedup"] = round(base_s / entry["latency_s"], 2)
    entry["n"] = n
    _log(f"# {tag}: N={n} ours={entry['latency_s']:.3f}s "
         f"numpy={base_s:.3f}s compile={entry['compile_s']:.1f}s "
         f"n_clusters={entry['n_clusters']} parity={entry['parity']}")
    return entry

  insurance_n = max((n for n in sizes if n <= 2048), default=sizes[0])
  if n_target > insurance_n:
    # Modest cap: if the tunnel is so congested that an N=2048 monolith
    # can't first-call inside it, the target rung wouldn't land either —
    # better to fail fast and leave the budget to the target attempt.
    entry = attempt(headline_solver, htag, insurance_n,
                    cap=min(_INSURANCE_CAP_S,
                            _remaining(deadline_s) - _FALLBACK_RESERVE_S))
    if entry is not None:
      measured[insurance_n] = entry
  # The target rung gets everything that's left; with the insurance rung
  # already banked there is nothing to hold back for.
  entry = attempt(headline_solver, htag, n_target, cap=_remaining(deadline_s))
  if entry is not None:
    measured[n_target] = entry
  elif not measured:
    # No insurance (target <= 2048 or insurance failed): walk the ladder.
    for n in (n for n in (4096, 2048, 1024) if n < n_target):
      entry = attempt(headline_solver, htag, n, cap=_remaining(deadline_s))
      if entry is not None:
        measured[n] = entry
        break

  headline = None
  headline_n = None
  if measured:
    headline_n = max(measured)
    best = measured[headline_n]
    if headline_n != n_target:
      best["degraded"] = f"target N={n_target} did not fit the budget"
    extras[htag] = best
    headline = (htag, best)
    # Secondary solver legs at the headline's achieved N, budget permitting.
    for solver in solvers[1:]:
      tag = solver or "full_eigh"
      entry = attempt(solver, tag, headline_n, cap=_remaining(deadline_s))
      if entry is not None:
        extras[tag] = entry

  if headline is None:
    print(json.dumps({"metric": f"icassp2018_e2e_speedup_vs_numpy_N{n_target}",
                      "value": 0.0, "unit": "x", "vs_baseline": 0.0,
                      "error": "all solver legs failed", "solvers": extras}),
          flush=True)
    sys.exit(1)

  tag, entry = headline
  meta = {
      "metric": f"icassp2018_e2e_speedup_vs_numpy_N{headline_n}_{tag}",
      "value": entry["speedup"],
      "unit": "x",
      "vs_baseline": entry["speedup"],
      "parity": entry["parity"],
      "backend": entry.get("backend"),
      "wall_s": round(time.time() - _START, 1),
      "solvers": extras,
  }
  print(json.dumps(meta), flush=True)
  if os.environ.get("SCT_BENCH_SAVE_WARM") == "1":
    save_warm_cache()


if __name__ == "__main__":
  main()
