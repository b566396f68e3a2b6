"""Decompose the batched pipeline's steady-state cost by stage.

Times four nested prefixes of the vmapped single-chip pipeline at the
bench_batch.py shapes (batch x N x d), plus a no-op dispatch to measure the
sandbox's host<->device RTT floor:

  rtt      : jnp.sum of the input (dispatch + transfer floor)
  refine   : affinity + 5-op refinement + similarity symmetrization
  eigen    : + top-k subspace eigensolver (or full eigh with SCT_BATCH_SOLVER)
  full     : + eigengap + masked K-Means (the complete fixed-k step)

Usage: [SCT_BATCH_SOLVER=Eigh] [SCT_BATCH_PRECISION=high]
       python benchmarks/profile_stages.py [batch] [n]

STAGED mode (VERDICT r3 item 6 — attribute device time at the RECORD sizes,
where the pipeline runs as the eigh-split staged executor, not the batched
monolith): `python benchmarks/profile_stages.py staged [n] [d]` runs
pipeline.spectral_cluster_fixed_k_staged with blocking StageTimings and
reports per-stage device time vs the tunnel RTT floor plus achieved TF/s of
the subspace-iteration matmuls vs the exact-precision peak.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from spectralcluster_tpu import configs, pipeline
from spectralcluster_tpu.ops import eigen as eigen_ops
from spectralcluster_tpu.ops import refinement as refinement_ops
from spectralcluster_tpu.precision import precise
from spectralcluster_tpu.types import EigenSolver


def main(batch=16, n=1024, d=256):
  solver = os.environ.get("SCT_BATCH_SOLVER", "SubspaceIteration")
  cfg = pipeline.PipelineConfig(
      refinement_options=configs.icassp2018_refinement_options(),
      min_clusters=2, max_clusters=7, custom_dist="cosine", max_iter=300,
      eigensolver=EigenSolver[solver],
      matmul_precision=os.environ.get("SCT_BATCH_PRECISION", "highest"))
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.randn(batch, n, d).astype(np.float32))

  def upto_sym(emb):
    affinity = pipeline.prepare_affinity(emb, cfg)
    seq = cfg.refinement_options.refinement_sequence
    s = refinement_ops.apply_refinement_sequence(
        affinity, cfg.refinement_options, sequence=seq[:-1],
        use_pallas=cfg.use_pallas)
    dscale = refinement_ops.row_max_scale(s, None)
    inv_sqrt = 1.0 / jnp.sqrt(dscale)
    return inv_sqrt[:, None] * s * inv_sqrt[None, :], inv_sqrt

  def refine_only(emb):
    m, _ = upto_sym(emb)
    return jnp.sum(m)

  def eigen_stage(emb):
    m, inv_sqrt = upto_sym(emb)
    if cfg.eigensolver == EigenSolver.SubspaceIteration:
      w, u = eigen_ops.topk_eigh_subspace(
          m, cfg.max_clusters + 1, jax.random.PRNGKey(42),
          num_iters=cfg.subspace_iters, largest=True)
    else:
      w, u = eigen_ops.sorted_eigh(m, descend=True)
    return jnp.sum(w), jnp.sum(u)

  def full(emb):
    labels, n_clusters, _, _ = pipeline.spectral_cluster_fixed_k(
        emb, jax.random.PRNGKey(0), cfg)
    return labels, n_clusters

  stages = {
      "rtt": jax.jit(lambda e: jnp.sum(e)),
      "refine": jax.jit(jax.vmap(precise(refine_only))),
      "eigen": jax.jit(jax.vmap(precise(eigen_stage))),
      "full": jax.jit(jax.vmap(precise(full))),
  }
  print("backend:", jax.devices()[0].platform, jax.devices()[0].device_kind,
        flush=True)
  results = {}
  for name, fn in stages.items():
    t0 = time.time()
    jax.device_get(fn(x))
    compile_s = time.time() - t0
    times = []
    for _ in range(5):
      t0 = time.time()
      jax.device_get(fn(x))   # fetch forces full execution on remote backends
      times.append(time.time() - t0)
    results[name] = float(np.median(times))
    print(f"{name:8s} steady={results[name]*1e3:8.1f} ms "
          f"(compile {compile_s:.1f}s)", flush=True)

  rtt = results["rtt"]
  t_refine = results["refine"] - rtt
  t_eigen = results["eigen"] - results["refine"]
  t_tail = results["full"] - results["eigen"]
  print(f"\nincremental (RTT-corrected, batch={batch} N={n} d={d} "
        f"solver={solver}):")
  print(f"  affinity+refine : {t_refine*1e3:8.1f} ms")
  print(f"  eigensolver     : {t_eigen*1e3:8.1f} ms")
  print(f"  gap+kmeans      : {t_tail*1e3:8.1f} ms")
  print(f"  RTT floor       : {rtt*1e3:8.1f} ms")

  # Model FLOPs for the matmul-dominated stages (VERDICT r2 item 4:
  # utilization, not just RTT-floored latency). affinity = X Xt (2 B N^2 d);
  # Diffuse = A At (2 B N^3) — the other refinement ops are bandwidth-bound
  # elementwise/reduction passes, counted as 0 FLOPs here. Subspace
  # eigensolver ~ per escalation chunk: num_iters x (matmul + QR) on
  # (N, b=k+8) panels + one Rayleigh-Ritz; we count the MINIMUM (one chunk,
  # matmuls only) so reported utilization is an upper bound on what the
  # solver can waste.
  from spectralcluster_tpu.types import EigenGapType  # noqa: F401 (doc)
  seq = cfg.refinement_options.refinement_sequence or ()
  from spectralcluster_tpu.types import RefinementName
  flops_refine = 2.0 * batch * n * n * d
  if RefinementName.Diffuse in seq:
    flops_refine += 2.0 * batch * n ** 3
  b_cols = cfg.max_clusters + 1 + 8
  if solver == "SubspaceIteration":
    flops_eigen = 2.0 * batch * cfg.subspace_iters * 2 * n * n * b_cols
  else:
    # QDWH-eigh ~ O(25 N^3) but XLA's exact constant varies; report the
    # canonical 9 N^3 (tridiag+QR class) as a floor.
    flops_eigen = 9.0 * batch * n ** 3
  # Peak: one v5e chip ~197 TFLOP/s bf16; matmul_precision="highest" runs
  # 6-pass bf16 (~f32), so the attainable f32-equivalent peak is ~197/6.
  peak = 197e12 / (6 if cfg.matmul_precision == "highest" else
                   (3 if cfg.matmul_precision == "high" else 1))
  for nm, fl, t in (("affinity+refine", flops_refine, t_refine),
                    ("eigensolver", flops_eigen, t_eigen)):
    if t > 0:
      eff = fl / t
      print(f"  {nm:16s}: {fl/1e9:9.1f} GFLOP  {eff/1e12:7.2f} TFLOP/s  "
            f"({100.0*eff/peak:5.1f}% of {peak/1e12:.0f} TF/s "
            f"{cfg.matmul_precision}-precision peak)")


def staged_main(n=10240, d=256, repeats=5):
  """Per-stage profile of the staged executor at record sizes."""
  from spectralcluster_tpu.observability import StageTimings

  solver = os.environ.get("SCT_BATCH_SOLVER", "SubspaceIteration")
  cfg = pipeline.PipelineConfig(
      refinement_options=configs.icassp2018_refinement_options(),
      min_clusters=2, max_clusters=7, custom_dist="cosine", max_iter=300,
      eigensolver=EigenSolver[solver],
      matmul_precision=os.environ.get("SCT_BATCH_PRECISION", "highest"))
  rng = np.random.RandomState(0)
  centers = rng.randn(2, d) * 3
  true = np.repeat(np.arange(2), n // 2)
  x = jnp.asarray(
      (centers[true] + rng.randn(n, d) * 0.4).astype(np.float32))
  key = jax.random.PRNGKey(0)
  print("backend:", jax.devices()[0].platform, jax.devices()[0].device_kind,
        flush=True)

  rtt_fn = jax.jit(jnp.sum)
  jax.device_get(rtt_fn(x))
  rtt = float(np.median([_timed(lambda: jax.device_get(rtt_fn(x)))
                         for _ in range(repeats)]))

  t0 = time.time()
  out = pipeline.spectral_cluster_fixed_k_staged(x, key, cfg)
  jax.device_get(out[0])
  print(f"compile+first: {time.time() - t0:.1f}s", flush=True)

  # Non-blocking steady latency first (what the headline reports), then the
  # blocking per-stage attribution (defeats async pipelining by design).
  lat = []
  for _ in range(repeats):
    t0 = time.time()
    out = pipeline.spectral_cluster_fixed_k_staged(x, key, cfg)
    jax.device_get(out[0])
    lat.append(time.time() - t0)
  latency = float(np.median(lat))

  per_stage = {}
  for _ in range(repeats):
    tm = StageTimings()
    out = pipeline.spectral_cluster_fixed_k_staged(x, key, cfg, timings=tm)
    jax.device_get(out[0])
    for k_, v in tm.as_dict().items():
      per_stage.setdefault(k_, []).append(v)
  per_stage = {k_: float(np.median(v)) for k_, v in per_stage.items()}
  blocking_total = sum(per_stage.values())

  print(f"\nstaged profile N={n} d={d} solver={solver} "
        f"(medians of {repeats}):")
  print(f"  pipelined latency : {latency*1e3:9.1f} ms "
        f"(the headline number)")
  print(f"  RTT floor         : {rtt*1e3:9.1f} ms per dispatch")
  for name, t in sorted(per_stage.items(), key=lambda kv: -kv[1]):
    print(f"  {name:17s} : {t*1e3:9.1f} ms blocking")
  print(f"  blocking total    : {blocking_total*1e3:9.1f} ms "
        f"({len(per_stage)} stages x RTT "
        f"{len(per_stage)*rtt*1e3:.0f} ms floor)")

  # FLOP attribution (same models as the batched profiler; n_clusters=2
  # fixture -> b = k_cap+1+oversample columns in the subspace panel).
  from spectralcluster_tpu.types import RefinementName
  seq = cfg.refinement_options.refinement_sequence or ()
  flops_prep = 2.0 * n * n * d
  if RefinementName.Diffuse in seq:
    flops_prep += 2.0 * n ** 3
  b_cols = cfg.max_clusters + 1 + 8
  flops_sub = 2.0 * cfg.subspace_iters * 2 * n * n * b_cols
  peak = 197e12 / (6 if cfg.matmul_precision == "highest" else
                   (3 if cfg.matmul_precision == "high" else 1))
  rows = [("staged_prep", flops_prep)]
  if "staged_subspace" in per_stage:
    rows.append(("staged_subspace", flops_sub))
  for name, fl in rows:
    t = max(per_stage.get(name, 0.0) - rtt, 1e-9)
    eff = fl / t
    print(f"  {name:17s} : {fl/1e9:9.1f} GFLOP  {eff/1e12:7.2f} TFLOP/s  "
          f"({100.0*eff/peak:5.1f}% of {peak/1e12:.0f} TF/s "
          f"{cfg.matmul_precision}-precision peak, RTT-corrected)")
  n_clusters = int(jax.device_get(out[1]))
  import json
  print(json.dumps({"n": n, "d": d, "solver": solver,
                    "latency_s": round(latency, 4),
                    "rtt_s": round(rtt, 4), "n_clusters": n_clusters,
                    "stages_ms": {k_: round(v * 1e3, 1)
                                  for k_, v in per_stage.items()}}),
        flush=True)


def _timed(fn):
  t0 = time.time()
  fn()
  return time.time() - t0


if __name__ == "__main__":
  if len(sys.argv) > 1 and sys.argv[1] == "staged":
    staged_main(*[int(a) for a in sys.argv[2:]])
  else:
    main(*[int(a) for a in sys.argv[1:]])
