"""Multi-controller (multi-host) validation on localhost CPU.

SURVEY.md §2c / BASELINE.json mandate a ≥2-host path; real multi-host TPU
hardware is not available in this sandbox, so this script validates the
multi-controller runtime the way JAX itself tests it: two OS processes on
localhost, each owning 4 virtual CPU devices, joined into one 8-device
global mesh via ``jax.distributed.initialize``
(spectralcluster_tpu.parallel.mesh.initialize_distributed).

Checks, per process:
  1. runtime wiring — process_count/global device count;
  2. a cross-process collective (psum over the batch axis, i.e. the DCN
     AllReduce path);
  3. the DP batch driver (parallel/batch.make_batched_cluster_fn) on a
     globally-sharded utterance batch — every addressable shard's labels
     must equal the single-process expected labels;
  4. the row-sharded large-N path (parallel/sharded.make_sharded_cluster_fn)
     with the model axis spanning BOTH processes — all-gather/matmul
     collectives cross the process boundary.

Run:  python benchmarks/multihost_validate.py          (launcher, exits 0/1)
      python benchmarks/multihost_validate.py --worker --process-id K ...
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
  s = socket.socket()
  s.bind(("127.0.0.1", 0))
  port = s.getsockname()[1]
  s.close()
  return port


def worker(process_id: int, num_processes: int, coordinator: str) -> None:
  import jax
  import jax.numpy as jnp
  import numpy as np

  sys.path.insert(0, REPO)
  from spectralcluster_tpu import configs, pipeline, utils
  from spectralcluster_tpu.parallel import batch as batch_lib
  from spectralcluster_tpu.parallel import mesh as mesh_lib
  from spectralcluster_tpu.parallel import sharded as sharded_lib

  mesh_lib.initialize_distributed(coordinator_address=coordinator,
                                  num_processes=num_processes,
                                  process_id=process_id)
  # 1. Runtime wiring.
  assert jax.process_count() == num_processes, jax.process_count()
  devices = jax.devices()
  local = jax.local_devices()
  assert len(devices) == num_processes * len(local), (devices, local)

  # 2. Cross-process collective: AllReduce over the full device set.
  mesh = mesh_lib.make_mesh(dp=len(devices), mp=1)
  ones = np.ones((len(devices),), np.float32)
  sh1 = mesh_lib.batch_sharding(mesh, 1)
  g_ones = jax.make_array_from_callback(ones.shape, sh1, lambda i: ones[i])
  total = jax.jit(jnp.sum, out_shardings=mesh_lib.replicated(mesh))(g_ones)
  assert float(total) == float(len(devices)), float(total)

  # 3. DP batch driver across processes.
  cfg = pipeline.PipelineConfig(
      refinement_options=configs.icassp2018_refinement_options().replace(
          gaussian_blur_sigma=0),
      min_clusters=2, max_clusters=4, custom_dist="cosine", max_iter=30)
  rng = np.random.RandomState(0)
  b, n, d = len(devices), 24, 8
  centers = np.eye(2, d) * 4.0
  true = np.repeat(np.arange(2), n // 2)
  batch = np.stack([centers[true] + rng.randn(n, d) * 0.05
                    for _ in range(b)]).astype(np.float32)
  n_pad = pipeline.pad_bucket(n)
  padded = np.zeros((b, n_pad, d), np.float32)
  padded[:, :n] = batch
  n_valid = np.full((b,), n, np.int32)
  keys = np.stack([np.asarray(jax.random.key_data(jax.random.PRNGKey(i)))
                   for i in range(b)])
  sh3 = mesh_lib.batch_sharding(mesh, 3)
  sh2 = mesh_lib.batch_sharding(mesh, 2)
  g_batch = jax.make_array_from_callback(padded.shape, sh3,
                                         lambda i: padded[i])
  g_nv = jax.make_array_from_callback(n_valid.shape, sh1, lambda i: n_valid[i])
  g_keys = jax.make_array_from_callback(keys.shape, sh2, lambda i: keys[i])
  fn = batch_lib.make_batched_cluster_fn(cfg, mesh)
  labels, n_clusters = fn(g_batch, g_nv, g_keys)
  expected = utils.enforce_ordered_labels(true)
  for shard in labels.addressable_shards:
    got = np.asarray(shard.data)
    for row in got:
      np.testing.assert_equal(utils.enforce_ordered_labels(row[:n]), expected)
  for shard in n_clusters.addressable_shards:
    assert np.all(np.asarray(shard.data) == 2), np.asarray(shard.data)

  # 4. Row-sharded path with the model axis spanning both processes.
  mp_mesh = mesh_lib.make_mesh(dp=1, mp=len(devices))
  n2 = 64
  true2 = np.repeat(np.arange(4), n2 // 4)
  centers2 = np.eye(4, 16) * 4.0
  x2 = (centers2[true2] + rng.randn(n2, 16) * 0.05).astype(np.float32)
  cfg2 = cfg.replace(max_clusters=7)
  rows = mesh_lib.row_sharding(mp_mesh, 2)
  g_x2 = jax.make_array_from_callback(x2.shape, rows, lambda i: x2[i])
  sfn = sharded_lib.make_sharded_cluster_fn(cfg2, mp_mesh, num_iters=16)
  labels2, n2_clusters = sfn(g_x2, jax.random.PRNGKey(0))
  # labels2 is row-sharded; each process checks its addressable rows.
  expected2 = utils.enforce_ordered_labels(true2)
  for shard in labels2.addressable_shards:
    start = shard.index[0].start or 0
    got = np.asarray(shard.data)
    # Per-shard labels are cluster ids in the *global* labeling; compare via
    # the global expected slice after one process-local consistency pass:
    # rows within a shard that share a true cluster must share a label.
    seg = expected2[start:start + got.shape[0]]
    for a in range(got.shape[0]):
      for bidx in range(a + 1, got.shape[0]):
        assert (got[a] == got[bidx]) == (seg[a] == seg[bidx])
  assert int(n2_clusters) == 4, int(n2_clusters)

  print(f"[worker {process_id}] all checks passed", flush=True)


def launch(num_processes: int = 2, devices_per_process: int = 4) -> int:
  port = _free_port()
  coordinator = f"127.0.0.1:{port}"
  procs = []
  env_base = {k: v for k, v in os.environ.items()
              if k not in ("PALLAS_AXON_POOL_IPS",)}
  for pid in range(num_processes):
    env = dict(env_base)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_process}")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs.append(subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--process-id", str(pid), "--num-processes", str(num_processes),
         "--coordinator", coordinator],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
  rc = 0
  for pid, p in enumerate(procs):
    try:
      out, _ = p.communicate(timeout=420)
    except subprocess.TimeoutExpired:
      p.kill()
      out, _ = p.communicate()
      rc = 1
    tail = out.decode(errors="replace").strip().splitlines()[-8:]
    print(f"--- process {pid} (rc={p.returncode}) ---")
    print("\n".join(tail))
    rc = rc or p.returncode
  result = {"ok": rc == 0, "num_processes": num_processes,
            "devices_per_process": devices_per_process}
  print(json.dumps(result))
  return rc


def main() -> int:
  ap = argparse.ArgumentParser()
  ap.add_argument("--worker", action="store_true")
  ap.add_argument("--process-id", type=int, default=0)
  ap.add_argument("--num-processes", type=int, default=2)
  ap.add_argument("--coordinator", type=str, default="")
  args = ap.parse_args()
  if args.worker:
    worker(args.process_id, args.num_processes, args.coordinator)
    return 0
  return launch(args.num_processes)


if __name__ == "__main__":
  sys.exit(main())
