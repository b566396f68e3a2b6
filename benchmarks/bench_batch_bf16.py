import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from spectralcluster_tpu import configs, pipeline, utils
from spectralcluster_tpu.parallel import batch as bl, mesh as ml
from spectralcluster_tpu.types import EigenSolver

rng = np.random.RandomState(0)
utts, truths = [], []
for i in range(1024):
    k = 2 + (i % 3)
    c = rng.randn(k, 256) * 3
    lab = np.repeat(np.arange(k), -(-1024 // k))[:1024]
    utts.append((c[lab] + rng.randn(1024, 256) * 0.4).astype(np.float32))
    truths.append(lab)
cfg = pipeline.PipelineConfig(
    refinement_options=configs.icassp2018_refinement_options(),
    min_clusters=2, max_clusters=7, custom_dist="cosine", max_iter=300,
    eigensolver=EigenSolver.SubspaceIteration, matmul_precision="highest")
mesh = ml.make_mesh()
# warm
preds = bl.cluster_batch_streamed(utts[:64], cfg, mesh=mesh, chunk=64,
                                  transfer_dtype=jnp.bfloat16)
times = []
for _ in range(2):
    t0 = time.time()
    preds = bl.cluster_batch_streamed(utts, cfg, mesh=mesh, chunk=64,
                                      window=4, transfer_dtype=jnp.bfloat16)
    times.append(time.time() - t0)
e2e = float(np.median(times))
match = sum(bool(np.array_equal(utils.enforce_ordered_labels(p),
                                utils.enforce_ordered_labels(t)))
            for p, t in zip(preds, truths))
print(f"bf16-staged e2e={e2e:.2f}s => {1024/e2e:.1f} utt/s, gt={match}/1024",
      flush=True)
