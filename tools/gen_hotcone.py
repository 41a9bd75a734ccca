#!/usr/bin/env python3
"""Hot-cone probe corpus for the q187 worst-case cell-population guard
(r13): 500k DISTINCT 64-dim vectors, 90% in ONE tight gaussian cone
(sigma 0.5 around a norm-10 center), 10% scattered on the radius-10
sphere — and the scattered points get the LOWEST vec_ids, so the
quantizer's first-k-by-id init starts entirely outside the cone and
Lloyd captures the whole cone in one (or very few) top cells: a
centroid only ever moves toward the mean of its own members, so no
scattered centroid can migrate in after round 1. The captured top
cell's ~k2 = 45 two-level leaves then hold ~10k reps each — exactly
the quantizer-fails-to-split shape the recursive split guard
(Extended10.boundCellPopulations) exists to bound. Pairwise cosine
inside the cone is ~0.86 << 0.99, so the pairing stage stays sparse
and the probe times the GUARD, not an edge blowup. Deterministic
(seed 7).

Usage: python3 tools/gen_hotcone.py  ->  /tmp/graft_hotcone500k
(embeddings.parquet only — q187 reads nothing else).
"""
import numpy as np, pyarrow as pa, pyarrow.parquet as pq, os

rng = np.random.default_rng(7)
n, d, n_scatter = 500_000, 64, 50_000
center = rng.normal(0, 1, d)
center = 10.0 * center / np.linalg.norm(center)
scatter = rng.normal(0, 1, (n_scatter, d))
scatter = 10.0 * scatter / np.linalg.norm(scatter, axis=1, keepdims=True)
cone = center + rng.normal(0, 0.5, (n - n_scatter, d))
vecs = np.vstack([scatter, cone])
out = '/tmp/graft_hotcone500k'
os.makedirs(out, exist_ok=True)
t = pa.table({'vec_id': pa.array(np.arange(n), pa.int64()),
              'embedding': pa.array(list(vecs), pa.list_(pa.float64()))})
pq.write_table(t, f'{out}/embeddings.parquet')
print(out, t.num_rows)
