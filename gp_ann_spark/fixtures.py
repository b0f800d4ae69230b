"""Deterministic synthetic fixtures for evaluation gates.

The driver's parquet embeddings are well-separated isotropic label blobs —
the one geometry where k-means partitioning is provably optimal, so the
reference's headline claim (graph partitioning beats k-means on recall@10
vs shards probed; README.md:1, arXiv:2403.01797 §5) cannot be demonstrated
on them. Real billion-scale ANN datasets live on low-dimensional manifolds
with non-convex cluster structure; ``manifold_rings`` synthesizes the
minimal such geometry with a *provable* separation between the two
partitioner families:

- Points lie on concentric rings (non-convex, nested). Every k-means-family
  shard is an intersection of half-spaces (a power-diagram cell — Lloyd's
  assignment step, and the balanced variant's penalized assignment, both
  induce convex cells). A convex cell that contains a full outer ring
  contains its convex hull and hence every inner ring of the same site; a
  site holds more points than the balance cap allows, so k-means MUST cut
  rings regardless of seeding.
- Ring sizes are radius-proportional, giving constant along-ring spacing,
  and the radial gap between rings is ~10× that spacing, so the k=10 NN
  graph almost never bridges rings. Ring sizes are chosen so rings pack
  exactly into balanced shards (ring j plus ring (R-1-j) sums to n/shards),
  so a near-zero-cut balanced partition EXISTS and graph partitioning can
  find it.

Everything is seeded: the fixture, and every consumer in the gate
(graph_partition seed, Lloyd seed 555, router sample seed 420), so gated
comparisons are exactly reproducible run-to-run.
"""

from __future__ import annotations

import numpy as np

__all__ = ["manifold_rings"]


def manifold_rings(
    n: int = 4096,
    d: int = 8,
    sites: int = 2,
    rings_per_site: int = 8,
    gap: float = 1.5,
    noise: float = 0.02,
    seed: int = 7,
) -> tuple[np.ndarray, np.ndarray]:
    """Concentric-ring manifold fixture; returns (points[n,d] float32,
    ring_id[n] int64).

    ``sites`` well-separated centers (pairwise distance ~40 ≫ ring radii),
    each carrying ``rings_per_site`` concentric rings in dims (0,1) with
    radii 1, 1+gap, 1+2·gap, …; per-ring counts proportional to radius.
    With the defaults: spacing ≈ 2π·Σr/n ≈ 0.15, so the 5-hop k-NN arc
    (≈ 0.77) stays well inside the radial gap 1.5 — the k=10 NN graph is
    ring-separable — while ring sizes [41,102,…,471] pair up to exactly
    n/8 = 512, so an (almost) zero-cut balanced 8-shard partition exists.
    """
    rng = np.random.default_rng(seed)
    radii = 1.0 + gap * np.arange(rings_per_site)
    all_r = np.tile(radii, sites)
    counts = np.floor(n * all_r / all_r.sum()).astype(int)
    counts[-1] += n - counts.sum()
    offs = rng.normal(0, 40.0, size=(sites, d))
    pts, labels = [], []
    ring_id = 0
    for s in range(sites):
        for r in radii:
            m = int(counts[ring_id])
            ang = np.sort(rng.uniform(0, 2 * np.pi, m))
            X = np.tile(offs[s], (m, 1))
            X[:, 0] += r * np.cos(ang)
            X[:, 1] += r * np.sin(ang)
            X += rng.normal(0, noise, size=X.shape)
            pts.append(X)
            labels.append(np.full(m, ring_id, dtype=np.int64))
            ring_id += 1
    return np.vstack(pts).astype(np.float32), np.concatenate(labels)
