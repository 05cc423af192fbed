"""Phase-level wall-time breakdown of the flagship dedup pipeline.

Replicates candidate_pair_edges' structure with explicit barriers so
each phase is separately timable (the production pipeline overlaps the
caption-LSH chain with the image signer pool; here they are sequenced,
so the sum OVERSTATES production wall time — the per-phase shares are
the point). Appends BENCH/STAGES.md.

Usage: python scripts/profile_flagship.py [rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from hmse_ray.config import DEFAULT_CONFIG as cfg
    from hmse_ray.pipelines import dedup
    from hmse_ray.sources import fixtures
    from hmse_ray.stages import clustering, lsh, signatures
    from hmse_ray.util import tune_data_context

    tune_data_context(ncpu)
    fdir = fixtures.fixture_dir(rows, seed=42)
    dedup.read_images(fdir + "/images").count()  # warm page cache

    phases = []

    def phase(name, fn):
        t0 = time.time()
        out = fn()
        phases.append((name, time.time() - t0))
        return out

    mh_src = dedup._branch(fdir + "/images", ["image_id", "caption"])
    signed_mh = phase("minhash sign (actor pool)",
                      lambda: signatures.minhash_stage(mh_src, cfg).materialize())
    pairs = phase("caption LSH chain (band explode + bucket shuffle + verify)",
                  lambda: lsh.candidate_pairs(signed_mh, cfg).materialize())
    sh_src = dedup._branch(fdir + "/images",
                           ["image_id", "bytes", "w", "h", "fmt", "phash"])
    signed_sh = phase("simhash sign (actor pool, decodes pixels)",
                      lambda: signatures.simhash_stage(sh_src, cfg).materialize())
    sh_pairs = phase("image LSH chain (simhash bands + Hamming verify)",
                     lambda: lsh.simhash_candidate_pairs(signed_sh, cfg).materialize())
    edges = pairs.union(sh_pairs)
    ids_ds = dedup._branch(fdir + "/images", ["image_id"])
    clusters = phase("connected components + assignment",
                     lambda: clustering.cluster_from_edges(edges, ids_ds, cfg).materialize())
    n = clusters.count()

    total = sum(t for _, t in phases)
    lines = [
        f"\n## flagship phase breakdown ({time.strftime('%Y-%m-%d %H:%M:%S')}, "
        f"rows={rows}, num_cpus={ncpu}, phases SEQUENCED — production "
        f"overlaps simhash signing with the caption LSH chain)\n",
        "| phase | sec | share |", "|---|---|---|",
    ]
    for name, t in phases:
        lines.append(f"| {name} | {t:.1f} | {100 * t / total:.0f}% |")
    lines.append(f"| total (sequenced) | {total:.1f} | — |")
    lines.append(f"\nassignments: {n} rows\n")
    text = "\n".join(lines)
    print(text)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/STAGES.md", "a") as f:
        f.write(text)
    ray.shutdown()


if __name__ == "__main__":
    main()
