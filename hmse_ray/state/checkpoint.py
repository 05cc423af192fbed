"""Resumable partitioned execution (S3 + north_rule checkpoint contract).

Reference analog: periodic index flush to SD + atomic commit (temp
sector -> atomic pointer update), enabling rebuild after power loss
(README.md:174-175, 737, 2200-2206). For a batch Ray pipeline this
becomes (ray guide "Sources & sinks"): one output directory per input
shard, written to a temp dir and atomically renamed, with a _SUCCESS
marker + per-partition lineage & dedup-ratio metrics JSON. A killed run
skips partitions whose marker exists.

Two phases:

  phase 1 (expensive, per-partition, RESUMABLE): signature computation
      (MinHash + SimHash actor pools) and chunk explode+hash per input
      file shard -> parquet + metrics under phase1/part={p}/.
  phase 2 (global shuffles, cheap relative to phase 1): candidate
      pairs, clustering, global chunk index, final stats -> final/
      written atomically. Phase 2 never recomputes signatures; after a
      kill it re-runs from the phase-1 parquet only.

Partition = deterministic group of input FILES (hash of basename), the
same layout a 100 TB run would use (one partition per input shard
range); lineage.json records exactly which files built each partition.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa

import ray.data as rd

from hmse_ray.config import Config, DEFAULT_CONFIG
from hmse_ray.functions import murmur3
from hmse_ray.stages import chunking, clustering, exact_dedup, lsh, signatures


def assign_partitions(input_files: list[str], num_partitions: int) -> dict[int, list[str]]:
    """Deterministic file -> partition map (murmur3 of basename)."""
    out: dict[int, list[str]] = {p: [] for p in range(num_partitions)}
    for f in sorted(input_files):
        p = murmur3.murmur3_bytes(os.path.basename(f).encode(), 0xC0FFEE) % num_partitions
        out[p].append(f)
    return out


def _atomic_write_dir(tmp: str, final: str) -> None:
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)


def partition_done(out_dir: str, p: int) -> bool:
    return os.path.exists(os.path.join(out_dir, "phase1", f"part={p}", "_SUCCESS"))


def run_phase1_partition(files: list[str], out_dir: str, p: int,
                         cfg: Config = DEFAULT_CONFIG, concurrency=None) -> dict:
    """Signatures + chunks for one partition; atomic directory commit."""
    part_dir = os.path.join(out_dir, "phase1", f"part={p}")
    if os.path.exists(os.path.join(part_dir, "_SUCCESS")):
        # the marker alone is not enough: a re-run with MORE input files
        # can hash a new shard into this partition, and trusting the
        # cached parquet would silently drop that shard from clusters,
        # chunk_index and the store. lineage.json records exactly what
        # built the partition — recompute on any mismatch.
        with open(os.path.join(part_dir, "lineage.json")) as f:
            lineage = json.load(f)
        if sorted(lineage.get("input_files", [])) == sorted(files):
            with open(os.path.join(part_dir, "metrics.json")) as f:
                return json.load(f)
        shutil.rmtree(part_dir)
    t0 = time.time()
    tmp = part_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    images = rd.read_parquet(files)
    mh = signatures.minhash_stage(images, cfg, concurrency=concurrency)
    mh.write_parquet(os.path.join(tmp, "minhash"))
    sh = signatures.simhash_stage(images, cfg, concurrency=concurrency)
    sh.write_parquet(os.path.join(tmp, "simhash"))
    chunks = chunking.chunk_stage(images, cfg)
    chunks.write_parquet(os.path.join(tmp, "chunks"))
    # per-partition dedup-ratio metric (within-partition unique chunks)
    import pyarrow.parquet as pq

    ct = pq.read_table(
        os.path.join(tmp, "chunks"), columns=["sha256", "chunk_len"]
    )
    import pyarrow.compute as pc

    n_chunks = ct.num_rows
    n_unique = pc.count_distinct(ct["sha256"]).as_py()
    total_b = pc.sum(ct["chunk_len"]).as_py() or 0
    metrics = {
        "partition": p,
        "n_files": len(files),
        "n_rows": images.count(),
        "n_chunks": n_chunks,
        "n_unique_chunks": n_unique,
        "chunk_bytes": int(total_b),
        "partition_dedup_ratio": n_chunks / max(1, n_unique),
        "wall_sec": round(time.time() - t0, 3),
    }
    with open(os.path.join(tmp, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    with open(os.path.join(tmp, "lineage.json"), "w") as f:
        json.dump({"partition": p, "input_files": files}, f, indent=1)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    _atomic_write_dir(tmp, part_dir)
    return metrics


def run_phase2(out_dir: str, cfg: Config = DEFAULT_CONFIG,
               input_files: list[str] | None = None,
               write_store: bool = False) -> dict:
    """Global shuffles over the phase-1 parquet; atomic final commit.

    write_store: additionally join the final clusters back to the
    original payload rows and persist the full/pointer/delta store table
    (reference write path S2) + per-kind stats. Off by default — the
    cluster assignment is the north-rule product; the store table
    re-reads every payload.
    """
    t0 = time.time()
    import glob

    p1 = os.path.join(out_dir, "phase1")
    # only marker-bearing partitions are trusted (the resume contract):
    # a *.tmp dir or a partition killed between write and atomic rename
    # must not be read as committed data
    parts = sorted(
        d
        for d in os.listdir(p1)
        if d.startswith("part=")
        and not d.endswith(".tmp")
        and os.path.exists(os.path.join(p1, d, "_SUCCESS"))
    )

    def files_of(sub: str) -> list[str]:
        out = []
        for d in parts:
            out.extend(sorted(glob.glob(os.path.join(p1, d, sub, "*.parquet"))))
        return out

    mh = rd.read_parquet(files_of("minhash"))
    sh = rd.read_parquet(files_of("simhash"))
    chunks = rd.read_parquet(files_of("chunks"))

    pairs = lsh.candidate_pairs(mh, cfg).union(lsh.simhash_candidate_pairs(sh, cfg))
    clusters = clustering.cluster_from_edges(pairs, mh, cfg)
    # two consumers (stats + write) — materialize or the whole dedup
    # shuffle executes twice, like clusters below
    index = exact_dedup.dedup_chunks(chunks, cfg).materialize()
    stats = exact_dedup.dedup_stats(index).to_pandas().to_dict("records")[0]

    tmp = os.path.join(out_dir, "final.tmp")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    clusters = clusters.materialize()
    clusters.write_parquet(os.path.join(tmp, "clusters"))
    index.write_parquet(os.path.join(tmp, "chunk_index"))
    if write_store and input_files:
        from hmse_ray.stages import store as store_stage

        images = rd.read_parquet(input_files)
        payload_b = sum(os.path.getsize(f) for f in input_files)
        st = store_stage.store_table(
            images, clusters, cfg, est_bytes=payload_b).materialize()
        st.write_parquet(os.path.join(tmp, "store"))
        stats["store_kinds"] = store_stage.store_kind_stats(st).to_pandas().to_dict(
            "records"
        )
    stats["phase2_wall_sec"] = round(time.time() - t0, 3)
    with open(os.path.join(tmp, "metrics.json"), "w") as f:
        json.dump(stats, f, indent=1, default=str)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    _atomic_write_dir(tmp, os.path.join(out_dir, "final"))
    return stats


def run_resumable(input_files: list[str], out_dir: str,
                  cfg: Config = DEFAULT_CONFIG, num_partitions: int = 8,
                  concurrency=None, stop_after: int | None = None,
                  write_store: bool = False) -> dict:
    """Full resumable run. ``stop_after`` kills the job after N phase-1
    partitions (test hook simulating failure mid-run)."""
    os.makedirs(out_dir, exist_ok=True)
    assign = assign_partitions(input_files, num_partitions)
    done = 0
    part_metrics = []
    for p in range(num_partitions):
        if not assign[p]:
            continue
        if stop_after is not None and done >= stop_after:
            raise RuntimeError(f"simulated kill after {stop_after} partitions")
        part_metrics.append(run_phase1_partition(assign[p], out_dir, p, cfg, concurrency))
        done += 1
    stats = run_phase2(out_dir, cfg, input_files=input_files, write_store=write_store)
    stats["partitions"] = part_metrics
    return stats
