"""The flagship write-path pipeline (SURVEY.md sections 3.1, 4.2).

read(images) -> [L2+L3] chunk+sha -> groupby(sha) exact dedup (shuffle 1)
             -> [L4] MinHash actor pool (captions) + SimHash actor pool
                (pixels) -> LSH verified candidate pairs (shuffle 2)
             -> connected components -> cluster assignments
             -> storage accounting metrics.

Column pruning is load-bearing: when given a parquet path, each branch
reads ONLY its columns (``read_parquet(columns=...)`` row-group
pushdown measured 20x faster than post-read projection on this input) —
the caption branch never loads pixels, the id pass loads one column.
Everything streams; only small aggregates materialize.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from hmse_ray.config import Config, DEFAULT_CONFIG
from hmse_ray.stages import chunking, clustering, exact_dedup, lsh, signatures


def read_images(path_or_table, columns=None, num_blocks: int | None = None):
    """images source: parquet path (directory or file) or in-memory table.

    The production target is ``ray.data.read_lance``; lance is not
    installed in this container, so parquet is the storage format here
    (same columnar semantics; column pruning via ``columns=``).

    num_blocks defaults to 8x cluster CPUs: the downstream signer actor
    pools load-balance far better on fine blocks (measured 28.8s ->
    16.7s for a 200k-row MinHash sign at 16 CPUs going from 32 to 128
    blocks — coarse blocks leave actors idle during the last waves).
    """
    if isinstance(path_or_table, pa.Table):
        t = path_or_table.select(columns) if columns else path_or_table
        return rd.from_arrow(t)
    if isinstance(path_or_table, str) and path_or_table.endswith(".lance"):
        try:  # production target; the lance package is not in this container
            return rd.read_lance(path_or_table, columns=columns)
        except (AttributeError, ImportError) as e:
            raise NotImplementedError(
                "lance input requires the 'lance' package (not installed); "
                "use parquet"
            ) from e
    if num_blocks is None:
        from hmse_ray.util import cluster_cpus

        num_blocks = 8 * cluster_cpus()
    return rd.read_parquet(path_or_table, columns=columns, override_num_blocks=num_blocks)


def _branch(images, columns):
    """Column-pruned read for one branch: pushdown when given a path."""
    if isinstance(images, (str, pa.Table)):
        return read_images(images, columns=columns)
    return images.select_columns(columns)


def _dedup_captions_first(mh_src, cfg: Config):
    """Exact-dedup captions BEFORE signing: one MinHash per DISTINCT
    caption + free (rep, member) exact-dup edges.

    At replication factor R this cuts signature compute ~R x (the
    dominant flagship cost) for one extra narrow shuffle keyed on
    sha256(caption). Connectivity is unchanged: members attach to their
    representative with jaccard 1.0, and the representative carries the
    group into the LSH graph (duplicate signatures are identical, so the
    direct path would produce the same components).

    Returns (unique_caps_ds(image_id, caption), exact_edges_ds(id_a,
    id_b, jaccard_est)).
    """
    import hashlib

    import pandas as pd

    from hmse_ray.stages.aggregates import hash_partitioned_groupby

    def keyed(batch: pa.Table) -> pa.Table:
        caps = batch["caption"].to_pylist()
        keys = [hashlib.sha256((c or "").encode()).hexdigest() for c in caps]
        return pa.table(
            {
                "capkey": pa.array(keys, pa.string()),
                "image_id": batch["image_id"],
                "caption": batch["caption"],
            }
        )

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["capkey", "image_id"], kind="stable")
        rep = df.groupby("capkey", sort=False).first().reset_index()
        uniq = pd.DataFrame(
            {
                "kind": "uniq",
                "id_a": rep["image_id"],
                "id_b": "",
                "caption": rep["caption"],
            }
        )
        j = df.merge(
            rep[["capkey", "image_id"]].rename(columns={"image_id": "rep_id"}),
            on="capkey",
        )
        mem = j[j["image_id"] != j["rep_id"]]
        edges = pd.DataFrame(
            {
                "kind": "edge",
                "id_a": mem["rep_id"].to_numpy(),
                "id_b": mem["image_id"].to_numpy(),
                "caption": "",
            }
        )
        return pd.concat([uniq, edges], ignore_index=True)

    both = hash_partitioned_groupby(
        mh_src.map_batches(keyed, batch_format="pyarrow"), ["capkey"], part
    ).materialize()

    import pyarrow.compute as pc

    uniq = both.map_batches(
        lambda t: pa.table(
            {
                "image_id": t.filter(pc.equal(t["kind"], "uniq"))["id_a"],
                "caption": t.filter(pc.equal(t["kind"], "uniq"))["caption"],
            }
        ),
        batch_format="pyarrow",
    )
    edges = both.map_batches(
        lambda t: (
            lambda f: pa.table(
                {
                    "id_a": f["id_a"],
                    "id_b": f["id_b"],
                    "jaccard_est": pa.array([1.0] * f.num_rows, pa.float64()),
                }
            )
        )(t.filter(pc.equal(t["kind"], "edge"))),
        batch_format="pyarrow",
    )
    return uniq, edges


def candidate_pair_edges(images, cfg: Config = DEFAULT_CONFIG, *,
                         use_simhash: bool = True, concurrency=None,
                         num_salts: int | None = None, dedup_first: bool = False,
                         dedup_pairs: bool = True):
    """images (path | Table | Dataset) -> verified candidate pairs
    (id_a, id_b, jaccard_est): caption MinHash path + image SimHash path.

    num_salts=None (default) splits over-cap buckets locally inside the
    partition kernels (no driver detection round-trip) and pre-shuffle
    salts only past lsh._PRESALT_MIN_ROWS; an explicit value forces
    uniform salting (stages/lsh.py module docstring).

    dedup_pairs=False skips the SimHash path's materialize +
    driver-dedup barrier and returns its edges lazy/undeduped — correct
    whenever the consumer is union-find clustering (VERDICT r3 item 1);
    pair-enumeration consumers keep the default.

    dedup_first: exact-dedup captions before the MinHash actor pool
    (sign each distinct caption once). Off by default: measured a net
    LOSS at ~1.3x replication on this host (the extra caption shuffle +
    materialization costs more than the signatures saved); enable for
    heavily replicated corpora (the reference's 5-copies scenario,
    crawl data with mirror duplication) where savings scale with the
    replication factor.
    """
    mh_src = _branch(images, ["image_id", "caption"])
    if dedup_first:
        uniq, exact_edges = _dedup_captions_first(mh_src, cfg)
        mh = signatures.minhash_stage(uniq, cfg, concurrency=concurrency)
    else:
        mh = signatures.minhash_stage(mh_src, cfg, concurrency=concurrency)
    if not use_simhash:
        pairs = lsh.candidate_pairs(mh, cfg, num_salts=num_salts)
        return pairs.union(exact_edges) if dedup_first else pairs

    # The two SIGNER pools run sequentially (two full-size actor pools
    # fighting for cores measured 63s vs 39s in round 1), but the
    # caption LSH chain (narrow shuffles, little CPU) overlaps with the
    # image signer pool: the minhash chain runs on the main thread while
    # a helper thread drives simhash signing. Only candidate pairs and
    # signatures are pinned — never payloads.
    import threading

    signed_mh = mh.materialize()  # minhash POOL finishes before simhash pool starts
    sh_src = _branch(images, ["image_id", "bytes", "w", "h", "fmt", "phash"])
    sh_holder: dict = {}

    def _sign_sh():
        try:
            sh_holder["ds"] = signatures.simhash_stage(
                sh_src, cfg, concurrency=concurrency
            ).materialize()
        except BaseException as e:  # surfaced after join
            sh_holder["err"] = e

    th = threading.Thread(target=_sign_sh, daemon=True)
    th.start()
    pairs = lsh.candidate_pairs(signed_mh, cfg, num_salts=num_salts)
    if dedup_first:
        pairs = pairs.union(exact_edges)
    pairs = pairs.materialize()
    th.join()
    if "err" in sh_holder:
        raise sh_holder["err"]
    return pairs.union(
        lsh.simhash_candidate_pairs(
            sh_holder["ds"], cfg, num_salts=num_salts, dedup=dedup_pairs
        )
    )


def cluster_assignments(images, cfg: Config = DEFAULT_CONFIG, *,
                        use_simhash: bool = True, concurrency=None,
                        num_salts: int | None = None, dedup_first: bool = False,
                        force_distributed: bool | None = None):
    """images -> (image_id, cluster_id) Dataset (all images).

    Candidate edges are VERIFIED before clustering (Jaccard estimate >=
    threshold / SimHash Hamming <= threshold) — a band collision alone
    is a candidate, not a duplicate (README.md:1553-1576).
    """
    pairs = candidate_pair_edges(
        images, cfg, use_simhash=use_simhash, concurrency=concurrency,
        num_salts=num_salts, dedup_first=dedup_first,
        dedup_pairs=False,  # union-find dedups; skip the extra barrier
    )
    if cfg.substring_captions:
        # north-rule suffix-array substring matching: captions wholly
        # contained in a longer caption link to it (winnowed candidate
        # generation + per-sup suffix array probes — see
        # pipelines/queries.substring_dup_docs). Containment is treated
        # as a duplicate relation with jaccard_est 1.0 (byte-exact
        # sub-match, the strongest near-identical signal).
        from hmse_ray.pipelines.queries import substring_dup_docs

        ss = substring_dup_docs(
            _branch(images, ["image_id", "caption"]),
            id_col="image_id", text_col="caption",
        ).map_batches(
            lambda t: pa.table(
                {
                    "id_a": t["id_sub"],
                    "id_b": t["id_sup"],
                    "jaccard_est": pa.array([1.0] * t.num_rows, pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
        pairs = pairs.union(ss)
    ids_ds = _branch(images, ["image_id"])
    return clustering.cluster_from_edges(
        pairs, ids_ds, cfg, force_distributed=force_distributed
    )


def chunk_index(images, cfg: Config = DEFAULT_CONFIG):
    """images -> canonical chunk index (sha256, canonical_ref, refcount,
    chunk_len) via the exact-dedup shuffle."""
    chunks = chunking.chunk_stage(_branch(images, ["image_id", "caption"]), cfg)
    return exact_dedup.dedup_chunks(chunks, cfg)


def ablation_run(images, cfg: Config = DEFAULT_CONFIG):
    """Run the layer subset selected by cfg.enable_l* flags
    (VALIDATION_METHODS.md:458-464 ablation configs; degraded modes
    README.md:745-770). Each layer is an independent Dataset product:

      L1 -> per-record compression accounting
      L2 -> chunk table (content-defined); L2 off + L3 on degrades to
            whole-record hashing (mode-4 analog)
      L3 -> canonical chunk index + dedup stats
      L4 -> near-dup cluster assignments
    """
    import pyarrow.compute as pc

    from hmse_ray.functions import compress as compress_fn

    out = {}
    if cfg.enable_l1:
        def l1(batch: pa.Table) -> pa.Table:
            caps = [(c or "").encode() for c in batch["caption"].to_pylist()]
            comp = [compress_fn.compress_record(c, cfg) for c in caps]
            return pa.table(
                {
                    "bytes_in": pa.array([len(c) for c in caps], pa.int64()),
                    "bytes_out": pa.array([len(p) for p, _ in comp], pa.int64()),
                }
            )

        from ray.data.aggregate import Sum

        out["l1_accounting"] = (
            _branch(images, ["image_id", "caption"])
            .map_batches(l1, batch_format="pyarrow")
            .aggregate(Sum("bytes_in", alias_name="bytes_in"),
                       Sum("bytes_out", alias_name="bytes_out"))
        )
    if cfg.enable_l3:
        if cfg.enable_l2:
            chunks = chunking.chunk_stage(_branch(images, ["image_id", "caption"]), cfg)
        else:
            # degraded mode: whole record is the chunk
            import hashlib

            def whole(batch: pa.Table) -> pa.Table:
                caps = [(c or "").encode()
                        for c in batch["caption"].to_pylist()]
                return pa.table(
                    {
                        "image_id": batch["image_id"],
                        "chunk_idx": pa.array([0] * len(caps), pa.int32()),
                        "sha256": pa.array(
                            [hashlib.sha256(c).hexdigest() for c in caps], pa.string()
                        ),
                        "chunk_len": pa.array([len(c) for c in caps], pa.int32()),
                    }
                )

            chunks = _branch(images, ["image_id", "caption"]).map_batches(
                whole, batch_format="pyarrow"
            )
        out["chunk_index"] = exact_dedup.dedup_chunks(chunks, cfg)
        out["dedup_stats"] = exact_dedup.dedup_stats(out["chunk_index"])
    elif cfg.enable_l2:
        out["chunks"] = chunking.chunk_stage(_branch(images, ["image_id", "caption"]), cfg)
    if cfg.enable_l4:
        out["clusters"] = cluster_assignments(
            images, cfg, use_simhash=_has_column(images, "bytes")
        )
    return out


def _has_column(images, col: str) -> bool:
    if isinstance(images, pa.Table):
        return col in images.schema.names
    if isinstance(images, str):
        import pyarrow.parquet as pq

        try:
            return col in pq.read_schema(images).names
        except Exception:
            import glob
            import os

            files = sorted(glob.glob(os.path.join(images, "*.parquet")))
            return bool(files) and col in pq.read_schema(files[0]).names
    return col in images.schema().names


def flagship(images, cfg: Config = DEFAULT_CONFIG, *,
             use_simhash: bool = True, concurrency=None):
    """Full write path; returns dict of result Datasets.

    keys: clusters (image_id, cluster_id), chunk_index, dedup_stats.
    """
    clusters = cluster_assignments(
        images, cfg, use_simhash=use_simhash, concurrency=concurrency
    )
    index = chunk_index(images, cfg)
    stats = exact_dedup.dedup_stats(index)
    return {"clusters": clusters, "chunk_index": index, "dedup_stats": stats}
