"""CLI entry point (reference analog: tools argparse surface +
``hmse_validate()`` device runs — SURVEY.md section 2.9).

    python -m hmse_ray.run cluster   --input DIR --output DIR
    python -m hmse_ray.run resumable --input-files F1 F2 ... --output DIR
    python -m hmse_ray.run verify    --input DIR
    python -m hmse_ray.run energy    --size-gb 75 --cf 9.375 --bandwidth-mbps 1

Owns the Ray session (guarded init; shutdown on exit) — the only module
besides bench.py and the test fixture that may do so.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="hmse_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("cluster", help="images parquet -> cluster assignments")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--num-cpus", type=int, default=32)
    p.add_argument("--no-simhash", action="store_true")
    p.add_argument("--substring-captions", action="store_true",
                   help="also link captions wholly contained in a longer "
                        "caption (suffix-array substring matching)")

    p = sub.add_parser(
        "substring", help="(id, text) parquet -> containment pairs "
        "(suffix-array substring matching)")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--num-cpus", type=int, default=32)

    p = sub.add_parser(
        "ingest", help="incremental dedup ingest: delta parquet vs a "
        "persisted index (pipelines/incremental.py) — exact sha by "
        "default, MinHash-LSH near-dup with --neardup")
    p.add_argument("--index", required=True,
                   help="persisted index dir (_SUCCESS-gated); created "
                        "when --build-from is given")
    p.add_argument("--build-from",
                   help="build the base index from this (id, text) parquet "
                        "and persist it to --index, then exit")
    p.add_argument("--delta", help="(id, text) parquet shard to ingest")
    p.add_argument("--output", help="assignments parquet dir")
    p.add_argument("--updated-index",
                   help="persist index + newly-inserted canonicals here "
                        "(the next ingest's --index)")
    p.add_argument("--semijoin", action="store_true",
                   help="bloom semi-join: pre-filter the index stream by a "
                        "bloom of the delta's shas (or, with --neardup, "
                        "band buckets) before the shuffle "
                        "(the big-index/small-delta shape)")
    p.add_argument("--neardup", action="store_true",
                   help="near-dup ingest against a persisted LSH band "
                        "index (online L4 probe semantics) instead of "
                        "exact sha dedup")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--num-cpus", type=int, default=32)

    p = sub.add_parser("resumable", help="checkpointed two-phase run")
    p.add_argument("--input-files", nargs="+", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--partitions", type=int, default=8)
    p.add_argument("--num-cpus", type=int, default=32)

    p = sub.add_parser("verify", help="cluster + store + reconstruct + invariant")
    p.add_argument("--input", required=True)
    p.add_argument("--num-cpus", type=int, default=32)

    p = sub.add_parser("energy", help="A7 energy break-even model")
    p.add_argument("--size-gb", type=float, required=True)
    p.add_argument("--cf", type=float, default=9.375)
    p.add_argument("--bandwidth-mbps", type=float, default=1.0)

    args = ap.parse_args(argv)

    if args.cmd == "energy":
        from hmse_ray.tools import energy_model

        e = energy_model.energy(args.size_gb, args.cf, args.bandwidth_mbps)
        print(json.dumps({
            "compression_wh": e.compression_wh,
            "transmission_wh": e.transmission_wh,
            "total_wh": e.total_wh,
            "breakeven_cf": energy_model.breakeven_cf(args.size_gb, args.bandwidth_mbps),
            "roi": energy_model.roi(args.size_gb, args.cf, args.bandwidth_mbps),
        }))
        return 0

    import os

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        # Under `ray job submit` (the north rule's launch path) the job
        # server exports RAY_ADDRESS; connect to THAT cluster instead of
        # starting a local one. --num-cpus applies only to local mode —
        # a real cluster's size is fixed by its nodes.
        addr = os.environ.get("RAY_ADDRESS", "local")
        if addr and addr not in ("local",):
            ray.init(address=addr, logging_level="ERROR")
        else:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from hmse_ray.util import cluster_cpus, tune_data_context

        tune_data_context(cluster_cpus(args.num_cpus))
    try:
        from hmse_ray.config import DEFAULT_CONFIG as cfg
        from hmse_ray.pipelines import dedup

        if args.cmd == "cluster":
            if args.substring_captions:
                cfg = cfg.with_overrides(substring_captions=True)
            clusters = dedup.cluster_assignments(
                args.input, cfg, use_simhash=not args.no_simhash
            )
            clusters.write_parquet(args.output)
            print(json.dumps({"rows": clusters.count(), "output": args.output}))
        elif args.cmd == "substring":
            import ray.data as rd

            from hmse_ray.pipelines.queries import substring_dup_docs

            pairs = substring_dup_docs(
                rd.read_parquet(args.input, columns=[args.id_col, args.text_col]),
                id_col=args.id_col, text_col=args.text_col,
            )
            pairs.write_parquet(args.output)
            print(json.dumps({"rows": pairs.count(), "output": args.output}))
        elif args.cmd == "ingest":
            import ray.data as rd

            from hmse_ray.pipelines import incremental

            from hmse_ray.pipelines.queries import TEXT_CFG

            if args.build_from:
                # ADVICE r4: build-then-exit would silently ignore a
                # combined --delta/--output request — refuse instead
                if args.delta or args.output:
                    ap.error("--build-from builds the index and exits; "
                             "run ingest again with --delta/--output "
                             "against the built --index")
                src = rd.read_parquet(
                    args.build_from, columns=[args.id_col, args.text_col])
                if args.neardup:
                    bands, sigs = incremental.build_neardup_index(
                        src, TEXT_CFG, args.id_col, args.text_col)
                    incremental.persist_neardup_index(bands, sigs, args.index)
                    print(json.dumps({"index": args.index,
                                      "entries": sigs.count()}))
                else:
                    idx = incremental.build_index(
                        src, args.id_col, args.text_col)
                    incremental.persist_index(idx, args.index)
                    print(json.dumps({"index": args.index,
                                      "entries": idx.count()}))
            else:
                if not (args.delta and args.output):
                    ap.error("ingest needs --delta and --output "
                             "(or --build-from)")
                delta = rd.read_parquet(
                    args.delta, columns=[args.id_col, args.text_col])
                if args.neardup:
                    bands, sigs = incremental.load_neardup_index(args.index)
                    assigned, signed = incremental.ingest_delta_neardup(
                        bands, sigs, delta, TEXT_CFG, args.id_col,
                        args.text_col, semijoin=args.semijoin,
                        return_signed=True)
                    assigned = assigned.materialize()
                    assigned.write_parquet(args.output)
                    # new-canonical count straight off the assignment —
                    # the index rows (a second pass over the delta) are
                    # only built when an index update was asked for
                    stats = {"rows": assigned.count(),
                             "new_canonicals": int(assigned.sum("is_new")
                                                   or 0),
                             "output": args.output}
                    if args.updated_index:
                        nb, ns = incremental.neardup_index_delta(
                            assigned, delta, TEXT_CFG, args.id_col,
                            args.text_col, signed_ds=signed)
                        # normalize the minhash list type so the
                        # parquet-loaded and freshly-signed sides union
                        norm = incremental._normalize_sigs(TEXT_CFG)
                        incremental.persist_neardup_index(
                            bands.union(nb),
                            sigs.map_batches(norm, batch_format="pyarrow")
                            .union(ns.map_batches(
                                norm, batch_format="pyarrow")),
                            args.updated_index)
                        stats["updated_index"] = args.updated_index
                    print(json.dumps(stats))
                else:
                    idx = incremental.load_index(args.index)
                    fn = (incremental.ingest_delta_semijoin if args.semijoin
                          else incremental.ingest_delta)
                    assigned = fn(idx, delta, args.id_col,
                                  args.text_col).materialize()
                    assigned.write_parquet(args.output)
                    stats = {"rows": assigned.count(),
                             "new_canonicals":
                                 incremental.index_delta(assigned).count(),
                             "output": args.output}
                    if args.updated_index:
                        incremental.persist_index(
                            incremental.load_index(args.index).union(
                                incremental.index_delta(assigned)),
                            args.updated_index)
                        stats["updated_index"] = args.updated_index
                    print(json.dumps(stats))
        elif args.cmd == "resumable":
            from hmse_ray.state import checkpoint

            stats = checkpoint.run_resumable(
                args.input_files, args.output, cfg, num_partitions=args.partitions
            )
            print(json.dumps(stats, default=str))
        elif args.cmd == "verify":
            from hmse_ray.pipelines import verify

            import glob

            clusters = dedup.cluster_assignments(args.input, cfg)
            payload_b = sum(
                os.path.getsize(f)
                for f in glob.glob(os.path.join(args.input, "**", "*.parquet"),
                                   recursive=True)) or None
            inv = verify.roundtrip(dedup.read_images(args.input), clusters,
                                   cfg, est_bytes=payload_b)
            print(json.dumps(inv, default=str))
            if inv["caption_pass"] != inv["n_rows"] or inv.get("n_missing"):
                return 1
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
