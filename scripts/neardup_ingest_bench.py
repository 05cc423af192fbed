"""Near-dup ingest scale probe: big persisted index, small delta shard.

Measures the shape that matters at 100 TB — the index side is ALL
history, the delta is one crawl shard — and quantifies what the
int64-bucket Bloom semi-join saves: index band rows entering the
co-partition shuffle, and end-to-end ingest wall time, with and
without the filter. Appends a section to BENCH/STAGES.md.

Usage: python scripts/neardup_ingest_bench.py [n_base] [n_delta]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def synth_docs(n: int, seed: int, tag: str):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"{tag}{i:04d}" for i in range(4000)])
    texts = [" ".join(rng.choice(vocab, size=40, replace=False))
             for _ in range(n)]
    return texts


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_delta = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data as rd

    import pyarrow as pa

    from hmse_ray.pipelines import incremental
    from hmse_ray.pipelines.queries import TEXT_CFG
    from hmse_ray.util import tune_data_context

    tune_data_context()
    base_texts = synth_docs(n_base, 11, "w")
    # delta: half near-dups of random base docs, half novel
    rng = np.random.default_rng(13)
    delta_texts = []
    for i in range(n_delta):
        if i % 2 == 0:
            delta_texts.append(
                base_texts[int(rng.integers(n_base))] + " zz")
        else:
            delta_texts.append(synth_docs(1, 1000 + i, "n")[0])

    def ds_of(texts, id0):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(id0, id0 + len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })).repartition(64)

    base = ds_of(base_texts, 0)
    delta = ds_of(delta_texts, 10_000_000)

    t0 = time.time()
    bands, sigs = incremental.build_neardup_index(base, TEXT_CFG)
    bands = bands.materialize()
    n_band_rows = bands.count()
    t_build = time.time() - t0

    walls = {}
    hits = {}
    for mode, kw in (("plain", {}), ("semijoin", {"semijoin": True})):
        t0 = time.time()
        out = incremental.ingest_delta_neardup(
            bands, sigs, delta, TEXT_CFG, **kw).materialize()
        walls[mode] = round(time.time() - t0, 1)
        df = out.to_pandas()
        hits[mode] = int((df["is_new"] == 0).sum())
    assert hits["plain"] == hits["semijoin"], hits

    # how many index band rows would survive the bloom filter
    from hmse_ray.functions.bloom import build_from_dataset

    dsig = incremental.sign_minhash(delta, TEXT_CFG).materialize()
    dbands = incremental.band_rows(dsig, TEXT_CFG).materialize()
    bloom = build_from_dataset(dbands, "bucket", int_keys=True)
    bits_ref = ray.put((bloom.bits, bloom.m_bits, bloom.k))

    def count_kept(t):
        from hmse_ray.functions.bloom import Bloom

        bits, mb, k = ray.get(bits_ref)
        b = Bloom(mb, k, bits=bits)
        kept = int(b.contains_many_i64(t["bucket"].to_numpy()).sum())
        return pd.DataFrame({"kept": [kept], "total": [t.num_rows]})

    import pyarrow as pa  # noqa: F811

    agg = bands.map_batches(
        count_kept, batch_format="pyarrow").to_pandas().sum()
    kept, total = int(agg["kept"]), int(agg["total"])

    lines = [
        f"\n## near-dup ingest scale probe ({time.strftime('%Y-%m-%d %H:%M:%S')})",
        "",
        f"Base index {n_base:,} docs ({n_band_rows:,} band rows), delta "
        f"{n_delta:,} docs (50% planted near-dups). Index build "
        f"{t_build:.1f}s (one-time; amortized across ingests).",
        "",
        "| path | ingest wall (s) | index band rows into the shuffle | dup hits |",
        "|---|---|---|---|",
        f"| plain co-partition | {walls['plain']} | {total:,} (all) | {hits['plain']:,} |",
        f"| bloom semi-join | {walls['semijoin']} | {kept:,} "
        f"({kept / max(1, total):.1%}) | {hits['semijoin']:,} |",
        "",
        f"The bloom of the delta's bucket set cuts the index-side shuffle "
        f"payload {total / max(1, kept):.0f}x; outputs are identical "
        "(asserted). At a 10^12-row index the plain path shuffles the "
        "whole history every shard; the semi-join path shuffles "
        "~|delta| x bands x (1 + fpp) rows.",
    ]
    txt = "\n".join(lines) + "\n"
    print(txt)
    with open("BENCH/STAGES.md", "a") as f:
        f.write(txt)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
