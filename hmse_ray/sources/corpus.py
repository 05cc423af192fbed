"""Raw text-corpus file source (S1 variant — the reference's own input
modality).

The reference ingests corpora as FLAT BYTE STREAMS per file
(README.md:92-109: "self-contained, offline batch processor" over
10 GB text corpora, streamed in blocks). This source reads raw files
with ``ray.data.read_binary_files`` (file-level parallelism; one
stream = one file = one unit of content-defined chunking, exactly the
stream-local partitioning cdc_source_chunks documents) and feeds the
same FastCDC -> SHA-256 machinery the tabular path uses.

For the driver gate, corpus files are derived deterministically from
the testdata documents table (one file per source, docs concatenated in
doc_id order — byte-identical to the stream _cdc_source_chunks_sql
reconstructs), so the file-based read path is value-hash-verified
against the same recursive-CTE gear-hash oracle as the tabular path.

At 100 TB: files ARE the natural shard unit; read_binary_files gives
one task per file and chunking never crosses a file boundary, so there
is no cross-stream state and no shuffle until the chunk-index groupby.
Multi-GB single files would want a block-ranged reader; the reference's
own corpora are file-per-document-collection shaped.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

from hmse_ray.config import Config, DEFAULT_CONFIG
from hmse_ray.functions import fastcdc


def write_corpus_files(sf_dir: str, root: str = "/tmp/hmse_corpus") -> str:
    """Materialize (once, atomically) per-source corpus text files from
    sf_dir's documents table; returns the corpus directory."""
    import duckdb

    key = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    d = os.path.join(root, key)
    marker = os.path.join(d, "_SUCCESS")
    if not os.path.exists(marker):
        tmp = d + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        con = duckdb.connect()
        rows = con.execute(
            "SELECT source, string_agg(text, '' ORDER BY doc_id) "
            f"FROM '{os.path.join(sf_dir, 'documents.parquet')}' GROUP BY source"
        ).fetchall()
        for src, stream in rows:
            with open(os.path.join(tmp, f"{src}.txt"), "w") as f:
                f.write(stream)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok")
        if os.path.exists(d):
            import shutil

            shutil.rmtree(d)
        os.replace(tmp, d)
    return d


def read_corpus(corpus_dir: str):
    """Raw corpus files -> Dataset of (source, bytes) stream rows."""
    import ray.data as rd

    paths = [
        os.path.join(corpus_dir, f)
        for f in sorted(os.listdir(corpus_dir))
        if f.endswith(".txt")
    ]
    return rd.read_binary_files(paths, include_paths=True)


def chunk_corpus(corpus_ds, cfg: Config = DEFAULT_CONFIG):
    """FastCDC over each file stream -> (source, chunk_idx, chunk_len,
    sha) rows — the file-based twin of the tabular cdc_source_chunks."""

    def chunk_file(t: pa.Table) -> pa.Table:
        o_src, o_idx, o_len, o_sha = [], [], [], []
        for path, data in zip(t["path"].to_pylist(), t["bytes"].to_pylist()):
            src = os.path.splitext(os.path.basename(path))[0]
            for idx, (off, ln) in enumerate(fastcdc.chunk_boundaries(data, cfg)):
                o_src.append(src)
                o_idx.append(idx)
                o_len.append(ln)
                o_sha.append(hashlib.sha256(data[off : off + ln]).hexdigest())
        return pa.table(
            {
                "source": pa.array(o_src, pa.string()),
                "chunk_idx": pa.array(o_idx, pa.int64()),
                "chunk_len": pa.array(o_len, pa.int64()),
                "sha": pa.array(o_sha, pa.string()),
            }
        )

    return corpus_ds.map_batches(chunk_file, batch_format="pyarrow")
