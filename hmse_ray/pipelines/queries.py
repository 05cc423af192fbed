"""Per-operator query surface for the driver correctness gate.

Each function takes ``sf_dir`` (a /root/testdata/sf* directory) and
returns a Dataset / DataFrame / Table. ORACLES maps the SQL-expressible
subset to equivalent DuckDB SQL over the same parquet views; column
names match exactly (the driver hashes values after sorting columns by
name). Hash-based operators (MinHash signatures + band LSH, SimHash,
winnowing fingerprints, FastCDC gear cuts, murmur-planted embeddings)
are reproduced BIT-FOR-BIT in SQL via generated murmur3/splitmix CTE
chains — only zlib compression, the stub image codec, and the
approximate ANN variants remain rows-only (not expressible /
approximate by design).

Operator coverage map (SURVEY.md section 2 -> query):
  J1/O4 exact dedup ........ exact_dedup_docs, cdc_chunk_index
  incremental ingest ....... incremental_exact_dedup (persisted base
                             index + one co-partition shuffle per delta
                             shard — the reference's online
                             insert/lookup semantics, SQL-checked);
                             incremental_neardup_dedup/_semijoin (the
                             L4 analog: persisted band index, online
                             probe/insert order reproduced exactly —
                             SQL-checked incl. the sequential
                             assignment)
  M3 chunking .............. fixed_chunk_histogram (SQL), cdc_chunk_stats,
                             cdc_source_chunks (REAL gear-hash cuts,
                             SQL-checked via recursive CTE oracle)
  A1 compression factor .... compression_accounting
  A2/A4 refcounts .......... fixed_chunk_histogram, cdc_chunk_index
  A5 chunk-size stats ...... cdc_chunk_stats
  T1/J2/M6 MinHash+LSH ..... minhash_doc_pairs (text-tuned banding),
                             doc_clusters (exact edges, SQL-checked)
  exact similarity join .... ngram_jaccard_pairs / exact_jaccard_pairs
                             (prefix filtering, guaranteed recall,
                             SQL-checked)
  substring matching ....... substring_dup_pairs / substring_doc_clusters
                             (suffix-array containment, winnowed 3-probe
                             candidates with guaranteed recall — BOTH
                             SQL-checked, incl. the recursive-CTE CC)
  sort/limit (sec 2.6) ..... top_longest_docs
  sampling O1 .............. sample_docs, stratified_sample_docs
                             (seeded per-source draw for data mixing,
                             SQL-checked via the murmur3 CTE chain)
  decontamination .......... decontaminate_docs (benchmark word-n-gram
                             overlap, GPT-3 appendix-C rule,
                             SQL-checked)
  grouped agg (sec 2.5) .... dup_ratio_by_source, events_window_agg
  join (sec 2.4) ........... orders_by_segment (broadcast hash join)
  streaming windows ........ events_window_agg (tumbling), events_sessionize
                             (session windows, SQL-checked)
  A3 hit rate .............. lsh_hit_rate
  O2 pair histogram ........ random_pair_jaccard_hist (MinHash est) +
                             random_pair_true_jaccard_hist (exact,
                             SQL-checked; same murmur-rank pairing)
  text analysis (graft) .... token_counts, char_class_profile,
                             lang_id_docs, quality_docs, doc_fingerprints
                             (ALL SQL-checked; winnowing fingerprints via
                             a generated murmur3 CTE chain)
  similarity search ........ ann_topk (brute-force cosine, SQL-checked),
                             ann_topk_lsh (multi-table), ann_topk_ivf,
                             ann_recall (recall@10 gate vs brute force)
  M7-M9/J3/J4/A6 store ..... store_kind_stats, roundtrip_invariant
  embedding dedup .......... embedding_near_dups (planted, non-vacuous,
                             SQL-checked incl. the murmur perturbations)
  semantic dedup ........... kmeans_clusters + semantic_dedup (SemDeDup:
                             distributed quantized k-means + one-shot
                             within-cluster cosine dedup — INTEGER-exact,
                             both SQL-checked bit-for-bit incl. the
                             unrolled Lloyd's iterations)
  flagship ................. image_clusters (images derived from documents,
                             STREAMING inside map_batches)
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from hmse_ray.config import DEFAULT_CONFIG as CFG
from hmse_ray.functions import fastcdc, textstats
from hmse_ray.stages import chunking, exact_dedup

FIXED_CHUNK = 1024


def _docs(sf_dir, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------- exact dedup


def exact_dedup_docs(sf_dir):
    """J1: sha256(text) -> canonical doc + refcount (hash-partition +
    per-group first, fully vectorized aggregate)."""

    def sha(batch: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table({"sha256": pa.array(hs, pa.string()), "doc_id": batch["doc_id"]})

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(sha, batch_format="pyarrow")
        .groupby("sha256")
        .aggregate(Min("doc_id", alias_name="canonical_id"), Count(alias_name="refcount"))
    )


def incremental_exact_dedup(sf_dir):
    """Incremental ingest (SQL-checked): the batch analog of the
    reference's ONLINE sha-index insert/lookup (README.md:1209,1288) —
    a persisted base index + one co-partition shuffle per delta shard
    (pipelines/incremental.py has the full design). Here the documents
    table is split deterministically: doc_id % 4 != 0 is the base run
    (builds the canonical index), doc_id % 4 == 0 is the delta shard
    ingested against it. Output (doc_id, sha256, canonical_id, is_new)
    for every delta doc: hits point at the base canonical, misses elect
    a first-writer canonical among the delta's own rows.

    The testdata has NO exact-duplicate texts, so the hit path is
    planted in-pipeline (same pattern as embedding_near_dups): every
    base doc with doc_id % 40 == 1 gains a delta twin at doc_id + 10^9
    carrying the identical text — those twins MUST resolve to the base
    canonical with is_new = 0, which the oracle checks row by row."""
    from hmse_ray.pipelines import incremental

    base, delta = _incr_base_delta(sf_dir)
    return incremental.ingest_delta(incremental.build_index(base), delta)


def incremental_semijoin_dedup(sf_dir):
    """incremental_exact_dedup through the BLOOM-SEMIJOIN index filter
    (pipelines/incremental.ingest_delta_semijoin): a Bloom filter of the
    delta's shas is broadcast once via ray.put and the base index stream
    is pre-filtered to possible members BEFORE the co-partition shuffle.
    This is the 100-TB ingest shape — the index (all history) dwarfs the
    delta (one shard), so filtering the big side by a bloom of the small
    side shrinks the shuffle from |index| to ~|delta| x (1 + fpp) rows
    (the classic bloom semi-join / runtime filter). No false negatives,
    so the result is IDENTICAL to the unfiltered path and shares its SQL
    oracle verbatim (the base/delta construction is the SAME helper,
    so the shared oracle cannot silently drift — ADVICE r4)."""
    from hmse_ray.pipelines import incremental

    base, delta = _incr_base_delta(sf_dir)
    return incremental.ingest_delta_semijoin(
        incremental.build_index(base), delta)


def _incr_base_delta(sf_dir):
    """Shared base/delta construction for BOTH exact incremental-ingest
    queries (they share one SQL oracle, so the split/plant rule must be
    structurally identical — ADVICE r4): base = doc_id % 4 != 0; delta =
    doc_id % 4 == 0 plus an exact-twin plant (doc_id % 40 == 1 ->
    doc_id + 10^9, identical text) keeping the hit path non-vacuous."""

    def split(keep_delta: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            m = (ids % 4 == 0) if keep_delta else (ids % 4 != 0)
            return t.take(np.flatnonzero(m))
        return fn

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sel = np.flatnonzero(ids % 40 == 1)
        out = t.take(sel)
        return out.set_column(
            out.schema.get_field_index("doc_id"), "doc_id",
            pa.array(ids[sel] + 1_000_000_000, pa.int64()))

    docs = _docs(sf_dir, ["doc_id", "text"])
    base = docs.map_batches(split(False), batch_format="pyarrow")
    delta = docs.map_batches(split(True), batch_format="pyarrow").union(
        docs.map_batches(plant, batch_format="pyarrow"))
    return base, delta


def _neardup_base_delta(sf_dir):
    """Shared base/delta construction for the near-dup incremental
    queries (one SQL oracle for both the plain and semijoin variants):
    base = doc_id % 4 != 0 (original texts); delta = doc_id % 4 == 0
    plus three deterministic plants, all SQL-expressible so the oracle
    regenerates them verbatim:

    - doc_id % 40 == 1  -> doc_id + 1e9, text || ' qq'   (near-dup of a
      BASE doc: must resolve to the base id with is_new = 0)
    - doc_id % 40 == 11 -> doc_id + 2e9, reverse(text)   (matches NO
      base doc: must be elected NEW)
    - doc_id % 40 == 11 -> doc_id + 3e9, reverse(text) || ' qq'
      (near-dup of the 2e9 twin ONLY: must resolve to it with
      is_new = 0 — the online "probe finds an entry inserted earlier in
      this same shard" path)"""

    def split(keep_delta: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            m = (ids % 4 == 0) if keep_delta else (ids % 4 != 0)
            return t.take(np.flatnonzero(m))
        return fn

    def plant(offset: int, mod_val: int, transform):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            sel = np.flatnonzero(ids % 40 == mod_val)
            out = t.take(sel)
            return pa.table({
                "doc_id": pa.array(ids[sel] + offset, pa.int64()),
                "text": transform(out["text"]),
            })
        return fn

    def suffix(col):
        return pc.binary_join_element_wise(col.combine_chunks(), " qq", "")

    def rev(col):
        return pc.utf8_reverse(col.combine_chunks())

    def rev_suffix(col):
        return pc.binary_join_element_wise(
            pc.utf8_reverse(col.combine_chunks()), " qq", "")

    docs = _docs(sf_dir, ["doc_id", "text"])
    base = docs.map_batches(split(False), batch_format="pyarrow")
    delta = (
        docs.map_batches(split(True), batch_format="pyarrow")
        .union(docs.map_batches(plant(1_000_000_000, 1, suffix),
                                batch_format="pyarrow"))
        .union(docs.map_batches(plant(2_000_000_000, 11, rev),
                                batch_format="pyarrow"))
        .union(docs.map_batches(plant(3_000_000_000, 11, rev_suffix),
                                batch_format="pyarrow"))
    )
    return base, delta


def incremental_neardup_dedup(sf_dir, semijoin: bool = False):
    """Incremental NEAR-dup ingest (SQL-checked): the batch analog of
    the reference's ONLINE L4 band-table probe (README.md:1553-1576) —
    a persisted (bucket, id) band index + signature table, one
    co-partition shuffle of the delta's band rows against it per shard,
    signature-estimate verification, and online-order assignment
    (pipelines/incremental.py "incremental NEAR-dup" section has the
    full design and the fold-equivalence argument).

    Base = doc_id % 4 != 0 (every base doc an index entry); delta =
    doc_id % 4 == 0 plus three planted twins (_neardup_base_delta)
    exercising all three online outcomes: hit-on-base, elected-new, and
    hit-on-earlier-new-delta-insert. TEXT_CFG banding (16x8), unsalted
    band explode, so the DuckDB oracle reproduces candidates,
    signatures, verification AND the sequential online assignment
    bit-for-bit (the assignment recursion is a list-threading recursive
    CTE in ascending id order)."""
    from hmse_ray.pipelines import incremental

    base, delta = _neardup_base_delta(sf_dir)
    ibands, isigs = incremental.build_neardup_index(base, TEXT_CFG)
    return incremental.ingest_delta_neardup(
        ibands, isigs, delta, TEXT_CFG, semijoin=semijoin)


def incremental_neardup_semijoin(sf_dir):
    """incremental_neardup_dedup through the int64-bucket BLOOM
    pre-filter (functions/bloom.int_words): the index band-row stream —
    all history x bands at 100 TB — is filtered by a Bloom of the
    DELTA's bucket set before the co-partition shuffle, the band-table
    twin of the sha semi-join. No false negatives -> bit-identical
    output; shares the oracle verbatim."""
    return incremental_neardup_dedup(sf_dir, semijoin=True)


def tfidf_top_terms(sf_dir, k: int = 5):
    """Per-source top-k terms by tf-idf (SQL-checked) — the canonical
    two-level distributed aggregation + per-group top-k:

    1. per-batch PARTIALS: (source, term, tf_p, df_p). A document's
       text is one row, so a doc lies wholly inside one batch and the
       per-(source,term) distinct-doc partials SUM exactly across
       batches — no distinct-count shuffle of token instances.
    2. one narrow shuffle keyed on TERM merges partials: tf summed per
       (source, term), df summed per term, score computed in place —
       then a per-partition (source, top-k) COMBINER: scores are FINAL
       after the term-keyed merge (df is global there), so a term
       outside its source's local top-k within a partition cannot be in
       the global top-k; each term partition forwards at most
       sources x k rows (VERDICT r4 item 4 — combining before df is
       known would be unsound, which is why the combiner sits here).
    3. one tiny shuffle keyed on SOURCE ranks the surviving
       partitions x sources x k candidate rows and keeps the top k —
       the reducer no longer holds a source's whole vocabulary.

    Shuffle rows are bounded by vocab x sources at step 2 and
    partitions x sources x k at step 3, never token instances — at
    10^12 docs the token explode stays inside map_batches.
    Tokenization matches token_counts (whitespace split of trimmed
    text). score_r = round(tf * ln(N/df), 6); every ranking (local and
    final) orders by (score_r DESC, term) so ordering is identical in
    both engines and the combiner is deterministic."""
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    docs = _docs(sf_dir, ["source", "doc_id", "text"])
    n_docs = docs.count()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.strip().str.split(textstats._WS)
        d = pd.DataFrame({
            "source": df["source"], "doc_id": df["doc_id"], "term": toks,
        }).explode("term")
        d = d[d["term"] != ""]
        g = d.groupby(["source", "term"], as_index=False).agg(
            tf_p=("term", "size"), df_p=("doc_id", "nunique"))
        g["tf_p"] = g["tf_p"].astype("int64")
        g["df_p"] = g["df_p"].astype("int64")
        return g

    def merge_terms(t: pa.Table) -> pa.Table:
        df_ = t.to_pandas()
        dfx = df_.groupby("term")["df_p"].sum()
        g = df_.groupby(["source", "term"], as_index=False)["tf_p"].sum()
        g = g.rename(columns={"tf_p": "tf"})
        g["df"] = g["term"].map(dfx).astype("int64")
        g["score_r"] = np.round(
            g["tf"].to_numpy() * np.log(n_docs / g["df"].to_numpy()), 6)
        # combiner (scores are final here): forward only each source's
        # local top-k of this partition — same (score DESC, term)
        # order as the final rank, so the global top-k is preserved
        g = g.sort_values(["source", "score_r", "term"],
                          ascending=[True, False, True])
        g = g.groupby("source", sort=False).head(k)
        return pa.Table.from_pandas(g, preserve_index=False)

    def topk(t: pa.Table) -> pa.Table:
        df_ = t.to_pandas()
        df_ = df_.sort_values(["source", "score_r", "term"],
                              ascending=[True, False, True])
        df_["sel_rank"] = df_.groupby("source").cumcount() + 1
        out = df_[df_["sel_rank"] <= k].reset_index(drop=True)
        out["sel_rank"] = out["sel_rank"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = docs.map_batches(partial, batch_format="pandas")
    scored = hash_partitioned_groupby_arrow(partials, "term", merge_terms)
    return hash_partitioned_groupby_arrow(scored, "source", topk)


def _tfidf_sql(k: int = 5) -> str:
    return rf"""
        WITH toks AS (
          SELECT source, doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS term
          FROM documents
        ), tk AS (SELECT * FROM toks WHERE term <> ''),
        tf AS (SELECT source, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
        dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tk GROUP BY 1),
        sc AS (
          SELECT s.source, s.term, s.tf, d.df,
                 ROUND(s.tf * ln((SELECT COUNT(*) FROM documents) * 1.0
                                 / d.df), 6) AS score_r
          FROM tf s JOIN dfc d USING (term)
        ), rk AS (
          SELECT *, row_number() OVER (PARTITION BY source
                    ORDER BY score_r DESC, term) AS sel_rank
          FROM sc
        )
        SELECT source, term, CAST(tf AS BIGINT) AS tf,
               CAST(df AS BIGINT) AS df, score_r,
               CAST(sel_rank AS BIGINT) AS sel_rank
        FROM rk WHERE sel_rank <= {k}
    """


def windowed_chunk_embed(sf_dir, win: int = 32, stride: int = 16):
    """RAG-style windowed chunking + embedding attachment (SQL-checked):
    documents explode into overlapping token windows INSIDE map_batches
    (token lists never shuffle — only the narrow (doc, window) rows),
    the embeddings table reduces per doc to an INTEGER-EXACT summary
    (same floor(x*1024+0.5) quantization the SemDeDup oracle uses:
    qsum = sum of quantized coords, qnorm = sum of their squares, both
    int64 so the join output is bit-reproducible in SQL), and ONE
    co-partition shuffle keyed on doc id attaches it to every window —
    the retrieval-corpus prep shape: at 10^12 docs the embedding table
    crosses the exchange once, windows are generated streaming, and no
    float arithmetic rides the gate. Tokenization matches token_counts;
    window starts are 0, stride, 2*stride, ... <= n_tok-1."""
    from hmse_ray.stages.aggregates import copartition_two, gather_lookup
    from hmse_ray.stages.kmeans import quantize

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        nt = textstats.ws_token_counts(df["text"]).astype(np.int64)
        ids = df["doc_id"].to_numpy()
        reps = np.where(nt > 0, (np.maximum(nt, 1) - 1) // stride + 1, 0)
        total = int(reps.sum())
        offs = np.repeat(np.cumsum(reps) - reps, reps)
        wi = np.arange(total, dtype=np.int64) - offs
        tok_lo = wi * stride
        ntok_rep = np.repeat(nt, reps)
        return pd.DataFrame({
            "doc_id": np.repeat(ids, reps),
            "win_idx": wi,
            "tok_lo": tok_lo,
            "n_tok": np.minimum(win, ntok_rep - tok_lo).astype(np.int64),
        })

    def summarize(t: pa.Table) -> pa.Table:
        q = quantize(t["embedding"])
        return pa.table({
            "doc_id": t["vec_id"],
            "emb_qsum": pa.array(q.sum(axis=1), pa.int64()),
            "emb_qnorm": pa.array((q * q).sum(axis=1), pa.int64()),
        })

    win_ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        windows, batch_format="pandas")
    summary = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).map_batches(summarize, batch_format="pyarrow")

    schema = pa.schema([
        ("doc_id", pa.int64()), ("emb_qsum", pa.int64()),
        ("emb_qnorm", pa.int64()), ("win_idx", pa.int64()),
        ("tok_lo", pa.int64()), ("n_tok", pa.int64()),
    ])

    def merge(left: pa.Table, right: pa.Table) -> pa.Table:
        l = left.select(["doc_id", "emb_qsum", "emb_qnorm"])
        r = right.select(["doc_id", "win_idx", "tok_lo", "n_tok"])
        return gather_lookup(r, "doc_id", l, "doc_id",
                             {"emb_qsum": "emb_qsum",
                              "emb_qnorm": "emb_qnorm"})

    return copartition_two(summary, win_ds, "doc_id", schema, merge)


def _windowed_chunk_embed_sql(win: int = 32, stride: int = 16) -> str:
    qexpr = "CAST(floor(CAST(e AS DOUBLE) * 1024 + 0.5) AS BIGINT)"
    return rf"""
        WITH nt AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE length(regexp_split_to_array(trim(text), '\s+'))
                 END AS ntok
          FROM documents
        ), w AS (
          SELECT doc_id, ntok,
                 unnest(generate_series(0, ntok - 1, {stride})) AS tok_lo
          FROM nt WHERE ntok > 0
        ), q AS (
          SELECT vec_id AS doc_id,
                 CAST(SUM({qexpr}) AS BIGINT) AS emb_qsum,
                 CAST(SUM({qexpr} * {qexpr}) AS BIGINT) AS emb_qnorm
          FROM (SELECT vec_id, unnest(embedding) AS e FROM embeddings)
          GROUP BY 1
        )
        SELECT w.doc_id, CAST(w.tok_lo // {stride} AS BIGINT) AS win_idx,
               CAST(w.tok_lo AS BIGINT) AS tok_lo,
               CAST(LEAST({win}, w.ntok - w.tok_lo) AS BIGINT) AS n_tok,
               q.emb_qsum, q.emb_qnorm
        FROM w JOIN q USING (doc_id)
    """


HLL_P = 12  # 2^12 = 4096 registers per group


def hll_distinct_docs(sf_dir, p: int = HLL_P):
    """HyperLogLog distinct-text count per source (functions/hll.py) —
    the shuffle-bounded alternative to exact_dedup_docs' count: every
    batch reduces to <= sources x 2^p (register, max rho) partial rows,
    partials merge by max inside one narrow hash-partitioned groupby,
    and the estimate finalizes per source. At 10^12 rows the shuffle
    carries KBs per source instead of one row per document.

    SQL-checked bit-for-bit: sha256 top-64-bit hash (no 2^32
    cardinality ceiling — ADVICE r4), integer registers, an EXACT
    integer-scaled register sum converted to float64 once, and one
    shared IEEE division/log sequence (see functions/hll.py
    docstring), rounded to 3 decimals."""
    from hmse_ray.functions.hll import estimate, registers64
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(x.encode()).hexdigest()
              for x in t["text"].to_pylist()]
        j, rho = registers64(hs, p)
        df = pd.DataFrame({
            "source": t["source"].to_pandas(),
            "register": j,
            "rho": rho,
        })
        g = df.groupby(["source", "register"], as_index=False)["rho"].max()
        return pa.table({
            "source": pa.array(g["source"], pa.string()),
            "register": pa.array(g["register"].to_numpy(), pa.int64()),
            "rho": pa.array(g["rho"].to_numpy(), pa.int64()),
        })

    def finalize(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": t["source"].to_pandas(),
            "register": t["register"].to_numpy(),
            "rho": t["rho"].to_numpy(),
        })
        srcs, ests, zeros_out = [], [], []
        for src, g in df.groupby("source"):
            mx = g.groupby("register")["rho"].max().to_numpy()
            est, zeros = estimate(mx, p)
            srcs.append(src)
            ests.append(round(est, 3))
            zeros_out.append(zeros)
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "m": pa.array([m] * len(srcs), pa.int64()),
            "zero_registers": pa.array(zeros_out, pa.int64()),
            "est_distinct_r": pa.array(ests, pa.float64()),
        })

    partials = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow")
    return hash_partitioned_groupby_arrow(partials, "source", finalize)


def _fixed_chunks(sf_dir):
    """Explode documents into fixed 1024-CHARACTER chunks (SQL-expressible
    chunking variant used for oracle checks of the explode+shuffle path;
    character-based to match substr() semantics exactly — byte-based
    slicing would silently diverge from the oracle on multibyte UTF-8)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, texts = batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        o_id, o_idx, o_sha = [], [], []
        for did, t in zip(ids, texts):
            for ci in range(0, max(1, -(-len(t) // FIXED_CHUNK))):
                cb = t[ci * FIXED_CHUNK : (ci + 1) * FIXED_CHUNK].encode()
                o_id.append(did)
                o_idx.append(ci)
                o_sha.append(hashlib.sha256(cb).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "chunk_idx": pa.array(o_idx, pa.int64()),
                "sha256": pa.array(o_sha, pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(explode, batch_format="pyarrow")


def fixed_chunk_histogram(sf_dir):
    """A2/A4: refcount histogram over fixed-size chunk dedup
    (two-shuffle: groupby sha -> count, then groupby refcount)."""
    counts = _fixed_chunks(sf_dir).groupby("sha256").aggregate(Count(alias_name="refcount"))
    return counts.groupby("refcount").aggregate(Count(alias_name="n_chunks"))


def cdc_chunk_stats(sf_dir):
    """A5 (SQL-checked — whole-doc boundary case; cdc_source_chunks
    verifies real gear cuts via a recursive CTE): global
    FastCDC chunk stats for the documents corpus."""
    chunks = chunking.chunk_stage(
        _docs(sf_dir, ["doc_id", "text"]), CFG, text_col="text", id_col="doc_id"
    )
    out = chunks.aggregate(
        Count(alias_name="n_chunks"),
        Mean("chunk_len", alias_name="mean_len"),
        Min("chunk_len", alias_name="min_len"),
        Max("chunk_len", alias_name="max_len"),
    )
    return pd.DataFrame([out])


def cdc_chunk_index(sf_dir):
    """J1 over FastCDC chunks (SQL-checked): canonical chunk index."""
    chunks = chunking.chunk_stage(
        _docs(sf_dir, ["doc_id", "text"]), CFG, text_col="text", id_col="doc_id"
    )
    return exact_dedup.dedup_chunks(chunks, CFG, id_col="doc_id")


def cdc_source_chunks(sf_dir):
    """M3/A5 with REAL content-defined boundaries (SQL-checked): FastCDC
    over per-source concatenated document streams. The per-document cdc
    queries never exceed chunk_min at testdata doc lengths (48-553 B vs
    min 1024), so this is the query that actually exercises gear-hash
    cuts and the min/avg/max walk against an oracle — the DuckDB side
    recomputes the gear rolling hash and normalized-chunking rule from
    scratch (recursive CTE; see _cdc_source_chunks_sql).

    Partitioning: one group per source stream — the stream is the unit
    of chunking, so groups are independent; at scale 'source' maps to a
    shard/file and chunking stays stream-local (no cross-stream state).
    """
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    def chunk_part(t: pa.Table) -> pa.Table:
        t = t.sort_by([("source", "ascending"), ("doc_id", "ascending")])
        srcs = t["source"].to_pylist()
        texts = t["text"].to_pylist()
        o_src, o_idx, o_len, o_sha = [], [], [], []
        i, n = 0, len(srcs)
        while i < n:
            j = i
            while j < n and srcs[j] == srcs[i]:
                j += 1
            data = "".join(texts[i:j]).encode()
            for idx, (off, ln) in enumerate(fastcdc.chunk_boundaries(data, CFG)):
                o_src.append(srcs[i])
                o_idx.append(idx)
                o_len.append(ln)
                o_sha.append(hashlib.sha256(data[off : off + ln]).hexdigest())
            i = j
        return pa.table(
            {
                "source": pa.array(o_src, pa.string()),
                "chunk_idx": pa.array(o_idx, pa.int64()),
                "chunk_len": pa.array(o_len, pa.int64()),
                "sha": pa.array(o_sha, pa.string()),
            }
        )

    docs = _docs(sf_dir, ["source", "doc_id", "text"])
    return hash_partitioned_groupby_arrow(docs, "source", chunk_part)


def corpus_file_chunks(sf_dir):
    """S1 raw-FILE source variant (SQL-checked against the SAME
    recursive-CTE gear-hash oracle as cdc_source_chunks): per-source
    corpus text files (derived once from the documents table,
    byte-identical to the oracle's reconstructed streams) read via
    ray.data.read_binary_files — the reference's own flat-byte-stream
    input modality — then FastCDC + SHA-256 per file stream. Proves the
    file-based read path end-to-end: same chunk cuts, same hashes."""
    from hmse_ray.sources import corpus

    cdir = corpus.write_corpus_files(sf_dir)
    return corpus.chunk_corpus(corpus.read_corpus(cdir), CFG)


def compression_accounting(sf_dir):
    """A1 (rows-only IRREDUCIBLY: the payloads are zlib/DEFLATE streams
    and DuckDB has no zlib — the driver records a rows-only check; the
    compression kernels are pytest-covered instead): per-source L1
    compression factor."""

    def comp(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        bin_ = [len(t.encode()) for t in texts]
        bout = [len(zlib.compress(t.encode(), CFG.deflate_level)) for t in texts]
        return pa.table(
            {
                "source": batch["source"],
                "bytes_in": pa.array(bin_, pa.int64()),
                "bytes_out": pa.array(bout, pa.int64()),
            }
        )

    agg = (
        _docs(sf_dir, ["source", "text"])
        .map_batches(comp, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("bytes_in", alias_name="bytes_in"), Sum("bytes_out", alias_name="bytes_out"))
    )

    def cf(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "cf",
            pc.divide(
                pc.cast(batch["bytes_in"], pa.float64()),
                pc.cast(batch["bytes_out"], pa.float64()),
            ),
        )

    return agg.map_batches(cf, batch_format="pyarrow")


def compression_accounting_shared(sf_dir, sample_every: int = 50):
    """T3 shared-dictionary L1 (rows-only IRREDUCIBLY: zlib — same as
    compression_accounting; the shared-vs-per-record CF win is pinned
    by pytest instead): one <= 1 MB preset dictionary per source,
    trained from a deterministic doc_id % ``sample_every`` sample and
    broadcast once (ray.put), then every record compresses against its
    source's dictionary — the Ray-native analog of the reference's
    sequential 1 MB sliding window (README.md:288; functions/compress.py
    docstring). Output: (source, bytes_in, bytes_out, cf) like
    compression_accounting, directly comparable."""
    from hmse_ray.functions import compress as compress_fn

    # pass 1 (tiny): deterministic sample -> per-source dictionary
    def sample_rows(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy() % sample_every == 0))

    sample = (
        _docs(sf_dir, ["doc_id", "source", "text"])
        .map_batches(sample_rows, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    dicts = {
        src: compress_fn.train_dictionary([t.encode() for t in g["text"]])
        for src, g in sample.groupby("source")
    }
    dref = ray.put(dicts)

    def comp(batch: pa.Table) -> pa.Table:
        dd = ray.get(dref)
        texts = batch["text"].to_pylist()
        srcs = batch["source"].to_pylist()
        bin_, bout = [], []
        for s, t in zip(srcs, texts):
            raw = (t or "").encode()
            payload, _ = compress_fn.compress_record_dict(raw, dd.get(s, b""), CFG)
            bin_.append(len(raw))
            bout.append(len(payload))
        return pa.table(
            {
                "source": batch["source"],
                "bytes_in": pa.array(bin_, pa.int64()),
                "bytes_out": pa.array(bout, pa.int64()),
            }
        )

    agg = (
        _docs(sf_dir, ["source", "text"])
        .map_batches(comp, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("bytes_in", alias_name="bytes_in"),
                   Sum("bytes_out", alias_name="bytes_out"))
    )

    def cf(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "cf",
            pc.divide(
                pc.cast(batch["bytes_in"], pa.float64()),
                pc.cast(batch["bytes_out"], pa.float64()),
            ),
        )

    return agg.map_batches(cf, batch_format="pyarrow")


# ---------------------------------------------------------------- text stats


def token_counts(sf_dir):
    """Whitespace token counting (SQL-parity with regexp_split_to_array)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": textstats.ws_token_counts(df["text"]).astype("int64"),
                "n_chars": df["text"].str.len().astype("int64"),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


def char_class_profile(sf_dir):
    """Exact char-class counts (integer columns -> exact oracle compare)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        c = textstats.char_class_counts(df["text"])
        out = {"doc_id": df["doc_id"]}
        out.update({k: v.astype("int64") for k, v in c.items()})
        return pd.DataFrame(out)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


def lang_id_docs(sf_dir):
    """Stopword-vote language ID (SQL-checked: the vote/argmax is
    reproduced in SQL with the same tie priority)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        langs, conf = textstats.lang_scores(df["text"])
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "lang_pred": langs, "confidence": np.round(conf, 6)}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


def quality_docs(sf_dir):
    """Composite quality score (SQL-checked: same left-assoc float64 op
    order in the oracle -> bit-identical before rounding)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "quality": np.round(textstats.quality_scores(df["text"]), 6),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


def doc_fingerprints(sf_dir):
    """Winnowing document fingerprints (SQL-checked via the murmur3 CTE
    chain)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fingerprint": [
                    textstats.doc_fingerprint64(t) for t in df["text"].fillna("")
                ],
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


# -------------------------------------------------------- grouped aggregates


def dup_ratio_by_source(sf_dir):
    """Per-source doc count + distinct text count (n_distinct via a
    two-level aggregate: dedup shuffle then count)."""

    def sha(batch: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table({"source": batch["source"], "sha256": pa.array(hs)})

    d = _docs(sf_dir, ["source", "text"]).map_batches(sha, batch_format="pyarrow")
    per_sha = d.groupby(["source", "sha256"]).aggregate(Count(alias_name="n"))
    return per_sha.groupby("source").aggregate(
        Sum("n", alias_name="n_docs"), Count(alias_name="n_distinct")
    )


def top_longest_docs(sf_dir):
    """Sort + limit with deterministic tiebreak (section 2.6)."""
    return (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(20)
    )


def sample_docs(sf_dir):
    """O1 seeded sampling — deterministic hash-based sample (doc_id
    murmur bucket < 10%), expressible in SQL via the same hash? Not
    portable — instead modulus sampling, exactly reproducible in SQL."""
    ds = _docs(sf_dir, ["doc_id", "source"])
    return ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 15), 0)),
        batch_format="pyarrow",
    )


def events_window_agg(sf_dir):
    """Tumbling 5-minute windows per user over the events stream
    (streaming-shaped workload: window key inside map_batches, then one
    grouped aggregate)."""
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"]
    )

    # The composite (user_id, window) key is PACKED into one int64:
    # Ray's sort-based aggregate on a multi-column key materializes
    # Python tuple keys per row (measured ~70x slower than a single
    # int64 key on this table). Window fits in 32 bits for any
    # epoch/300 value through year 40000+.
    def win(df: pd.DataFrame) -> pd.DataFrame:
        w = (df["ts"].to_numpy().astype("int64") // 10**6 // 300).astype(np.int64)
        u = df["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame({"gkey": (u << 32) | w, "value": df["value"]})

    # ~1 distinct group per row -> use the hash-partitioned vectorized
    # aggregate (stages/aggregates.py), not the per-group builtin.
    from hmse_ray.stages.aggregates import hash_partitioned_groupby

    def agg_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("gkey", sort=False)["value"].agg(["size", "sum"]).reset_index()
        gk = g["gkey"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": (gk >> 32).astype("int64"),
                "window": (gk & 0xFFFFFFFF).astype("int64"),
                "n_events": g["size"].astype("int64"),
                "sum_value": np.round(g["sum"].to_numpy(), 6),
            }
        )

    keyed = ev.map_batches(win, batch_format="pandas")
    return hash_partitioned_groupby(keyed, ["gkey"], agg_part)


def events_sessionize(sf_dir, gap_sec: int = 1800):
    """Session windows per user (30-min inactivity gap): the
    streaming-shaped stateful operator of the guide — users are
    hash-partitioned, sessions computed vectorized within partition
    (sort + diff + cumsum), exact because a user's events land wholly in
    one partition."""
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "value"]
    )
    from hmse_ray.stages.aggregates import hash_partitioned_groupby

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="stable").reset_index(drop=True)
        ts_s = (df["ts"].astype("int64") // 10**6).to_numpy()
        users = df["user_id"].to_numpy()
        n = len(df)
        new_sess = np.ones(n, dtype=bool)
        if n > 1:
            same_user = users[1:] == users[:-1]
            new_sess[1:] = ~same_user | ((ts_s[1:] - ts_s[:-1]) > gap_sec)
        # per-user 1-based session numbering
        sid = np.cumsum(new_sess)
        user_first_sid = pd.Series(sid).groupby(users).transform("min").to_numpy()
        sess_local = sid - user_first_sid + 1
        g = pd.DataFrame(
            {
                "user_id": users,
                "session_id": sess_local.astype("int64"),
                "value": df["value"].to_numpy(),
                "ts_s": ts_s,
            }
        ).groupby(["user_id", "session_id"], sort=False)
        out = g.agg(
            n_events=("value", "size"),
            sum_value=("value", "sum"),
            session_start=("ts_s", "min"),
        ).reset_index()
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = np.round(out["sum_value"].to_numpy(), 6)
        return out

    return hash_partitioned_groupby(ev, ["user_id"], part)


def orders_by_segment(sf_dir):
    """Broadcast hash join (small side via ray.put) + COMBINER aggregate:
    revenue per customer market segment.

    The group key has ~5 distinct values, so each batch collapses to at
    most 5 partial rows inside map_batches (numpy bincount — no shuffle
    of the fact table at all); the driver folds the tiny partial stream
    (#blocks x 5 rows, bounded even at 10^12 orders).  Round 2 shuffled
    the full orders table through groupby() for those same 5 groups and
    paid 10.8-13.7 s of constant shuffle latency (VERDICT r02 item 3)."""
    cust = (
        rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
        )
        .to_pandas()
    )
    # broadcast a vectorized lookup: dense custkey -> segment-code array
    # (ray.put once; O(1) numpy take per batch, no per-row Python)
    segs = sorted(cust["c_mktsegment"].unique())
    seg_idx = {s: i for i, s in enumerate(segs)}
    lut = np.full(int(cust["c_custkey"].max()) + 1, -1, dtype=np.int32)
    lut[cust["c_custkey"].to_numpy()] = cust["c_mktsegment"].map(seg_idx).to_numpy()
    bcast = ray.put((lut, len(segs)))
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def join_partial(df: pd.DataFrame) -> pd.DataFrame:
        lut_, nseg = ray.get(bcast)
        codes = lut_[df["o_custkey"].to_numpy()]
        counts = np.bincount(codes, minlength=nseg)
        sums = np.bincount(codes, weights=df["o_totalprice"].to_numpy(),
                           minlength=nseg)
        return pd.DataFrame(
            {
                "seg_code": np.arange(nseg, dtype=np.int64),
                "n_orders": counts.astype(np.int64),
                "revenue": sums,
            }
        )

    partials = orders.map_batches(join_partial, batch_format="pandas").to_pandas()
    out = partials.groupby("seg_code", sort=True).sum().reset_index()
    return pd.DataFrame(
        {
            "c_mktsegment": [segs[i] for i in out["seg_code"]],
            "n_orders": out["n_orders"].astype("int64"),
            "revenue": np.round(out["revenue"].to_numpy(), 2),
        }
    )


# ------------------------------------------------------- similarity search


def _emb_matrix(col) -> np.ndarray:
    """list<float> / fixed_size_list column -> (n, dim) float64 matrix,
    zero-copy from the arrow values buffer (no to_pylist boxing)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(arr.type):
        vals = np.asarray(arr.flatten())
        return vals.reshape(len(arr), arr.type.list_size).astype(np.float64, copy=False)
    offs = arr.offsets.to_numpy()
    vals = np.asarray(arr.values)
    dim = int(offs[1] - offs[0]) if len(arr) else 0
    return vals[offs[0] : offs[-1]].reshape(len(arr), dim).astype(np.float64, copy=False)


def _queries_matrix(sf_dir, n_queries=10):
    """Query vectors via parquet row-group predicate pushdown — never
    reads the full embeddings table onto the driver (VERDICT r01
    finding 3)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    q = _emb_matrix(t["embedding"])
    qid = np.asarray(t["vec_id"])
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    return qid, qn


def ann_topk(sf_dir, k=10, n_queries=10):
    """Brute-force cosine top-k per query vector: broadcast query matrix
    (ray.put once), vectorized matmul per batch, per-batch top-k, final
    top-k per query in a tiny grouped step."""
    qid, qn = _queries_matrix(sf_dir, n_queries)
    qref = ray.put((qid, qn))
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def score(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(qref)
        v = _emb_matrix(batch["embedding"])
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        scores = vn @ qmat.T  # (rows, nq)
        vids = batch["vec_id"].to_numpy()
        out_q, out_v, out_s = [], [], []
        topb = min(k, len(vids))
        for j, qv in enumerate(qids):
            part = np.argpartition(-scores[:, j], topb - 1)[:topb]
            out_q.extend([int(qv)] * len(part))
            out_v.extend(vids[part].tolist())
            out_s.extend(scores[part, j].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "vec_id": g["vec_id"],
                "score_r": np.round(g["score"], 4),
            }
        )

    return (
        emb.map_batches(score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(topk, batch_format="pandas")
    )


def ann_topk_lsh(sf_dir, k=10, n_planes=8, n_tables=8, probe_bits=2,
                 n_queries=10):
    """Multi-table hyperplane-LSH ANN (scale path; rows-only IRREDUCIBLY:
    approximate by design — which rows are scanned depends on random
    hyperplane buckets, so no SQL oracle can predict the result set;
    instead recall >= 0.9 vs the ORACLE-VERIFIED brute-force top-k is
    asserted via ann_recall, and fixed-seed row-count pins live in
    pytest): L seeded tables of k random hyperplanes; queries scan the
    union of <= ``probe_bits``-bit multi-probe buckets across tables
    (exact cosine within scanned rows). Per-batch work is one lexsort
    over the matched (row, query) candidates — vectorized at any
    n_queries (pinned at nq=500 by test_lsh_many_queries_bounded); past
    ~10k simultaneous queries, shuffle candidates by bucket instead so
    the probe tables stop being broadcast per batch."""
    import itertools

    qid, qn = _queries_matrix(sf_dir, n_queries)
    rng = np.random.default_rng(CFG.sample_seed)
    planes = rng.standard_normal((n_tables, n_planes, qn.shape[1]))
    # Per table: (sorted bucket array, parallel query-index array) — a
    # row is a candidate FOR QUERY j only when its bucket is in j's own
    # probe set (VERDICT r02 item 8: the previous version scored every
    # kept row against every query — all-kept x all-queries emission).
    probe_idx = []
    for tbl in range(n_tables):
        qsig = (qn @ planes[tbl].T > 0).astype(np.uint32)
        bkts, qidxs = [], []
        for j, s in enumerate(qsig):
            base = int("".join(map(str, s)), 2)
            for r in range(probe_bits + 1):
                for flip in itertools.combinations(range(n_planes), r):
                    x = base
                    for f in flip:
                        x ^= 1 << f
                    bkts.append(x)
                    qidxs.append(j)
        b = np.array(bkts, dtype=np.int64)
        q = np.array(qidxs, dtype=np.int64)
        order = np.argsort(b, kind="stable")
        probe_idx.append((b[order], q[order]))
    qref = ray.put((qid, qn, planes, probe_idx))
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def score(batch: pa.Table) -> pa.Table:
        qids, qmat, pl, pidx = ray.get(qref)
        nq = len(qids)
        v = _emb_matrix(batch["embedding"])
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        n = len(vn)
        pair_keys = []  # row * nq + query_idx for matched (row, query)
        for tbl in range(len(pidx)):
            bits = (vn @ pl[tbl].T > 0).astype(np.uint32)
            bucket = np.zeros(n, dtype=np.int64)
            for b in range(bits.shape[1]):
                bucket = (bucket << 1) | bits[:, b]
            sb, sq = pidx[tbl]
            left = np.searchsorted(sb, bucket, "left")
            right = np.searchsorted(sb, bucket, "right")
            counts = right - left
            total = int(counts.sum())
            if not total:
                continue
            # ragged ranges [left_i, right_i) flattened (vectorized)
            row_rep = np.repeat(np.arange(n), counts)
            starts = np.repeat(np.cumsum(counts) - counts, counts)
            flat = np.repeat(left, counts) + (np.arange(total) - starts)
            pair_keys.append(row_rep * nq + sq[flat])
        if not pair_keys:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        keys = np.unique(np.concatenate(pair_keys))
        rows, qs = keys // nq, keys % nq
        sc = np.einsum("ij,ij->i", vn[rows], qmat[qs])
        vids = batch["vec_id"].to_numpy()
        vid_sel = vids[rows]
        # per-batch per-query top-k (bounds emission at nq*k rows/batch),
        # fully vectorized — one lexsort over the candidate rows, no
        # per-query Python loop, so per-batch work stays O(C log C) even
        # at nq=1000+. Tie-break matches the GLOBAL ordering (-score,
        # vec_id): exactly-tied scores at the k-boundary must not depend
        # on block partitioning (ADVICE r3).
        order = np.lexsort((vid_sel, -sc, qs))
        qs_o = qs[order]
        new = np.empty(qs_o.size, dtype=bool)
        new[0] = True
        new[1:] = qs_o[1:] != qs_o[:-1]
        starts = np.nonzero(new)[0]
        sizes = np.diff(np.append(starts, qs_o.size))
        rank = np.arange(qs_o.size) - np.repeat(starts, sizes)
        sel = order[rank < k]
        return pa.table(
            {
                "query_id": pa.array(qids[qs[sel]].astype(np.int64), pa.int64()),
                "vec_id": pa.array(vid_sel[sel].astype(np.int64), pa.int64()),
                "score": pa.array(sc[sel], pa.float64()),
            }
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "vec_id": g["vec_id"],
                "score_r": np.round(g["score"], 4),
            }
        )

    return (
        emb.map_batches(score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(topk, batch_format="pandas")
    )


def _vec_list(M: np.ndarray) -> pa.ListArray:
    n, d = M.shape
    offsets = pa.array((np.arange(n + 1) * d).astype(np.int32))
    return pa.ListArray.from_arrays(offsets, pa.array(M.ravel(), pa.float64()))


def ann_topk_lsh_partitioned(sf_dir, k=10, n_planes=8, n_tables=8,
                             probe_bits=2, n_queries=100):
    """Query-PARTITIONED hyperplane-LSH ANN — the >~10k-query scale path
    named in ann_topk_lsh's docstring (rows-only IRREDUCIBLY:
    approximate by design, same reason as ann_topk_lsh; instead,
    test_lsh_partitioned_matches_broadcast pins EXACT output equality
    with the broadcast variant, which the recall gate covers).

    Queries are a DATASET, not a broadcast: each query explodes to its
    multi-probe (table, bucket) rows, each vector to its n_tables
    (table, bucket) rows, and ONE co-partition shuffle on the packed
    int64 bucket key scores each bucket's queries x vectors with a
    local matmul + per-(bucket, query) top-k. Driver and per-task state
    are O(partition) — no per-batch probe tables, no O(nq) broadcast —
    so query count scales with the cluster instead of the batch. Cost
    trade vs broadcast: vectors ship n_tables x through the shuffle
    (the standard LSH-join trade); right below ~1k queries the
    broadcast variant is cheaper, above it this one is the only shape
    that works.
    """
    import itertools

    from hmse_ray.stages.aggregates import copartition_two

    qid, qn = _queries_matrix(sf_dir, n_queries)
    rng = np.random.default_rng(CFG.sample_seed)
    planes = rng.standard_normal((n_tables, n_planes, qn.shape[1]))
    pref = ray.put(planes)
    # flip masks for <= probe_bits multi-probe, precomputed once
    flips = [
        int(np.bitwise_or.reduce([1 << f for f in combo]) if combo else 0)
        for r in range(probe_bits + 1)
        for combo in itertools.combinations(range(n_planes), r)
    ]
    fl = np.array(sorted(set(flips)), dtype=np.int64)

    # queries as a Dataset (tiny here; at scale this IS the input shape)
    q_ds = rd.from_arrow(
        pa.table({"qid": pa.array(qid.astype(np.int64)), "qv": _vec_list(qn)})
    )

    def q_rows(t: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        Q = _emb_matrix(t["qv"])
        ids = t["qid"].to_numpy()
        nq, nf = len(ids), len(fl)
        keys, idxs = [], []
        for tbl in range(n_tables):
            bits = (Q @ pl[tbl].T > 0).astype(np.int64)
            base = np.zeros(nq, dtype=np.int64)
            for b in range(n_planes):
                base = (base << 1) | bits[:, b]
            probes = base[:, None] ^ fl[None, :]  # (nq, nf)
            keys.append((np.int64(tbl) << np.int64(n_planes)) | probes.ravel())
            idxs.append(np.repeat(np.arange(nq), nf))
        idx = np.concatenate(idxs)
        return pa.table(
            {
                "tkey": pa.array(np.concatenate(keys), pa.int64()),
                "qid": pa.array(ids[idx], pa.int64()),
                "qv": _vec_list(Q[idx]),
            }
        )

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def v_rows(t: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        V = _emb_matrix(t["embedding"])
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
        ids = t["vec_id"].to_numpy()
        n = len(ids)
        keys = []
        for tbl in range(n_tables):
            bits = (Vn @ pl[tbl].T > 0).astype(np.int64)
            bucket = np.zeros(n, dtype=np.int64)
            for b in range(n_planes):
                bucket = (bucket << 1) | bits[:, b]
            keys.append((np.int64(tbl) << np.int64(n_planes)) | bucket)
        idx = np.tile(np.arange(n), n_tables)
        return pa.table(
            {
                "tkey": pa.array(np.concatenate(keys), pa.int64()),
                "vec_id": pa.array(ids[idx], pa.int64()),
                "vv": _vec_list(Vn[idx]),
            }
        )

    schema = pa.schema(
        [
            ("tkey", pa.int64()),
            ("qid", pa.int64()),
            ("qv", pa.list_(pa.float64())),
            ("vec_id", pa.int64()),
            ("vv", pa.list_(pa.float64())),
        ]
    )
    _empty_out = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )

    def score_part(qt: pa.Table, vt: pa.Table) -> pa.Table:
        if qt.num_rows == 0 or vt.num_rows == 0:
            return _empty_out
        qt = qt.sort_by([("tkey", "ascending")])
        vt = vt.sort_by([("tkey", "ascending")])
        qk = qt["tkey"].to_numpy()
        vk = vt["tkey"].to_numpy()
        Q = _emb_matrix(qt["qv"])
        V = _emb_matrix(vt["vv"])
        qids = qt["qid"].to_numpy()
        vids = vt["vec_id"].to_numpy()
        new = np.empty(len(qk), dtype=bool)
        new[0] = True
        new[1:] = qk[1:] != qk[:-1]
        qstarts = np.nonzero(new)[0]
        qsizes = np.diff(np.append(qstarts, len(qk)))
        out_q, out_v, out_s = [], [], []
        for qs, qm in zip(qstarts, qsizes):
            key = qk[qs]
            lo = np.searchsorted(vk, key, "left")
            hi = np.searchsorted(vk, key, "right")
            if hi == lo:
                continue
            S = V[lo:hi] @ Q[qs : qs + qm].T  # (nv, nq_in_bucket)
            bv = vids[lo:hi]
            for j in range(qm):
                col = S[:, j]
                # per-(bucket, query) top-k with the GLOBAL tie-break
                # (-score, vec_id) so results never depend on block or
                # partition boundaries (ADVICE r3)
                order = np.lexsort((bv, -col))[:k]
                out_q.append(np.full(len(order), qids[qs + j], dtype=np.int64))
                out_v.append(bv[order])
                out_s.append(col[order])
        if not out_q:
            return _empty_out
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    scored = copartition_two(
        q_ds.map_batches(q_rows, batch_format="pyarrow"),
        emb.map_batches(v_rows, batch_format="pyarrow"),
        "tkey",
        schema,
        score_part,
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        # the same (query, vec) pair arrives from every table whose
        # bucket matched — dedup before the final cut
        g = g.sort_values(["score", "vec_id"], ascending=[False, True])
        g = g.drop_duplicates("vec_id").head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "vec_id": g["vec_id"],
                "score_r": np.round(g["score"], 4),
            }
        )

    return scored.groupby("query_id").map_groups(topk, batch_format="pandas")


def ann_topk_ivf(sf_dir, k=10, n_centroids=16, n_probe=10):
    """IVF ANN (scale path; rows-only IRREDUCIBLY: approximate by design
    — scanned cells depend on k-means centroids, so no SQL oracle;
    recall >= 0.9 vs the oracle-verified brute force is asserted via
    ann_recall, fixed-seed row-count pins in pytest): coarse centroids
    from a seeded sample (Lloyd iterations on the driver — the sample is
    tiny), every vector assigned to its nearest centroid inside
    map_batches, queries scan only the n_probe nearest inverted lists."""
    qid, qn = _queries_matrix(sf_dir)
    rng = np.random.default_rng(CFG.sample_seed)
    # centroid-training sample drawn INSIDE the pipeline (deterministic
    # vec_id stride filter + limit) — only ~512 vectors ever reach the
    # driver, never the full table (VERDICT r01 finding 3)
    emb_src = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    n_total = emb_src.count()
    stride = max(1, n_total // 512)
    sample_t = (
        emb_src.map_batches(
            lambda t: t.filter(pa.array(t["vec_id"].to_numpy() % stride == 0)),
            batch_format="pyarrow",
        )
        .limit(512)
        .to_pandas()
    )
    sv = np.stack(sample_t["embedding"].to_numpy()).astype(np.float64)
    sample = sv / np.maximum(np.linalg.norm(sv, axis=1, keepdims=True), 1e-30)
    cents = sample[rng.choice(len(sample), min(n_centroids, len(sample)), replace=False)].copy()
    for _ in range(5):  # Lloyd iterations on the sample (spherical k-means)
        assign = (sample @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            m = sample[assign == c]
            if len(m):
                v = m.mean(axis=0)
                cents[c] = v / max(np.linalg.norm(v), 1e-30)
    probe_lists = np.argsort(-(qn @ cents.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    bref = ray.put((qid, qn, cents, probe_lists))
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def score(batch: pa.Table) -> pa.Table:
        qids, qmat, cs, probes = ray.get(bref)
        v = _emb_matrix(batch["embedding"])
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        cell = (vn @ cs.T).argmax(axis=1)
        vids = batch["vec_id"].to_numpy()
        out_q, out_v, out_s = [], [], []
        for j, qv in enumerate(qids):
            mask = np.isin(cell, probes[j])
            if not mask.any():
                continue
            sc = vn[mask] @ qmat[j]
            out_q.extend([int(qv)] * int(mask.sum()))
            out_v.extend(vids[mask].tolist())
            out_s.extend(sc.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"],
                "vec_id": g["vec_id"],
                "score_r": np.round(g["score"], 4),
            }
        )

    return (
        emb.map_batches(score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(topk, batch_format="pandas")
    )


def ann_recall(sf_dir, k=10):
    """Recall@k of the approximate ANN paths (LSH multi-probe, IVF)
    against the oracle-verified brute-force top-k (VERDICT r01 item 5).
    One row per method; pytest asserts recall >= 0.9. Rows-only
    IRREDUCIBLY: this IS the check for the approximate-by-design paths —
    a SQL twin would have to reimplement the approximations."""
    exact = ann_topk(sf_dir, k).to_pandas()
    truth = {
        q: set(g["vec_id"]) for q, g in exact.groupby("query_id")
    }
    rows = []
    for method, fn in (("lsh", ann_topk_lsh), ("ivf", ann_topk_ivf)):
        got = fn(sf_dir, k).to_pandas()
        hit = total = 0
        for q, g in got.groupby("query_id"):
            hit += len(set(g["vec_id"]) & truth.get(q, set()))
            total += len(truth.get(q, set()))
        rows.append(
            {"method": method, "recall_at_k": round(hit / max(1, total), 4)}
        )
    return pd.DataFrame(rows)


PLANT_OFFSET = 1_000_000_000  # planted near-dup vec_id = original + offset


def _planted_embeddings(sf_dir, plant_every: int = 20, eps: float = 0.03):
    """Embeddings Dataset augmented with deterministic planted near-dups:
    every ``plant_every``-th vector gains a copy (vec_id + PLANT_OFFSET)
    perturbed by eps in a direction derived row-wise from vec_id (murmur
    hash — independent of batching), cosine >= ~0.999. Derivation runs
    INSIDE map_batches (no driver materialization)."""
    from hmse_ray.functions import murmur3

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def plant(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        m = ids % plant_every == 0
        if not m.any():
            return t
        v = _emb_matrix(t["embedding"])[m]
        dim = v.shape[1]
        pids = ids[m].astype(np.int64)
        seeds = (
            pids[:, None].astype(np.uint64) * np.uint64(dim)
            + np.arange(dim, dtype=np.uint64)[None, :]
        ).astype(np.uint32)
        u = murmur3.murmur3_u32(seeds.ravel(), 0xD1F7).reshape(len(pids), dim)
        u = u.astype(np.float64) / 2**31 - 1.0
        u /= np.maximum(np.linalg.norm(u, axis=1, keepdims=True), 1e-30)
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        planted = vn + eps * u
        new = pa.table(
            {
                "vec_id": pa.array(pids + PLANT_OFFSET, t.schema.field("vec_id").type),
                "embedding": pa.array(list(planted), t.schema.field("embedding").type),
            }
        )
        return pa.concat_tables([t.select(["vec_id", "embedding"]), new])

    return emb.map_batches(plant, batch_format="pyarrow")


def embedding_near_dups(sf_dir, threshold=0.98, plant: bool = True):
    """Embedding-cosine near-duplicate pairs (rows-only): LSH-bucketed
    star comparison, same narrow harness as the text path. Deterministic
    near-dup vectors are planted in-pipeline so the query is non-vacuous
    at every sf (VERDICT r01 finding 7); pytest asserts planted recall."""
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    emb = _planted_embeddings(sf_dir) if plant else rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    rng = np.random.default_rng(CFG.sample_seed + 1)
    dim = 64
    planes = rng.standard_normal((16, dim))
    pref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        v = _emb_matrix(batch["embedding"])
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        bits = (vn @ pl.T > 0).astype(np.int64)
        out = []
        # 4 bands of 4 planes -> near-identical vectors collide in >=1 band
        for band in range(4):
            key = np.zeros(len(vn), dtype=np.int64)
            for b in range(4):
                key = (key << 1) | bits[:, band * 4 + b]
            out.append(
                pa.table(
                    {
                        "bucket": pa.array(key * 8 + band, pa.int64()),
                        "vec_id": batch["vec_id"],
                        "embedding": batch["embedding"],
                    }
                )
            )
        return pa.concat_tables(out)

    def allpairs_part(t: pa.Table) -> pa.Table:
        """Per-partition within-bucket ALL-PAIRS cosine (a star-vs-rep
        probe would only find pairs involving the bucket minimum —
        wrong for sparse high-threshold similarity). Python iterates
        BUCKETS, each a vectorized matmul; mega-buckets fall back to a
        rep-star probe so cost stays bounded."""
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("bucket", "ascending"), ("vec_id", "ascending")])
        buckets = t["bucket"].to_numpy()
        n = len(buckets)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = buckets[1:] != buckets[:-1]
        starts = np.append(np.nonzero(new)[0], n)
        v = _emb_matrix(t["embedding"])
        vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        ids = t["vec_id"].to_numpy()
        out_a, out_b, out_c = [], [], []
        MEGA = 8192  # beyond this, all-pairs is quadratic pain: star probe
        for s, e in zip(starts[:-1], starts[1:]):
            m = e - s
            if m < 2:
                continue
            if m > MEGA:
                cos = vn[s:e] @ vn[s]
                k = np.nonzero(cos[1:] >= threshold)[0] + 1
                out_a.append(np.full(len(k), ids[s]))
                out_b.append(ids[s:e][k])
                out_c.append(cos[k])
                continue
            g = vn[s:e] @ vn[s:e].T
            iu, ju = np.triu_indices(m, 1)
            keep = np.nonzero(g[iu, ju] >= threshold)[0]
            if len(keep):
                out_a.append(ids[s:e][iu[keep]])  # sorted: id_a < id_b
                out_b.append(ids[s:e][ju[keep]])
                out_c.append(g[iu[keep], ju[keep]])
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                "cosine": pa.array(
                    np.round(np.concatenate(out_c), 6), pa.float64()
                ),
            }
        )

    pairs = hash_partitioned_groupby_arrow(
        emb.map_batches(bucketize, batch_format="pyarrow"), "bucket", allpairs_part
    )

    def packkey(t: pa.Table) -> pa.Table:
        k = (t["id_a"].to_numpy().astype(np.int64) << np.int64(32)) | t[
            "id_b"
        ].to_numpy().astype(np.int64)
        return t.append_column("pairkey", pa.array(k, pa.int64()))

    def uniq_part(t: pa.Table) -> pa.Table:
        g = t.group_by("pairkey").aggregate(
            [("id_a", "min"), ("id_b", "min"), ("cosine", "max")]
        )
        names = {"id_a_min": "id_a", "id_b_min": "id_b", "cosine_max": "cosine"}
        g = g.rename_columns([names.get(c, c) for c in g.column_names])
        return g.drop_columns(["pairkey"])

    return hash_partitioned_groupby_arrow(
        pairs.map_batches(packkey, batch_format="pyarrow"), "pairkey", uniq_part
    )


# --------------------------------------------------------- decontamination


def _word_ngram_sets(texts: list[str], n: int) -> list[set[str]]:
    """Per-doc DISTINCT word n-grams (whitespace tokens, space-joined) —
    the GPT-3 appendix-C contamination unit, scaled to this corpus's
    ~55-token docs. Token rule matches the SQL oracle's
    regexp_split_to_array(trim(text), '\\s+') exactly."""
    out = []
    for tx in texts:
        toks = tx.split()
        out.append({" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)})
    return out


# Above this many distinct benchmark grams the broadcast LUT stops
# being "MBs against a 100-TB corpus" and decontaminate_docs switches
# to the co-partition-on-gram shuffle (VERDICT r4 item 3).
_DECON_BROADCAST_LIMIT = 2_000_000


def decontaminate_docs(sf_dir, n: int = 4, bench_mod: int = 50,
                       bench_rem: int = 7,
                       broadcast_limit: int = _DECON_BROADCAST_LIMIT):
    """Benchmark decontamination (SQL-checked): flag every corpus doc
    sharing >= 1 word n-gram with the benchmark set — the standard
    train-set decontamination rule (GPT-3 appendix C / PaLM / Llama,
    13-gram scaled to n=4 for this corpus's ~55-token small-vocabulary
    synthetic docs — n=8 flags only the single planted containment
    pair; n=4 keeps a measurable natural background too). The benchmark
    set is the deterministic doc_id % 50 == 7 slice (~2%).

    Ray shape, small benchmark (the common case — suites are MBs
    against a 100-TB corpus): benchmark grams are collected once and
    broadcast via ray.put; the corpus streams through ONE map_batches
    doing a hash-set membership probe per doc. No shuffle.

    Large benchmark (VERDICT r4 item 3 — the fixture models the
    benchmark as a corpus slice, so the collect would scale with the
    corpus): when the distinct benchmark gram count exceeds
    ``broadcast_limit``, the query switches to a co-partition-on-gram
    shuffle — bench gram rows and corpus (gram, doc) rows hash to the
    same partition, per-partition distinct-hit partials sum EXACTLY
    (each gram lives in one partition and per-doc gram rows are
    distinct), and a doc-keyed shuffle totals n_hits. Bit-parity with
    the broadcast path is pinned in TestDecontaminate.

    Output (doc_id, contaminated, n_hits) for every NON-benchmark doc,
    n_hits = count of distinct matching grams."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sel = np.flatnonzero(ids % bench_mod == bench_rem)
        texts = t.take(sel)["text"].to_pylist()
        grams = sorted(set().union(*_word_ngram_sets(texts, n))) if len(
            texts) else []
        return pa.table({"g": pa.array(grams, pa.string())})

    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    # Global distinct BEFORE the broadcast/shuffle decision: bench_grams
    # dedups only within a batch, so the raw row count scales with block
    # layout x overlap, not with the distinct gram set the
    # ``broadcast_limit`` knob documents. One bench-side-bounded shuffle
    # makes the count (and the broadcast collect) exactly distinct.
    bg_rows = hash_partitioned_groupby_arrow(
        docs.map_batches(bench_grams, batch_format="pyarrow"), "g",
        lambda t: pa.table({"g": pc.unique(_combine_col(t["g"]))}),
    ).materialize()
    if bg_rows.count() <= broadcast_limit:
        bset = set()
        for row in bg_rows.take_all():
            bset.add(row["g"])
        bref = ray.put(frozenset(bset))

        def probe(t: pa.Table) -> pa.Table:
            bg = ray.get(bref)
            ids = t["doc_id"].to_numpy()
            sel = np.flatnonzero(ids % bench_mod != bench_rem)
            sub = t.take(sel)
            hits = np.array(
                [len(gs & bg) for gs in _word_ngram_sets(
                    sub["text"].to_pylist(), n)],
                dtype=np.int64,
            )
            return pa.table({
                "doc_id": pa.array(ids[sel], pa.int64()),
                "contaminated": pa.array((hits > 0).astype(np.int64), pa.int64()),
                "n_hits": pa.array(hits, pa.int64()),
            })

        return docs.map_batches(probe, batch_format="pyarrow")

    # ---- co-partition-on-gram path (benchmark too big to broadcast)
    from hmse_ray.stages.aggregates import copartition_two, hash_partitioned_groupby_arrow

    def corpus_gram_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sel = np.flatnonzero(ids % bench_mod != bench_rem)
        sub = t.take(sel)
        gsets = _word_ngram_sets(sub["text"].to_pylist(), n)
        sub_ids = ids[sel]
        out_g: list[str] = []
        out_id: list[int] = []
        for i, gs in enumerate(gsets):
            out_g.extend(gs)
            out_id.extend([int(sub_ids[i])] * len(gs))
        return pa.table({
            "g": pa.array(out_g, pa.string()),
            "doc_id": pa.array(out_id, pa.int64()),
        })

    gram_schema = pa.schema([("g", pa.string()), ("doc_id", pa.int64())])

    def hit_partials(bench_t: pa.Table, corpus_t: pa.Table) -> pa.Table:
        if bench_t.num_rows == 0 or corpus_t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "hits": pa.array([], pa.int64())})
        bg = pc.unique(_combine_col(bench_t["g"]))
        in_bench = pc.is_in(corpus_t["g"], value_set=bg)
        hit_docs = corpus_t["doc_id"].filter(in_bench)
        if len(hit_docs) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "hits": pa.array([], pa.int64())})
        gp = pa.table({"doc_id": hit_docs}).group_by("doc_id").aggregate(
            [("doc_id", "count")])
        return pa.table({
            "doc_id": gp["doc_id"],
            "hits": gp["doc_id_count"].cast(pa.int64()),
        })

    partials = copartition_two(
        bg_rows, docs.map_batches(corpus_gram_rows, batch_format="pyarrow"),
        "g", gram_schema, hit_partials,
    )

    def zero_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sel = np.flatnonzero(ids % bench_mod != bench_rem)
        return pa.table({
            "doc_id": pa.array(ids[sel], pa.int64()),
            "hits": pa.array(np.zeros(sel.size, np.int64), pa.int64()),
        })

    def total(t: pa.Table) -> pa.Table:
        gp = t.group_by("doc_id").aggregate([("hits", "sum")])
        hits = gp["hits_sum"].to_numpy()
        return pa.table({
            "doc_id": gp["doc_id"],
            "contaminated": pa.array((hits > 0).astype(np.int64), pa.int64()),
            "n_hits": pa.array(hits.astype(np.int64), pa.int64()),
        })

    unioned = docs.map_batches(zero_rows, batch_format="pyarrow").union(partials)
    return hash_partitioned_groupby_arrow(unioned, "doc_id", total)


_STRAT_SEED = 0xA11CE


def stratified_sample_docs(sf_dir, per_source: int = 8):
    """Stratified seeded sampling for data mixing (SQL-checked): the
    ``per_source`` docs with the smallest (murmur3(doc_id), doc_id)
    rank within each source — a deterministic uniform draw per stratum,
    the selection primitive a training-data pipeline uses to hit a
    target source mix. Output (doc_id, source, sel_rank).

    Ray shape: the murmur rank is a per-batch vectorized column, each
    batch keeps its local top-k per source (COMBINER — the shuffle
    carries at most blocks x sources x k candidate rows, never the
    corpus), and one tiny hash partition by source finalizes ranks.
    """
    from hmse_ray.functions import murmur3
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    docs = _docs(sf_dir, ["doc_id", "source"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        hm = murmur3.murmur3_u32((ids % (1 << 32)).astype(np.uint32),
                                 _STRAT_SEED).astype(np.int64)
        df = pd.DataFrame({
            "doc_id": ids,
            "source": t["source"].to_pandas(),
            "hm": hm,
        }).sort_values(["source", "hm", "doc_id"])
        df = df.groupby("source", sort=False).head(per_source)
        return pa.Table.from_pandas(df, preserve_index=False)

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["source", "hm", "doc_id"])
        df["sel_rank"] = df.groupby("source", sort=False).cumcount() + 1
        df = df[df["sel_rank"] <= per_source]
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            "source": pa.array(df["source"], pa.string()),
            "sel_rank": pa.array(df["sel_rank"].to_numpy(), pa.int64()),
        })

    return hash_partitioned_groupby_arrow(
        docs.map_batches(partial, batch_format="pyarrow"), "source", finalize)


# ------------------------------------------------- semantic dedup (SemDeDup)


def _emb_ds(sf_dir):
    return rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )


def kmeans_clusters(sf_dir, k: int | None = None, iters: int | None = None):
    """Distributed quantized k-means over the embeddings table
    (SQL-checked BIT-FOR-BIT: coordinates quantized to int64 once,
    int-exact distances, centroid update rounded through one shared
    IEEE double division, murmur3-ranked init — stages/kmeans.py has
    the full exactness argument). Lloyd's runs as broadcast-centroid
    streaming passes with k-row per-batch partials: NO shuffle at any
    scale. Output (vec_id, cluster, dist2)."""
    from hmse_ray.stages import kmeans

    k = k or kmeans.K
    iters = iters or kmeans.ITERS
    emb = _emb_ds(sf_dir)
    C = kmeans.lloyd(emb, k, iters)
    return kmeans.assignments(emb, C)


def semantic_dedup(sf_dir, k: int | None = None, iters: int | None = None):
    """SemDeDup (Abbas et al., arXiv:2303.09540) over the embeddings
    table (SQL-checked BIT-FOR-BIT): k-means the embedding space, then
    one-shot within-cluster cosine dedup at t=0.9 against the rule
    ``dot>0 and 100*dot^2 >= 81*|a|^2*|b|^2`` — all int64 on quantized
    coords, so DuckDB reproduces planted rows, clustering, ranking and
    flags exactly. Deterministic integer-level near-dups are planted
    in-pipeline (every 20th vec_id, murmur-perturbed quantized coords,
    cos ~ 0.9993) so the query is non-vacuous at every sf. The only
    all-to-all is ONE hash partition by final cluster id; within-cluster
    pairwise is SemDeDup's own bounded design (k is the lever).
    Output (vec_id, cluster, is_dup, keeper_id)."""
    from hmse_ray.stages import kmeans

    return kmeans.semantic_dedup_ds(
        _emb_ds(sf_dir), k or kmeans.K, iters or kmeans.ITERS, plant=True
    )


# ------------------------------------------------------------- near-dup text


# Text near-dup banding: 16 bands x 8 rows puts the S-curve knee at
# (1/16)^(1/8) ~ 0.71 — recall ~0.9999 at the j>=0.9 pairs this corpus
# contains and only ~1% false candidates from the fat j~0.4 background
# blob (32x4's knee of 0.42 turned half that blob into candidates —
# measured 23.5s at sf0.1). The image flagship keeps the reference's
# 4 x 32 banding (knee ~0.96, tuned for near-identical images) — at
# sf0.001 that banding measurably missed 6 of 28 true j>=0.92 text
# pairs, which is why text queries get their own config.
TEXT_CFG = dataclasses.replace(CFG, num_bands=16, rows_per_band=8)


def minhash_doc_pairs(sf_dir):
    """T1+J2+M6 over the documents table (SQL-checked: signatures AND
    banding reproduced bit-for-bit in SQL; jaccard_est is the
    MinHash estimate, not SQL-reproducible): verified MinHash LSH
    candidate pairs of near-duplicate texts under text-tuned banding."""
    from hmse_ray.stages import lsh, signatures

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: pa.table(
            {"image_id": pc.cast(t["doc_id"], pa.string()), "caption": t["text"]}
        ),
        batch_format="pyarrow",
    )
    mh = signatures.minhash_stage(docs, TEXT_CFG)
    # num_salts=1: _minhash_doc_pairs_sql assumes unsalted banding
    return lsh.candidate_pairs(mh, TEXT_CFG, num_salts=1)


def _shingle_rows(t: pa.Table) -> pa.Table:
    """(doc_id, text) batch -> exploded (shingle, doc_id) rows, one per
    DISTINCT byte-4-gram per doc. Ids are asserted < 2^31 so packed
    (id_a << 32) | id_b pair keys stay exact in signed int64 (ADVICE r2:
    fail loudly instead of silently aliasing at the design scale)."""
    ids = t["doc_id"].to_numpy()
    if ids.size and (ids.min() < 0 or ids.max() >= _PACK_ID_LIMIT):
        raise ValueError(
            f"doc_id outside [0, 2^31): {ids.min()}..{ids.max()} — packed "
            "int64 pair keys would alias; re-key the corpus first"
        )
    out_sh, out_id = [], []
    for i, txt in enumerate(t["text"].to_pylist()):
        sh = textstats.char_ngram_set(txt or "")  # sorted unique u32
        out_sh.append(sh.astype(np.int64))
        out_id.append(np.full(sh.size, ids[i], dtype=np.int64))
    if not out_sh:
        return pa.table(
            {"shingle": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "shingle": pa.array(np.concatenate(out_sh), pa.int64()),
            "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
        }
    )


_PACK_ID_LIMIT = 1 << 31

_EMPTY_PAIRS = pa.table(
    {
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    }
)


def exact_verify_edges(docs, edges, threshold: float):
    """SHUFFLE-JOIN exact verification (VERDICT r2 item 2): candidate
    edges (id_a, id_b strings) + (doc_id, text) docs -> pairs with TRUE
    byte-4-gram Jaccard >= threshold. See verify_packed_pairs for the
    shuffle shape (no broadcast CSR index, no per-pair Python loop)."""

    def pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"pairkey": pa.array([], pa.int64())})
        a = pc.cast(t["id_a"], pa.int64()).to_numpy()
        b = pc.cast(t["id_b"], pa.int64()).to_numpy()
        if a.size and (
            min(a.min(), b.min()) < 0 or max(a.max(), b.max()) >= _PACK_ID_LIMIT
        ):
            raise ValueError("edge id outside [0, 2^31): packed keys would alias")
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        pk = np.unique((lo << np.int64(32)) | hi)  # per-batch pre-dedup
        return pa.table({"pairkey": pa.array(pk, pa.int64())})

    return verify_packed_pairs(
        docs.map_batches(_shingle_rows, batch_format="pyarrow"),
        edges.map_batches(pack, batch_format="pyarrow"),
        threshold,
    )


def verify_packed_pairs(sh_ds, packed, threshold: float):
    """EXACT byte-4-gram Jaccard verification of packed candidate pairs
    — the 100-TB shape (VERDICT r2 item 2 / r3 item 3), three narrow
    int64 shuffles over (shingle, doc_id) rows ``sh_ds`` and candidate
    ``packed`` ((lo << 32) | hi int64 ``pairkey`` rows, dups allowed):

      1. pairkey-partitioned np.unique  -> globally deduped pairs;
      2. doc_id-partitioned join of per-pair membership requests with
         exploded shingle rows -> (pairkey, shingle) rows;
      3. pairkey-partitioned run-length count: a shingle value occurs
         once (one side) or twice (intersection) within a pair, so
         inter = #dup runs, |A|+|B| = group size, all vectorized.
    """
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    def uniq_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"pairkey": pa.array([], pa.int64())})
        return pa.table(
            {"pairkey": pa.array(np.unique(t["pairkey"].to_numpy()), pa.int64())}
        )

    pairs = hash_partitioned_groupby_arrow(packed, "pairkey", uniq_part)

    def requests(t: pa.Table) -> pa.Table:
        """Two (doc_id, pairkey) membership requests per pair; shingle
        rows ride the same schema with pairkey = -1 - shingle (< 0)."""
        pk = t["pairkey"].to_numpy()
        a = (pk >> np.int64(32)).astype(np.int64)
        b = (pk & np.int64(0xFFFFFFFF)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
                "pairkey": pa.array(np.concatenate([pk, pk]), pa.int64()),
            }
        )

    def sh_rows(s: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": s["doc_id"],
                "pairkey": pc.subtract(pa.scalar(-1, pa.int64()), s["shingle"]),
            }
        )

    mixed = pairs.map_batches(requests, batch_format="pyarrow").union(
        sh_ds.map_batches(sh_rows, batch_format="pyarrow")
    )

    def join_part(t: pa.Table) -> pa.Table:
        """One doc_id partition: emit (pairkey, shingle) for every
        request x that doc's shingles (vectorized repeat/tile)."""
        empty = pa.table(
            {"pairkey": pa.array([], pa.int64()), "shingle": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        pk = t["pairkey"].to_numpy()
        doc = t["doc_id"].to_numpy()
        is_req = pk >= 0
        if not is_req.any() or is_req.all():
            return empty
        rdoc, rpk = doc[is_req], pk[is_req]
        sdoc, sval = doc[~is_req], (-1 - pk[~is_req])
        order = np.argsort(sdoc, kind="stable")
        sdoc, sval = sdoc[order], sval[order]
        lo = np.searchsorted(sdoc, rdoc, side="left")
        hi = np.searchsorted(sdoc, rdoc, side="right")
        cnt = hi - lo
        if cnt.sum() == 0:
            return empty
        out_pk = np.repeat(rpk, cnt)
        idx = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi) if h > l])
        return pa.table(
            {
                "pairkey": pa.array(out_pk, pa.int64()),
                "shingle": pa.array(sval[idx], pa.int64()),
            }
        )

    joined = hash_partitioned_groupby_arrow(mixed, "doc_id", join_part)

    def verify_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_PAIRS
        t = t.sort_by([("pairkey", "ascending"), ("shingle", "ascending")])
        pk = t["pairkey"].to_numpy()
        sv = t["shingle"].to_numpy()
        n = len(pk)
        newp = np.empty(n, dtype=bool)
        newp[0] = True
        newp[1:] = pk[1:] != pk[:-1]
        starts = np.nonzero(newp)[0]
        sizes = np.diff(np.append(starts, n))
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (sv[1:] == sv[:-1]) & ~newp[1:]
        inter = np.add.reduceat(dup.astype(np.int64), starts)
        union = sizes - inter
        j = inter / np.maximum(1, union)
        keep = j >= threshold
        if not keep.any():
            return _EMPTY_PAIRS
        kp = pk[starts][keep]
        return pa.table(
            {
                "id_a": pa.array((kp >> np.int64(32)).astype(np.int64), pa.int64()),
                "id_b": pa.array((kp & np.int64(0xFFFFFFFF)).astype(np.int64)),
                "jaccard": pa.array(np.round(j[keep], 6), pa.float64()),
            }
        )

    return hash_partitioned_groupby_arrow(joined, "pairkey", verify_part)


def doc_clusters(sf_dir, threshold: float = 0.8, num_salts: int = 1):
    """Near-dup cluster assignment over documents (SQL-checked).

    VERDICT r2 item 2 shape: edges come from MinHash-LSH banding
    (TEXT_CFG 16x8 — measured recall 1.0 vs the exact prefix-filter
    join on this corpus, pinned by test_doc_clusters_lsh_recall), then
    EXACT-Jaccard >= threshold verification via the shuffle join
    (exact_verify_edges — no broadcast index, no per-pair loop), then
    connected components. Candidate volume is ~linear in corpus size
    (LSH buckets) instead of the prefix filter's all-pairs blowup on
    high-background-similarity corpora; the DuckDB oracle reproduces
    the SAME banding bit-for-bit, so the hash check stays sound
    independent of LSH recall. The exact prefix-filter join remains
    available as the bounded audit tool (ngram_jaccard_pairs).

    num_salts > 1 runs the SALT-SAFE verifier (VERDICT r4 item 6,
    _doc_clusters_salted): salted within-sub-bucket all-pairs seed the
    edge set, then a cross-label refinement loop over the UNSALTED
    bucket membership verifies exactly the inter-component pairs a
    salted rep chain could orphan — output is identical to the unsalted
    path (and the SQL oracle) for ANY salt count, pinned hash-green on
    a planted hot-bucket fixture in TestDocClustersSalted."""
    from hmse_ray.stages import clustering, lsh, signatures

    # NOT materialized (VERDICT r3 item 5): each consumer (signing,
    # shingle explode, id list) re-reads the column-pruned parquet
    # instead of pinning the whole text corpus in the object store.
    docs = _docs(sf_dir, ["doc_id", "text"])
    as_caps = docs.map_batches(
        lambda t: pa.table(
            {"image_id": pc.cast(t["doc_id"], pa.string()), "caption": t["text"]}
        ),
        batch_format="pyarrow",
    )
    signed = signatures.minhash_stage(as_caps, TEXT_CFG).materialize()
    images = docs.map_batches(
        lambda t: pa.table({"image_id": pc.cast(t["doc_id"], pa.string())}),
        batch_format="pyarrow",
    )
    if num_salts > 1:
        return _doc_clusters_salted(docs, signed, images, threshold, num_salts)
    # num_salts=1 is the default oracle-checked path: _doc_clusters_sql
    # reproduces unsalted banding directly (no refinement loop needed).
    cand = lsh.candidate_edges(signed, TEXT_CFG, edge_shape="all", num_salts=1)
    edges = exact_verify_edges(docs, cand, threshold).map_batches(
        _edges_as_src_dst, batch_format="pyarrow",
    )
    return clustering.cluster_from_edges(edges, images, CFG)


def _edges_as_src_dst(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "src": pc.cast(t["id_a"], pa.string()),
            "dst": pc.cast(t["id_b"], pa.string()),
        }
    )


def _crosslabel_pairs(t: pa.Table) -> pa.Table:
    """One hash partition of (bucket, image_id, cluster_id) membership
    rows -> all CROSS-label pairs within each bucket (numeric id_a <
    id_b). Same-label pairs are skipped — they are already connected,
    which is what keeps the refinement cheap on hot buckets full of one
    duplicate family."""
    empty = pa.table(
        {"id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string())}
    )
    if t.num_rows == 0:
        return empty
    t = t.sort_by(
        [("bucket", "ascending"), ("cluster_id", "ascending"),
         ("image_id", "ascending")]
    )
    b = t["bucket"].to_numpy()
    lab = t["cluster_id"].to_pandas().to_numpy()
    ids_num = pc.cast(t["image_id"], pa.int64()).to_numpy()
    n = len(b)
    newb = np.empty(n, dtype=bool)
    newb[0] = True
    newb[1:] = b[1:] != b[:-1]
    starts = np.append(np.nonzero(newb)[0], n)
    out_a, out_b = [], []
    for s, e in zip(starts[:-1], starts[1:]):
        if e - s < 2:
            continue
        labs = lab[s:e]
        segs = np.append(
            np.nonzero(np.r_[True, labs[1:] != labs[:-1]])[0], e - s)
        if len(segs) <= 2:  # one label in this bucket
            continue
        gi = ids_num[s:e]
        for i in range(len(segs) - 1):
            for j in range(i + 1, len(segs) - 1):
                u = gi[segs[i]:segs[i + 1]]
                v = gi[segs[j]:segs[j + 1]]
                uu = np.repeat(u, v.size)
                vv = np.tile(v, u.size)
                out_a.append(np.minimum(uu, vv))
                out_b.append(np.maximum(uu, vv))
    if not out_a:
        return empty
    return pa.table(
        {
            "id_a": pa.array(np.concatenate(out_a).astype(str), pa.string()),
            "id_b": pa.array(np.concatenate(out_b).astype(str), pa.string()),
        }
    )


def _doc_clusters_salted(docs, signed, images, threshold: float,
                         num_salts: int, max_rounds: int = 32):
    """Salt-safe exact-verified clustering (VERDICT r4 item 6).

    Why the plain salted path is unsound with exact verification: with
    pre-shuffle salting, cross-sub-bucket connectivity rides star edges
    through sub-bucket REPS — if a rep fails exact verification, true
    member-member pairs across sub-buckets are orphaned and clusters
    split vs the unsalted oracle.

    Fix — seed + cross-label refinement to a fixpoint:
    1. seed edges: salted within-sub-bucket all-pairs (plus rep links),
       exact-verified — reducer memory stays bounded by the sub-bucket
       cap, which is the point of salting;
    2. loop: label docs by connected components of the verified edges;
       attach labels to the UNSALTED (bucket, id) membership rows (one
       co-partition on id); per bucket, emit only pairs whose endpoints
       carry DIFFERENT labels (same-label pairs are already connected);
       exact-verify those; stop when a round verifies nothing new.

    At the fixpoint every within-bucket pair is either same-label or
    verified-and-failed, so the components equal the unsalted all-pairs
    result EXACTLY — for any salt count and any corpus. Cost: hot
    buckets of one duplicate family collapse to a single label after
    round 1 (no cross-label pairs remain); only genuinely mixed buckets
    pay cross-label verification, and the pair volume shrinks
    monotonically as components merge."""
    from hmse_ray.stages import clustering, lsh
    from hmse_ray.stages.aggregates import (
        copartition_two, distinct_pairs, gather_lookup,
        hash_partitioned_groupby_arrow,
    )

    cfg = TEXT_CFG
    cand = lsh.candidate_edges(signed, cfg, edge_shape="all",
                               num_salts=num_salts)
    edges_acc = (
        exact_verify_edges(docs, cand, threshold)
        .map_batches(_edges_as_src_dst, batch_format="pyarrow")
        .materialize()
    )
    bands_cols = ["image_id"] + [f"band_h{b}" for b in range(cfg.num_bands)]
    membership = signed.select_columns(bands_cols).map_batches(
        lambda t: lsh.band_explode(t, cfg), batch_format="pyarrow"
    ).materialize()
    mem_schema = pa.schema([
        ("image_id", pa.string()),
        ("bucket", pa.int64()),
        ("cluster_id", pa.string()),
    ])

    def attach(mt: pa.Table, lt: pa.Table) -> pa.Table:
        return gather_lookup(
            mt.select(["image_id", "bucket"]), "image_id",
            lt.select(["image_id", "cluster_id"]), "image_id",
            {"cluster_id": "cluster_id"},
        )

    labels = None
    stale = True
    for _ in range(max_rounds):
        labels = clustering.cluster_from_edges(
            edges_acc, images, CFG).materialize()
        stale = False
        attached = copartition_two(
            membership, labels, "image_id", mem_schema, attach)
        cross = distinct_pairs(
            hash_partitioned_groupby_arrow(attached, "bucket", _crosslabel_pairs),
            val_col=None,
        ).materialize()
        if cross.count() == 0:
            break
        new_edges = (
            exact_verify_edges(docs, cross, threshold)
            .map_batches(_edges_as_src_dst, batch_format="pyarrow")
            .materialize()
        )
        if new_edges.count() == 0:
            break
        edges_acc = edges_acc.union(new_edges).materialize()
        stale = True
    if stale:
        # max_rounds exhausted right after adding edges: the final
        # labels would imply cross-label pairs that were never
        # exact-verified, silently splitting clusters relative to the
        # unsalted path / SQL oracle. Fail loudly instead of returning
        # a divergent answer (the fixture corpora converge in <= 3
        # rounds; a corpus that needs more gets a bigger max_rounds).
        raise RuntimeError(
            f"salted doc_clusters verifier did not reach its fixpoint in "
            f"max_rounds={max_rounds} seed+refine rounds; raise max_rounds")
    return labels


def simhash_text_pairs(sf_dir):
    """Text SimHash near-dup pairs over documents (SQL-checked): Charikar
    token SimHash -> 16-bit band buckets -> Hamming-verified star edges
    (reuses the image SimHash LSH machinery on a text signature)."""
    from hmse_ray.stages import lsh

    def sign(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "image_id": df["doc_id"].astype(str),
                "simhash": [textstats.simhash64_text(t) for t in df["text"].fillna("")],
            }
        )

    sims = _docs(sf_dir, ["doc_id", "text"]).map_batches(sign, batch_format="pandas")
    return lsh.simhash_candidate_pairs(sims, CFG)


def exact_jaccard_pairs(docs, threshold: float = 0.7):
    """EXACT character-4-gram Jaccard similarity self-join over a
    (doc_id, text) Dataset -> (id_a, id_b, jaccard), id_a < id_b.

    Candidates come from PREFIX FILTERING (AllPairs/PPJoin family —
    Bayardo, Ma, Srikant, WWW'07; public algorithm), not MinHash LSH,
    so recall at the threshold is GUARANTEED by the prefix-filter
    theorem (two sets with Jaccard >= t must share a token among the
    first ``m - ceil(t*m) + 1`` of their globally-ordered token lists),
    making the brute-force DuckDB oracle sound for any similarity
    distribution — not just bimodal corpora.

    Scale shape (the standard 3-shuffle distributed set-similarity
    join): (1) NARROW (shingle, doc_id) rows grouped by shingle to
    attach global DOCUMENT FREQUENCY — the AllPairs token order
    (rarest first) that keeps prefix groups tiny on skewed corpora;
    (2) regroup by doc_id to pick each doc's prefix under the
    (df, shingle) order; (3) regroup prefix rows by shingle to emit
    candidate pairs, deduped by packed key. Verification runs through
    verify_packed_pairs (three narrow int64 shuffles, vectorized
    run-length intersection counts — no broadcast index, no per-pair
    Python). On corpora with high background similarity (this
    testdata: ~0.4 Jaccard between ALL docs from a shared template)
    the prefix filter cannot prune below all-pairs, so candidate
    volume — not verification — is what bounds the join; treat this
    as the bounded audit tool and doc_clusters (LSH candidates) as
    the scale path.
    """
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    shingle_rows = _shingle_rows

    def df_part(t: pa.Table) -> pa.Table:
        """Attach per-shingle document frequency (global: partitioned
        by shingle)."""
        if t.num_rows == 0:
            return pa.table(
                {
                    "shingle": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        t = t.sort_by([("shingle", "ascending")])
        sh = t["shingle"].to_numpy()
        n = len(sh)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = sh[1:] != sh[:-1]
        starts = np.nonzero(new)[0]
        sizes = np.diff(np.append(starts, n))
        df = np.repeat(sizes, sizes)
        return t.append_column("df", pa.array(df, pa.int64()))

    def prefix_part(t: pa.Table) -> pa.Table:
        """Per-doc prefix (rarest-first token order), carrying set size
        and in-prefix position for the PPJoin length/positional
        filters."""
        empty = pa.table(
            {
                "shingle": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64()),
                "p": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [("doc_id", "ascending"), ("df", "ascending"), ("shingle", "ascending")]
        )
        ids = t["doc_id"].to_numpy()
        n = len(ids)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = ids[1:] != ids[:-1]
        starts = np.nonzero(new)[0]
        sizes = np.diff(np.append(starts, n))
        lpref = sizes - np.ceil(threshold * sizes).astype(np.int64) + 1
        within = np.arange(n) - np.repeat(starts, sizes)
        keep = within < np.repeat(lpref, sizes)
        kept = t.filter(pa.array(keep))
        return pa.table(
            {
                "shingle": kept["shingle"],
                "doc_id": kept["doc_id"],
                "m": pa.array(np.repeat(sizes, sizes)[keep], pa.int64()),
                "p": pa.array(within[keep] + 1, pa.int64()),
            }
        )

    def pairs_part(t: pa.Table) -> pa.Table:
        """Candidate pairs within each shingle group, pruned by the
        PPJoin filters (both exactness-preserving):
        - length filter: j(A,B) <= min(m)/max(m), so skip pairs with
          min(ma,mb) < t*max(ma,mb);
        - positional filter: overlap(A,B) <= 1 + min(ma-pa, mb-pb), and
          j>=t requires overlap >= ceil(t/(1+t)*(ma+mb))."""
        empty = pa.table({"pairkey": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("shingle", "ascending"), ("doc_id", "ascending")])
        sh = t["shingle"].to_numpy()
        ids = t["doc_id"].to_numpy()
        ms = t["m"].to_numpy()
        ps = t["p"].to_numpy()
        n = len(sh)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = sh[1:] != sh[:-1]
        starts = np.append(np.nonzero(new)[0], n)
        keys = []
        for s, e in zip(starts[:-1], starts[1:]):
            m = e - s
            if m < 2:
                continue
            iu, ju = np.triu_indices(m, 1)
            g, gm, gp = ids[s:e], ms[s:e], ps[s:e]
            ma, mb = gm[iu], gm[ju]
            alpha = np.ceil(threshold / (1.0 + threshold) * (ma + mb))
            ok = (
                (np.minimum(ma, mb) >= threshold * np.maximum(ma, mb))
                & (1 + np.minimum(ma - gp[iu], mb - gp[ju]) >= alpha)
            )
            if ok.any():
                keys.append((g[iu[ok]] << np.int64(32)) | g[ju[ok]])
        if not keys:
            return empty
        return pa.table({"pairkey": pa.array(np.concatenate(keys), pa.int64())})

    # Checkpoint the shingle-row table to parquet and re-read it
    # (VERDICT r4 item 7, the doc_clusters r3 pattern): four downstream
    # stages consume it, and a .materialize() would PIN the full
    # exploded table in the object store for the whole join — at 100 TB
    # the safer shape is spill-to-parquet once, stream back on demand.
    # Lifecycle: the returned Dataset reads the checkpoint lazily, so it
    # cannot be deleted here; every checkpoint lives under ONE parent
    # dir and is rmtree'd at process exit (atexit), so repeated calls
    # in a long session are bounded by the session, not unbounded
    # across sessions (the old per-call uuid dirs leaked forever).
    import atexit
    import shutil
    import tempfile
    import uuid

    parent = os.path.join(tempfile.gettempdir(), "hmse_shingle_ckpt")
    ckpt = os.path.join(parent, uuid.uuid4().hex)
    atexit.register(shutil.rmtree, ckpt, ignore_errors=True)
    docs.map_batches(shingle_rows, batch_format="pyarrow").write_parquet(ckpt)
    sh_ds = rd.read_parquet(ckpt)
    with_df = hash_partitioned_groupby_arrow(sh_ds, "shingle", df_part)
    prefixes = hash_partitioned_groupby_arrow(with_df, "doc_id", prefix_part)
    cand = hash_partitioned_groupby_arrow(prefixes, "shingle", pairs_part)
    # Verification via the shuffle join (VERDICT r3 item 3): prefix-
    # filter candidates keep the recall guarantee; verify_packed_pairs
    # replaces the former broadcast-CSR + per-pair Python intersection
    # loop with three narrow int64 shuffles — no per-worker index that
    # could outgrow memory at cluster scale, no per-pair Python.
    return verify_packed_pairs(sh_ds, cand, threshold)


def ngram_jaccard_pairs(sf_dir, threshold: float = 0.7):
    """Exact 4-gram Jaccard pairs over the documents table (SQL-checked,
    guaranteed recall — see exact_jaccard_pairs)."""
    return exact_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold)


def _combine_col(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def substring_dup_docs(docs, k: int = 8, window: int = 16,
                       max_bucket: int = 65536,
                       id_col: str = "doc_id", text_col: str = "text"):
    """Suffix-array substring matching over (id, text) rows — the north
    rule's named capability for near-identical captions: pairs
    (id_sub, id_sup) where sub's ENTIRE text occurs inside sup's text
    and sub is strictly shorter. Ids are strings (the flagship's
    image_id shape; substring_dup_pairs wraps the int64 documents
    table). Exact (recall 1) for subs of length >= k + window - 1.

    Shape (all narrow shuffles, no all-pairs stage):

    1. Winnowing fingerprints per doc (textstats.winnow_fingerprints —
       Schleimer/Wilkerson/Aiken SIGMOD'03). KEY REDUCTION: if sub is
       contained in sup, every window of sub's k-gram hash sequence
       appears INTACT in sup, so every fingerprint winnowing selects in
       sub is also selected in sup. Each doc therefore probes as a sub
       with only THREE of its fingerprints (min / median / max) while
       advertising as a sup with ALL its fingerprints; a candidate must
       collide in all three probe buckets (multiplicity count == 3 in
       the sub-keyed join). True containments always do; the background
       drops ~300x (measured on the sf0.1 corpus: 850k one-probe
       candidates -> 2.8k three-probe, 248 true).
    2. Fingerprint-bucket groupby emits (sub, sup) id pairs for
       len(sub) < len(sup); the first text join (partitioned by sub id,
       which every copy of a pair shares) counts multiplicity locally
       and keeps pairs hit by all 3 probes — no extra shuffle. Buckets
       beyond ``max_bucket`` sup rows contribute only their longest
       ``max_bucket`` sups (documented skew cap, same role as the LSH
       hot-bucket cap; containment targets are length-biased so the
       longest sups are kept).
    3. Two co-partition joins fetch sub text then group by sup; each
       sup builds ONE suffix array (functions/suffixarray.py, the
       bsdiff search structure) probed by all its candidate subs.

    Lengths are CHARACTER counts (== bytes on ASCII corpora; the SQL
    oracle's length()/position() are character-based).
    """
    from hmse_ray.functions import suffixarray
    from hmse_ray.stages.aggregates import copartition_two, hash_partitioned_groupby_arrow

    min_len = k + window - 1  # winnowing guarantee threshold
    n_probes = 3

    def fp_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(_combine_col(t[id_col]), pa.string())
        fps, out_idx, out_n, out_probe = [], [], [], []
        for i, txt in enumerate(t[text_col].to_pylist()):
            txt = txt or ""
            f = textstats.winnow_fingerprints(txt, k, window).astype(np.int64)
            # sup rows: every fingerprint
            fps.append(f)
            out_idx.append(np.full(f.size, i, dtype=np.int64))
            out_n.append(np.full(f.size, len(txt), dtype=np.int64))
            out_probe.append(np.zeros(f.size, dtype=bool))
            # sub probe rows: min / median / max (f sorted unique;
            # duplicates allowed for tiny fp sets — multiplicity is the
            # intersection count either way)
            if f.size and len(txt) >= min_len:
                fps.append(f[[0, f.size // 2, f.size - 1]])
                out_idx.append(np.full(n_probes, i, dtype=np.int64))
                out_n.append(np.full(n_probes, len(txt), dtype=np.int64))
                out_probe.append(np.ones(n_probes, dtype=bool))
        if not fps:
            return pa.table(
                {
                    "fp": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "probe": pa.array([], pa.bool_()),
                }
            )
        idx = pa.array(np.concatenate(out_idx), pa.int64())
        return pa.table(
            {
                "fp": pa.array(np.concatenate(fps), pa.int64()),
                "doc_id": ids.take(idx),
                "n": pa.array(np.concatenate(out_n), pa.int64()),
                "probe": pa.array(np.concatenate(out_probe), pa.bool_()),
            }
        )

    _EMPTY_SS_PAIRS = pa.table(
        {
            "doc_id": pa.array([], pa.string()),  # sub id (join-1 key)
            "sup_id": pa.array([], pa.string()),
        }
    )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_SS_PAIRS
        t = t.sort_by(
            [("fp", "ascending"), ("probe", "ascending"), ("n", "ascending")]
        )
        fp = t["fp"].to_numpy()
        ids = _combine_col(t["doc_id"])
        ns = t["n"].to_numpy()
        probes = t["probe"].to_numpy(zero_copy_only=False)
        new = np.empty(len(fp), dtype=bool)
        new[0] = True
        new[1:] = fp[1:] != fp[:-1]
        starts = np.nonzero(new)[0]
        sizes = np.diff(np.append(starts, len(fp)))
        sub_idx, sup_idx = [], []
        for s, m in zip(starts, sizes):
            g = slice(s, s + m)
            sub_sel = np.nonzero(probes[g])[0] + s
            if sub_sel.size == 0 or sub_sel.size == m:
                continue
            # sup rows are the probe=False prefix, sorted by n
            sup_hi = s + m - sub_sel.size
            sup_lo = s if sup_hi - s <= max_bucket else sup_hi - max_bucket
            sup_ns = ns[sup_lo:sup_hi]
            for si in sub_sel:
                # sups are the strictly-longer tail of the length-sorted run
                j = np.searchsorted(sup_ns, ns[si], side="right")
                tail = np.arange(sup_lo + j, sup_hi)
                if tail.size:
                    sub_idx.append(np.full(tail.size, si, dtype=np.int64))
                    sup_idx.append(tail)
        if not sub_idx:
            return _EMPTY_SS_PAIRS
        return pa.table(
            {
                "doc_id": ids.take(pa.array(np.concatenate(sub_idx), pa.int64())),
                "sup_id": ids.take(pa.array(np.concatenate(sup_idx), pa.int64())),
            }
        )

    fps = docs.map_batches(fp_rows, batch_format="pyarrow")
    cands = hash_partitioned_groupby_arrow(fps, "fp", bucket_pairs)

    texts = docs.map_batches(
        lambda t: pa.table(
            {"doc_id": pc.cast(t[id_col], pa.string()), "text": t[text_col]}
        ),
        batch_format="pyarrow",
    )

    # join 1: probe-intersect + fetch sub text, re-key by sup. Every
    # copy of a pair shares its sub id — this join's partition key — so
    # the multiplicity count is local (no extra shuffle).
    j1_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("sup_id", pa.string()),
            ("text", pa.string()),
        ]
    )

    def attach_sub_text(req: pa.Table, doc: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "sub_id": pa.array([], pa.string()),
                "sub_text": pa.array([], pa.string()),
            }
        )
        if req.num_rows == 0 or doc.num_rows == 0:
            return empty
        # probe intersection: keep (sub, sup) hit by all n_probes probes
        import pandas as pd_  # local alias; kernel ships to workers

        rdf = pd_.DataFrame(
            {
                "sub": req["doc_id"].to_numpy(zero_copy_only=False),
                "sup": req["sup_id"].to_numpy(zero_copy_only=False),
            }
        )
        counts = rdf.groupby(["sub", "sup"], sort=False).size()
        keep = counts[counts >= n_probes].index
        if len(keep) == 0:
            return empty
        rid = keep.get_level_values(0).to_numpy()
        rsup = keep.get_level_values(1).to_numpy()
        did = doc["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(did, kind="stable")
        did = did[order]
        dtext = _combine_col(doc["text"]).take(pa.array(order, pa.int64()))
        pos = np.searchsorted(did, rid)
        pos_c = np.minimum(pos, len(did) - 1)
        ok = did[pos_c] == rid
        sel = np.nonzero(ok)[0]
        if sel.size == 0:
            return empty
        return pa.table(
            {
                # re-key on the SUP doc for the second join
                "doc_id": pa.array(rsup[sel], pa.string()),
                "sub_id": pa.array(rid[sel], pa.string()),
                "sub_text": dtext.take(pa.array(pos_c[sel], pa.int64())),
            }
        )

    cand_texts = copartition_two(
        cands,
        texts,
        "doc_id",
        j1_schema,
        lambda left, right: attach_sub_text(
            pa.table({"doc_id": left["doc_id"], "sup_id": left["sup_id"]}),
            pa.table({"doc_id": right["doc_id"], "text": right["text"]}),
        ),
    )

    # join 2: group by sup, build ONE suffix array per sup, probe subs
    j2_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("sub_id", pa.string()),
            ("sub_text", pa.string()),
            ("text", pa.string()),
        ]
    )
    out_schema = pa.schema(
        [
            ("id_sub", pa.string()),
            ("id_sup", pa.string()),
            ("len_sub", pa.int64()),
            ("len_sup", pa.int64()),
        ]
    )

    def verify(cand: pa.Table, doc: pa.Table) -> pa.Table:
        if cand.num_rows == 0 or doc.num_rows == 0:
            return out_schema.empty_table()
        did = doc["doc_id"].to_numpy(zero_copy_only=False)
        dtexts = _combine_col(doc["text"])
        order = np.argsort(did, kind="stable")
        did_s = did[order]
        cand = cand.sort_by([("doc_id", "ascending")])
        cid = cand["doc_id"].to_numpy(zero_copy_only=False)
        csub = cand["sub_id"].to_numpy(zero_copy_only=False)
        ctext = _combine_col(cand["sub_text"])
        o_sub, o_sup, o_ls, o_lp = [], [], [], []
        i = 0
        n = len(cid)
        while i < n:
            j = i
            while j < n and cid[j] == cid[i]:
                j += 1
            pos = np.searchsorted(did_s, cid[i])
            if pos < len(did_s) and did_s[pos] == cid[i]:
                sup_text = dtexts[int(order[pos])].as_py() or ""
                data = sup_text.encode()
                sa = suffixarray.build(data)  # ONE build per sup doc
                for r in range(i, j):
                    sub_text = ctext[r].as_py() or ""
                    if suffixarray.find(data, sa, sub_text.encode()) >= 0:
                        o_sub.append(str(csub[r]))
                        o_sup.append(str(cid[i]))
                        o_ls.append(len(sub_text))
                        o_lp.append(len(sup_text))
            i = j
        return pa.table(
            {
                "id_sub": pa.array(o_sub, pa.string()),
                "id_sup": pa.array(o_sup, pa.string()),
                "len_sub": pa.array(o_ls, pa.int64()),
                "len_sup": pa.array(o_lp, pa.int64()),
            }
        )

    return copartition_two(cand_texts, texts, "doc_id", j2_schema, verify)


def substring_doc_clusters(sf_dir):
    """Containment clusters (SQL-checked END-TO-END — candidates,
    suffix-array verification AND connected components all reproduced
    by the oracle): strict substring containment pairs
    (substring_dup_docs, guaranteed recall at >= 23 chars) treated as
    undirected duplicate edges -> connected components ->
    (image_id, cluster_id) with min-string-member labels; singletons
    keep their own id. The cluster-level twin of substring_dup_pairs,
    mirroring what doc_clusters is to minhash_doc_pairs."""
    from hmse_ray.stages import clustering

    docs = _docs(sf_dir, ["doc_id", "text"])
    edges = substring_dup_docs(docs).map_batches(
        lambda t: pa.table({"src": t["id_sub"], "dst": t["id_sup"]}),
        batch_format="pyarrow",
    )
    images = docs.map_batches(
        lambda t: pa.table({"image_id": pc.cast(t["doc_id"], pa.string())}),
        batch_format="pyarrow",
    )
    return clustering.cluster_from_edges(edges, images, CFG)


def substring_dup_pairs(sf_dir):
    """North-rule suffix-array substring matching over the documents
    table (SQL-checked: the oracle is an exact position() containment
    cross join; the Ray side's winnowing candidate generation has
    guaranteed recall for docs >= 23 chars — testdata minimum is 47)."""
    pairs = substring_dup_docs(_docs(sf_dir, ["doc_id", "text"]))
    return pairs.map_batches(
        lambda t: pa.table(
            {
                "id_sub": pc.cast(t["id_sub"], pa.int64()),
                "id_sup": pc.cast(t["id_sup"], pa.int64()),
                "len_sub": t["len_sub"],
                "len_sup": t["len_sup"],
            }
        ),
        batch_format="pyarrow",
    )


_IMG_CLUSTERS_CACHE: dict = {}


def _images_and_clusters(sf_dir):
    """Derived images table + cluster assignments, materialized ONCE per
    (ray session, sf_dir): store_kind_stats, roundtrip_invariant and
    image_clusters all consume the identical deterministic derivation,
    and the driver gate runs them back-to-back — the memo cuts ~2x
    clustering recompute (~15 s each at sf0.01) from the gate.

    Timing note (ADVICE r3): per-query BENCH timings of the three
    consumers exclude the shared derivation for all but the first
    caller; none of them is in bench.py's BENCH_QUERIES, so the
    headline record is unaffected. The cache key includes the ray
    session id, so a re-init in the same process cannot serve stale
    (dead-object-store) Datasets."""
    session = None
    if ray.is_initialized():  # key on runtime identity (ADVICE r3)
        try:
            session = ray.get_runtime_context().get_job_id()
        except Exception:
            session = id(ray.worker.global_worker)
    key = (session, sf_dir)
    if key not in _IMG_CLUSTERS_CACHE:
        from hmse_ray.pipelines import dedup
        from hmse_ray.sources import fixtures

        images = fixtures.images_from_documents_ds(sf_dir).materialize()
        clusters = dedup.cluster_assignments(images, CFG).materialize()
        _IMG_CLUSTERS_CACHE.clear()  # bound object-store pins; drop stale sessions
        _IMG_CLUSTERS_CACHE[key] = (images, clusters)
    return _IMG_CLUSTERS_CACHE[key]


def store_kind_stats_docs(sf_dir):
    """M7/A6 (rows-only IRREDUCIBLY: store payloads are zlib streams, so
    kind selection depends on DEFLATE output sizes DuckDB cannot
    compute; covered by pytest TestDelta/TestStore instead):
    full/pointer/delta store-kind histogram over
    the images-from-documents table — drives the store write path
    (stages/store.py) through the driver gate (VERDICT r01 item 4)."""
    from hmse_ray.stages import store as store_stage

    images, clusters = _images_and_clusters(sf_dir)
    st = store_stage.store_table(images, clusters, CFG)
    return store_stage.store_kind_stats(st).to_pandas().sort_values(
        "store_kind"
    ).reset_index(drop=True)


def roundtrip_invariant(sf_dir):
    """M8/M9/J3/J4 (rows-only IRREDUCIBLY: the roundtrip decompresses
    zlib payloads and computes PSNR over decoded pixels — not
    SQL-expressible; the invariant itself IS the check, pass counts are
    the output): store -> reconstruct -> per-row invariant
    (byte-exact captions, lossless pixels / PSNR >= 40 dB) over the
    images-from-documents table; one row of pass counts."""
    from hmse_ray.pipelines import verify as verify_pipe

    images, clusters = _images_and_clusters(sf_dir)
    agg = verify_pipe.roundtrip(images, clusters, CFG)
    return pd.DataFrame([agg])


def decode_resize_features(sf_dir):
    """Multimodal decode+resize actor-pool stage (SQL-checked since r4):
    images derived from documents (murmur3 pixels) -> fixed-size pixel
    feature rows with an integer checksum column. The oracle regenerates
    exactly the SAMPLED source pixels (nearest-neighbor grid 2*y, 2*x),
    applies the jpeg dequantization ((v//4)*4 + 1) for did%3==0 rows,
    and sums — integer end-to-end, so the decode -> resize path verifies
    bit-for-bit (VERDICT r3 item 4)."""
    from hmse_ray.sources import fixtures
    from hmse_ray.stages import multimodal

    images = fixtures.images_from_documents_ds(sf_dir)
    feats = multimodal.decode_resize_stage(images)

    def summarize(t: pa.Table) -> pa.Table:
        px = t["pixels"]
        if isinstance(px, pa.ChunkedArray):
            px = px.combine_chunks()
        k = px.type.list_size
        flat = np.asarray(px.values, dtype=np.int64).reshape(t.num_rows, k)
        return pa.table(
            {
                "image_id": t["image_id"],
                "out_w": pc.cast(t["out_w"], pa.int64()),
                "out_h": pc.cast(t["out_h"], pa.int64()),
                "pixel_sum": pa.array(flat.sum(axis=1), pa.int64()),
            }
        )

    return feats.map_batches(summarize, batch_format="pyarrow")


def jfif_roundtrip_psnr(sf_dir, every_n: int = 5):
    """REAL baseline-JPEG path (rows-only IRREDUCIBLY: the codec's
    float DCT/IDCT is not SQL-reproducible — that is exactly why the
    deterministic "jpeg" stand-in still exists for the hash-green
    decode_resize_features oracle; this query instead asserts the
    north-rule PSNR >= 40 dB invariant through the genuine lossy
    container): 1-in-``every_n`` images derived from documents ->
    decode -> re-encode as spec-compliant JFIF (functions/jpegcodec.py:
    T.81 markers, Annex K tables, Huffman entropy coding) -> decode ->
    PSNR vs source pixels. One row: n_images, n_psnr_ge_40 (== n_images
    at the default quality), min_psnr."""
    from hmse_ray.functions import imagecodec
    from hmse_ray.sources import fixtures

    images = fixtures.images_from_documents_ds(sf_dir)

    def roundtrip(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        # ids look like "img-doc00000015": sample on the trailing digits
        keep = [
            i for i, s in enumerate(ids)
            if int("".join(ch for ch in s if ch.isdigit()) or 0) % every_n == 0
        ]
        psnrs = []
        for i in keep:
            px = imagecodec.decode(
                t["bytes"][i].as_py(), t["w"][i].as_py(), t["h"][i].as_py(),
                t["fmt"][i].as_py(),
            )
            back = imagecodec.decode(
                imagecodec.encode(px, "jfif"), px.shape[1], px.shape[0], "jfif"
            )
            psnrs.append(imagecodec.psnr(px, back))
        p = np.array(psnrs, dtype=np.float64)
        return pa.table(
            {
                "psnr": pa.array(p, pa.float64()),
                "ok": pa.array((p >= 40.0).astype(np.int64), pa.int64()),
            }
        )

    agg = images.map_batches(roundtrip, batch_format="pyarrow").aggregate(
        Count(alias_name="n_images"),
        Sum("ok", alias_name="n_psnr_ge_40"),
        Min("psnr", alias_name="min_psnr"),
    )
    return pd.DataFrame(
        [
            {
                "n_images": int(agg["n_images"]),
                "n_psnr_ge_40": int(agg["n_psnr_ge_40"]),
                "min_psnr": round(float(agg["min_psnr"]), 2),
            }
        ]
    )


def audio_features(sf_dir):
    """Audio path (SQL-checked): WAV clips derived in-stream from
    documents -> pure-numpy RIFF/PCM16 decode fused with the per-clip
    feature reduction inside the actor (features_only — the decoded
    waveform never crosses the object store, VERDICT r3 item 7; value
    parity with the two-stage decode -> features path is pinned by
    test_audio_fused_matches_two_stage). The waveform is
    murmur3-generated, so DuckDB regenerates it bit-for-bit and the
    integer sum-of-squares makes rms/duration IEEE-identical on both
    sides."""
    from hmse_ray.sources import fixtures
    from hmse_ray.stages import multimodal

    clips = fixtures.audio_from_documents_ds(sf_dir)
    fused = multimodal.audio_decode_stage(clips, features_only=True)
    return fused.to_pandas().sort_values("clip_id").reset_index(drop=True)


def audio_features_two_stage(sf_dir):
    """The explicit two-stage shape (decode stage's samples contract ->
    separate vectorized reduction); kept for the parity test and for
    consumers that need the waveform column."""
    from hmse_ray.sources import fixtures
    from hmse_ray.stages import multimodal

    clips = fixtures.audio_from_documents_ds(sf_dir)
    dec = multimodal.audio_decode_stage(clips)

    def feats(t: pa.Table) -> pa.Table:
        col = t["samples"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        values = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.diff(offs)
        if values.size:
            # fixture clips are never empty (n >= 800), so reduceat
            # segments are all non-degenerate
            sum_sq = np.add.reduceat(values * values, offs[:-1])
            peak = np.maximum.reduceat(np.abs(values), offs[:-1])
        else:
            sum_sq = np.zeros(n.size, np.int64)
            peak = np.zeros(n.size, np.int64)
        from hmse_ray.functions import audiocodec

        return audiocodec.feature_table(
            t["clip_id"], n, sum_sq, peak,
            t["sample_rate"].to_numpy(zero_copy_only=False),
            t["n_channels"].to_numpy(zero_copy_only=False),
        )

    return (
        dec.map_batches(feats, batch_format="pyarrow")
        .to_pandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )


def video_frame_stats(sf_dir, every_n: int = 4):
    """Video path (SQL-checked): HVID frame-concat videos derived
    in-stream from documents -> header-seek frame sampling (actor pool,
    1-in-N fan-out) -> per-video luma stats. Frames are
    murmur3-generated, so the oracle regenerates the sampled pixels and
    the integer luma sum verifies bit-for-bit."""
    from hmse_ray.sources import fixtures
    from hmse_ray.stages import multimodal
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    videos = fixtures.video_from_documents_ds(sf_dir)
    frames = multimodal.video_frame_stage(videos, every_n=every_n)

    def part(t: pa.Table) -> pa.Table:
        pix = t["pixels"]
        if isinstance(pix, pa.ChunkedArray):
            pix = pix.combine_chunks()
        # zero-copy: offsets index the shared values buffer directly
        # (no per-row Python join — VERDICT r3 minor 5); slice+rebase so
        # reduceat's open-ended last segment cannot overrange a shared
        # buffer. Frames are never empty (w*h bytes), so every reduceat
        # segment is non-degenerate.
        raw_offs = np.frombuffer(pix.buffers()[1], np.int32)
        offs = raw_offs[pix.offset : pix.offset + len(pix) + 1].astype(np.int64)
        if len(offs) > 1 and offs[-1] > offs[0]:
            data = np.frombuffer(pix.buffers()[2], np.uint8)[offs[0]:offs[-1]]
            luma = np.add.reduceat(data.astype(np.int64), offs[:-1] - offs[0])
        else:
            luma = np.zeros(max(0, len(offs) - 1), np.int64)
        df = pd.DataFrame(
            {
                "video_id": t["video_id"].to_pylist(),
                "n_frames": t["n_frames"].to_numpy(zero_copy_only=False),
                "w": t["w"].to_numpy(zero_copy_only=False),
                "h": t["h"].to_numpy(zero_copy_only=False),
                "luma": luma,
            }
        )
        g = df.groupby("video_id", as_index=False).agg(
            n_frames=("n_frames", "first"),
            n_sampled=("luma", "size"),
            w=("w", "first"),
            h=("h", "first"),
            sum_luma=("luma", "sum"),
        )
        g["mean_luma"] = g["sum_luma"] / (g["n_sampled"] * g["w"] * g["h"])
        return pa.table(
            {
                "video_id": pa.array(g["video_id"], pa.string()),
                "n_frames": pa.array(g["n_frames"], pa.int64()),
                "n_sampled": pa.array(g["n_sampled"], pa.int64()),
                "w": pa.array(g["w"], pa.int64()),
                "h": pa.array(g["h"], pa.int64()),
                "sum_luma": pa.array(g["sum_luma"], pa.int64()),
                "mean_luma": pa.array(g["mean_luma"], pa.float64()),
            }
        )

    stats = hash_partitioned_groupby_arrow(frames, "video_id", part)
    return stats.to_pandas().sort_values("video_id").reset_index(drop=True)


def lsh_hit_rate(sf_dir):
    """A3 (SQL-checked): LSH candidate vs verified-match counts over the
    documents table at the reference banding config."""
    from hmse_ray.stages import lsh, signatures as sig_stage

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: pa.table(
            {"image_id": pc.cast(t["doc_id"], pa.string()), "caption": t["text"]}
        ),
        batch_format="pyarrow",
    )
    mh = sig_stage.minhash_stage(docs, CFG)
    return lsh.similarity_hit_rate(mh, CFG)


def random_pair_jaccard_hist(sf_dir, n_bins: int = 10):
    """O2 (SQL-checked): seeded random document pairs -> Jaccard-estimate
    histogram for LSH calibration (README.md:2319-2324). Pairing is
    deterministic: doc i with doc i+N/2 after a seeded shuffle.

    Partitioned like its exact twin (VERDICT r4 item 2 — the previous
    version collected the full signature table on the driver): the
    pairing map is built by one tiny task from a NARROW doc_id scan and
    broadcast; each batch signs only its paired docs and tags rows
    (pair_id, side, minhash); pair intersections + per-partition
    histograms run hash-partitioned by pair_id; the driver only sums
    P x n_bins histogram rows. No task or driver ever holds the
    signature table."""
    from hmse_ray.functions import minhash as mh_fn, murmur3
    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    docs = _docs(sf_dir, ["doc_id", "text"])
    id_refs = docs.map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow",
    ).to_arrow_refs()

    @ray.remote
    def build_pairing(*tables):
        ids = np.unique(pa.concat_tables(tables)["doc_id"].to_numpy())
        hm = murmur3.murmur3_u32(ids.astype(np.uint32), CFG.sample_seed)
        order = np.lexsort((ids, hm))
        half = len(order) // 2
        pid = np.full(ids.size, -1, dtype=np.int64)
        side = np.zeros(ids.size, dtype=np.int8)
        pid[order[:half]] = np.arange(half)
        pid[order[half : 2 * half]] = np.arange(half)
        side[order[half : 2 * half]] = 1
        return ids, pid, side

    mapping_ref = build_pairing.remote(*id_refs)
    nh = CFG.num_hashes

    def sign_tag(t: pa.Table) -> pa.Table:
        ids_arr, pid, side = ray.get(mapping_ref)
        d = pc.cast(t["doc_id"], pa.int64()).to_numpy()
        pos = np.searchsorted(ids_arr, d)
        pos[pos == ids_arr.size] = 0
        keep = np.flatnonzero((ids_arr[pos] == d) & (pid[pos] >= 0))
        sel = t.take(keep)
        sigs = mh_fn.signatures(
            [x.encode() for x in sel["text"].to_pylist()], CFG)
        return pa.table(
            {
                "pair_id": pa.array(pid[pos[keep]], pa.int64()),
                "side": pa.array(side[pos[keep]], pa.int8()),
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.ravel(), pa.uint32()), nh
                ),
            }
        )

    bins_lo = np.round(np.arange(n_bins) / n_bins, 2)

    def part_hist(t: pa.Table) -> pa.Table:
        t = t.sort_by([("pair_id", "ascending"), ("side", "ascending")])
        pids = t["pair_id"].to_numpy()
        counts = np.zeros(n_bins, dtype=np.int64)
        n = pids.size
        if n:
            M = np.asarray(_combine_col(t["minhash"]).flatten()).reshape(n, nh)
            new = np.empty(n, dtype=bool)
            new[0] = True
            new[1:] = pids[1:] != pids[:-1]
            starts = np.nonzero(new)[0]
            sizes = np.diff(np.append(starts, n))
            full = starts[sizes == 2]  # both sides present (always here)
            if full.size:
                est = (M[full] == M[full + 1]).mean(axis=1)
                hist, _ = np.histogram(est, bins=n_bins, range=(0.0, 1.0))
                counts += hist.astype(np.int64)
        return pa.table(
            {
                "bin_lo": pa.array(bins_lo, pa.float64()),
                "n_pairs": pa.array(counts, pa.int64()),
            }
        )

    tagged = docs.map_batches(sign_tag, batch_format="pyarrow")
    parts = hash_partitioned_groupby_arrow(tagged, "pair_id", part_hist)
    # per-partition histograms are n_bins rows each — summing
    # driver-side is P x n_bins tiny rows, cheaper than a second shuffle
    return (
        parts.to_pandas()
        .groupby("bin_lo", as_index=False)["n_pairs"]
        .sum()
        .sort_values("bin_lo")
        .reset_index(drop=True)
    )


def random_pair_true_jaccard_hist(sf_dir, n_bins: int = 10):
    """O2 twin (SQL-checked): EXACT 4-gram Jaccard histogram over the
    same murmur-ranked deterministic pairs — cross-validates the
    MinHash estimator histogram (pytest asserts est~true) and gives O2
    an oracle row. Sets + pairing + histogram all run in Ray tasks; the
    driver sees only the 10-bin result."""
    from hmse_ray.functions import murmur3

    docs = _docs(sf_dir, ["doc_id", "text"])

    def shingle_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        out_sh, out_id = [], []
        for i, txt in enumerate(t["text"].to_pylist()):
            sh = textstats.char_ngram_set(txt or "")
            out_sh.append(sh.astype(np.int64))
            out_id.append(np.full(sh.size, ids[i], dtype=np.int64))
        return pa.table(
            {
                "shingle": pa.array(np.concatenate(out_sh), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
            }
        )

    # Pairing needs only the set of shingle-bearing doc ids (a doc has a
    # byte 4-gram iff encoded length >= 4) — a narrow scan, then one tiny task
    # builds the broadcast doc_id -> (pair_id, side) mapping. The pair
    # intersections themselves are hash-partitioned by pair_id across
    # tasks (VERDICT r02 item 5: the previous version ran all n/2
    # intersections serially in ONE remote task).
    id_refs = docs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()).take(
                    np.flatnonzero(
                        pc.binary_length(pc.coalesce(t["text"], pa.scalar(""))).to_numpy(
                            zero_copy_only=False
                        )
                        >= 4
                    )
                )
            }
        ),
        batch_format="pyarrow",
    ).to_arrow_refs()

    @ray.remote
    def build_pairing(*tables):
        ids = np.unique(pa.concat_tables(tables)["doc_id"].to_numpy())
        hm = murmur3.murmur3_u32(ids.astype(np.uint32), CFG.sample_seed)
        order = np.lexsort((ids, hm))
        half = len(order) // 2
        pid = np.full(ids.size, -1, dtype=np.int64)
        side = np.zeros(ids.size, dtype=np.int8)
        pid[order[:half]] = np.arange(half)
        pid[order[half : 2 * half]] = np.arange(half)
        side[order[half : 2 * half]] = 1
        return ids, pid, side  # ids sorted ascending -> searchsorted probe

    mapping_ref = build_pairing.remote(*id_refs)

    def tag(t: pa.Table) -> pa.Table:
        ids_arr, pid, side = ray.get(mapping_ref)
        d = t["doc_id"].to_numpy()
        pos = np.searchsorted(ids_arr, d)
        pos[pos == ids_arr.size] = 0
        keep = np.flatnonzero((ids_arr[pos] == d) & (pid[pos] >= 0))
        return pa.table(
            {
                "shingle": t["shingle"].take(keep),
                "pair_id": pa.array(pid[pos[keep]], pa.int64()),
                "side": pa.array(side[pos[keep]], pa.int8()),
            }
        )

    bins_lo = np.round(np.arange(n_bins) / n_bins, 2)

    def part_hist(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [("pair_id", "ascending"), ("side", "ascending"), ("shingle", "ascending")]
        )
        pids = t["pair_id"].to_numpy()
        sides = t["side"].to_numpy()
        svals = t["shingle"].to_numpy()
        counts = np.zeros(n_bins, dtype=np.int64)
        n = pids.size
        if n:
            new = np.empty(n, dtype=bool)
            new[0] = True
            new[1:] = pids[1:] != pids[:-1]
            starts = np.append(np.nonzero(new)[0], n)
            for g in range(starts.size - 1):
                lo, hi = starts[g], starts[g + 1]
                split = lo + int(np.count_nonzero(sides[lo:hi] == 0))
                sa, sb = svals[lo:split], svals[split:hi]
                if sb.size < sa.size:
                    sa, sb = sb, sa
                inter = 0
                if sa.size:
                    idx = np.searchsorted(sb, sa)
                    idx[idx == sb.size] = 0
                    inter = int(np.count_nonzero(sb[idx] == sa))
                j = inter / max(1, sa.size + sb.size - inter)
                counts[min(int(j * n_bins), n_bins - 1)] += 1
        return pa.table(
            {
                "bin_lo": pa.array(bins_lo, pa.float64()),
                "n_pairs": pa.array(counts, pa.int64()),
            }
        )

    from hmse_ray.stages.aggregates import hash_partitioned_groupby_arrow

    tagged = docs.map_batches(shingle_rows, batch_format="pyarrow").map_batches(
        tag, batch_format="pyarrow"
    )
    parts = hash_partitioned_groupby_arrow(tagged, "pair_id", part_hist)
    # per-partition histograms are 10 rows each — summing driver-side is
    # P x 10 tiny rows, cheaper than a second shuffle
    out = (
        parts.to_pandas()
        .groupby("bin_lo", as_index=False)["n_pairs"]
        .sum()
        .sort_values("bin_lo")
        .reset_index(drop=True)
    )
    return out


def image_clusters(sf_dir):
    """Flagship (rows-only IRREDUCIBLY: the image half clusters via
    SimHash over FLOAT luma/projection dot products — numpy's pairwise
    summation order is not reproducible in SQL, so sign bits near zero
    could flip between engines; the caption-LSH half of the same
    machinery IS hash-verified via doc_clusters/minhash_doc_pairs, and
    the pixel path via decode_resize_features): image+caption table
    derived (STREAMING, inside map_batches) from documents -> full dedup
    cluster assignment. Shares the per-session memo with the
    store/verify queries."""
    return _images_and_clusters(sf_dir)[1]


# ------------------------------------------------------------------ oracles

# --- murmur3-in-SQL oracle builder -----------------------------------------
# murmur3_x86_32 of a 4-byte key is pure integer arithmetic, so it IS
# SQL-expressible: a generated CTE chain of masked uint32 steps (HUGEINT
# for the 32x32-bit multiplies). This lets DuckDB reproduce the
# winnowing fingerprints and the murmur-planted embedding perturbations
# bit-for-bit instead of downgrading those queries to rows-only checks.

_MM_MASK = 4294967296  # 2^32


def _mm_chain_sql(src_cte: str, carry: list[str], cols: dict[str, tuple[str, int]],
                  prefix: str) -> tuple[str, str]:
    """CTE chain computing murmur3_u32(key_expr, seed) per output col.

    cols: out_name -> (key_expr, seed). Returns (cte_text, last_cte).
    Mirrors functions/murmur3.py murmur3_u32 step for step.
    """
    M = _MM_MASK
    C1, C2 = 0xCC9E2D51, 0x1B873593
    F1, F2, NC = 0x85EBCA6B, 0xC2B2AE35, 0xE6546B64
    steps: list[dict[str, str]] = [
        # premix: k *= C1
        {o: f"CAST((CAST(({k}) AS HUGEINT) * {C1}) % {M} AS BIGINT)"
         for o, (k, _) in cols.items()},
        # rotl15, k *= C2
        {o: f"CAST((CAST((({o} * 32768) % {M}) | ({o} // 131072) AS HUGEINT)"
            f" * {C2}) % {M} AS BIGINT)" for o in cols},
        # h = seed^k; rotl13; h*5+N
        {o: f"(((xor({s}, {o}) * 8192) % {M} | (xor({s}, {o}) // 524288))"
            f" * 5 + {NC}) % {M}" for o, (_, s) in cols.items()},
        # finalize(len=4): h^=4; h^=h>>16; h*=F1
        {o: f"CAST((CAST(xor(xor({o}, 4), xor({o}, 4) // 65536) AS HUGEINT)"
            f" * {F1}) % {M} AS BIGINT)" for o in cols},
        # h^=h>>13; h*=F2
        {o: f"CAST((CAST(xor({o}, {o} // 8192) AS HUGEINT) * {F2}) % {M} AS BIGINT)"
         for o in cols},
        # h^=h>>16
        {o: f"xor({o}, {o} // 65536)" for o in cols},
    ]
    parts = []
    prev = src_cte
    for i, step in enumerate(steps, 1):
        sel = ", ".join(carry + [f"{e} AS {o}" for o, e in step.items()])
        parts.append(f"m{prefix}{i} AS (SELECT {sel} FROM {prev})")
        prev = f"m{prefix}{i}"
    return ", ".join(parts), prev


def _audio_features_sql() -> str:
    """DuckDB mirror of the audio pipeline: regenerate the murmur3
    waveform per (doc, sample index) and aggregate — sum of squares is
    integer, so rms/peak/duration match the Ray side bit-for-bit."""
    from hmse_ray.sources import fixtures as fx

    key = (
        f"CAST((CAST(doc_id AS HUGEINT) * {fx._KEY_MUL} + i) % {_MM_MASK} AS BIGINT)"
    )
    ctes, last = _mm_chain_sql("k", ["doc_id", "n"], {"h": (key, fx.AUDIO_SEED)}, "au")
    return f"""
        WITH base AS (
          SELECT doc_id, 800 + (strlen(text) * 7) % 3200 AS n
          FROM documents WHERE doc_id % {fx.AUDIO_DOC_MOD} = 0
        ), k AS (
          SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM base
        ), {ctes}, samp AS (
          SELECT doc_id, n, (h % 16384) - 8192 AS s FROM {last}
        ), agg AS (
          SELECT doc_id, n, sum(s * s) AS sum_sq, max(abs(s)) AS peak
          FROM samp GROUP BY doc_id, n
        )
        SELECT 'aud' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS clip_id,
               n AS n_samples,
               {fx.AUDIO_RATE} AS sample_rate,
               n * 1000.0 / {fx.AUDIO_RATE} AS duration_ms,
               sqrt(sum_sq / n) AS rms,
               peak
        FROM agg
    """


def _video_frame_stats_sql(every_n: int = 4) -> str:
    """DuckDB mirror of the video pipeline: regenerate the murmur3
    pixels of every SAMPLED frame (same 1-in-N rule) and aggregate the
    integer luma sum."""
    from hmse_ray.sources import fixtures as fx

    npx = fx.VIDEO_W * fx.VIDEO_H
    key = (
        f"CAST((CAST(doc_id AS HUGEINT) * {fx._KEY_MUL} + fi * {fx._FRAME_MUL}"
        f" + p) % {_MM_MASK} AS BIGINT)"
    )
    ctes, last = _mm_chain_sql(
        "px", ["doc_id", "nf", "fi"], {"h": (key, fx.VIDEO_SEED)}, "vf"
    )
    return f"""
        WITH base AS (
          SELECT doc_id, 8 + strlen(text) % 25 AS nf
          FROM documents WHERE doc_id % {fx.VIDEO_DOC_MOD} = 0
        ), fr AS (
          SELECT doc_id, nf, unnest(generate_series(0, nf - 1, {every_n})) AS fi
          FROM base
        ), px AS (
          SELECT doc_id, nf, fi, unnest(generate_series(0, {npx - 1})) AS p FROM fr
        ), {ctes}, samp AS (
          SELECT doc_id, nf, fi, h % 256 AS v FROM {last}
        ), agg AS (
          SELECT doc_id, nf, count(DISTINCT fi) AS n_sampled,
                 CAST(sum(v) AS BIGINT) AS sum_luma
          FROM samp GROUP BY doc_id, nf
        )
        SELECT 'vid' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS video_id,
               nf AS n_frames, n_sampled,
               {fx.VIDEO_W} AS w, {fx.VIDEO_H} AS h, sum_luma,
               sum_luma / (n_sampled * {npx}) AS mean_luma
        FROM agg
    """


def _decode_resize_sql(out_w: int = 32, out_h: int = 24) -> str:
    """DuckDB mirror of decode_resize_features: regenerate ONLY the
    source pixels the nearest-neighbor resize actually samples
    (y*step_y, x*step_x), apply the jpeg stand-in dequantization for
    did%3==0 rows, and sum — integer end-to-end. Exact-dup ('x') and
    caption-variant ('v') rows share their base doc's pixels."""
    from hmse_ray.sources import fixtures as fx

    W, H = fx.IMG_W, fx.IMG_H
    step_y, step_x = H // out_h, W // out_w
    key = f"CAST((CAST(doc_id AS HUGEINT) * {fx._KEY_MUL} + p) % {_MM_MASK} AS BIGINT)"
    ctes, last = _mm_chain_sql("px", ["doc_id"], {"h": (key, fx.IMG_SEED)}, "ir")
    return f"""
        WITH oy AS (
          SELECT doc_id, unnest(generate_series(0, {out_h - 1})) AS y FROM documents
        ), oxy AS (
          SELECT doc_id, y, unnest(generate_series(0, {out_w - 1})) AS x FROM oy
        ), px AS (
          SELECT doc_id,
                 ((y * {step_y}) * {W} + x * {step_x}) * 3
                   + unnest(generate_series(0, 2)) AS p
          FROM oxy
        ), {ctes}, samp AS (
          SELECT doc_id, h % 256 AS v FROM {last}
        ), agg AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN doc_id % 3 = 0 THEN (v // 4) * 4 + 1
                               ELSE v END) AS BIGINT) AS pixel_sum
          FROM samp GROUP BY doc_id
        ), img_rows AS (
          SELECT doc_id, '' AS sfx FROM documents
          UNION ALL SELECT doc_id, 'x' FROM documents WHERE doc_id % 7 = 0
          UNION ALL SELECT doc_id, 'v' FROM documents WHERE doc_id % 11 = 0
        )
        SELECT 'doc' || lpad(CAST(r.doc_id AS VARCHAR), 8, '0') || r.sfx AS image_id,
               {out_w} AS out_w, {out_h} AS out_h, a.pixel_sum
        FROM img_rows r JOIN agg a ON a.doc_id = r.doc_id
    """


def _winnow_fingerprint_sql() -> str:
    """DuckDB mirror of textstats.doc_fingerprint64 (k=8, window=16).

    ascii() byte access assumes single-byte text (testdata is ASCII;
    python hashes raw bytes). Docs shorter than 8 bytes (python NUL-pads)
    are not covered — testdata minimum is 48 chars.
    """
    ctes, last = _mm_chain_sql(
        "w", ["doc_id", "p"], {"h0": ("w0", 24301), "h4": ("w4", 24305)}, "f"
    )
    return f"""
        WITH pos AS (
          SELECT doc_id, text, unnest(generate_series(1, length(text) - 7)) AS p
          FROM documents
        ), w AS (
          SELECT doc_id, p,
            ascii(substr(text, CAST(p AS INT), 1))
              + ascii(substr(text, CAST(p + 1 AS INT), 1)) * 256
              + ascii(substr(text, CAST(p + 2 AS INT), 1)) * 65536
              + ascii(substr(text, CAST(p + 3 AS INT), 1)) * 16777216 AS w0,
            ascii(substr(text, CAST(p + 4 AS INT), 1))
              + ascii(substr(text, CAST(p + 5 AS INT), 1)) * 256
              + ascii(substr(text, CAST(p + 6 AS INT), 1)) * 65536
              + ascii(substr(text, CAST(p + 7 AS INT), 1)) * 16777216 AS w4
          FROM pos
        ), {ctes}, hp AS (
          SELECT doc_id, p, xor(h0, h4) AS h FROM {last}
        ), counts AS (
          SELECT doc_id, count(*) AS np FROM hp GROUP BY doc_id
        ), wm AS (
          SELECT h.doc_id, h.p, c.np,
                 min(h.h) OVER (PARTITION BY h.doc_id ORDER BY h.p
                                ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS mn
          FROM hp h JOIN counts c USING (doc_id)
        ), sel AS (
          SELECT doc_id, mn FROM wm WHERE np > 16 AND p <= np - 15
          UNION ALL
          SELECT doc_id, min(mn) AS mn FROM wm WHERE np <= 16 GROUP BY doc_id
        ), dist AS (
          SELECT DISTINCT doc_id, mn FROM sel
        )
        SELECT doc_id, count(*) * {_MM_MASK} + bit_xor(mn) AS fingerprint
        FROM dist GROUP BY doc_id
    """


def _embedding_near_dups_sql() -> str:
    """DuckDB mirror of embedding_near_dups: murmur-planted near-dup
    vectors (float32-cast like the arrow list<float> schema), all-pairs
    cosine >= 0.98 over originals + planted. The LSH-bucketed pipeline
    finds the same pairs (planted cosine ~0.9995 -> band collision
    probability 1 - 3e-6); no natural pairs reach 0.98 in testdata.
    """
    ctes, last = _mm_chain_sql(
        "sd", ["vec_id", "j", "xn"], {"hu": ("sd.seed", 53751)}, "p"
    )
    return f"""
        WITH be AS (
          SELECT vec_id,
                 unnest(generate_series(1, len(embedding))) - 1 AS j,
                 unnest(embedding) AS x
          FROM embeddings
        ), n1 AS (
          SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
          FROM be GROUP BY vec_id
        ), vn AS (
          SELECT b.vec_id, j, CAST(x AS DOUBLE) / greatest(nrm, 1e-30) AS xn
          FROM be b JOIN n1 USING (vec_id)
        ), sd AS (
          SELECT vec_id, j, xn, (vec_id * 64 + j) % {_MM_MASK} AS seed
          FROM vn WHERE vec_id % 20 = 0
        ), {ctes}, u0 AS (
          SELECT vec_id, j, xn, CAST(hu AS DOUBLE) / 2147483648 - 1.0 AS u
          FROM {last}
        ), nu AS (
          SELECT vec_id, sqrt(sum(u * u)) AS unrm FROM u0 GROUP BY vec_id
        ), planted AS (
          SELECT u0.vec_id + 1000000000 AS vec_id, j,
                 CAST(CAST(xn + 0.03 * (u / greatest(unrm, 1e-30)) AS FLOAT)
                      AS DOUBLE) AS x
          FROM u0 JOIN nu USING (vec_id)
        ), allv AS (
          SELECT vec_id, j, CAST(x AS DOUBLE) AS x FROM be
          UNION ALL SELECT vec_id, j, x FROM planted
        ), n2 AS (
          SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM allv GROUP BY vec_id
        ), nv AS (
          SELECT a.vec_id, j, x / greatest(nrm, 1e-30) AS xn
          FROM allv a JOIN n2 USING (vec_id)
        ), dots AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.xn * b.xn) AS cosine
          FROM nv a JOIN nv b ON a.j = b.j AND a.vec_id < b.vec_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, round(cosine, 6) AS cosine FROM dots WHERE cosine >= 0.98
    """


def _random_pair_true_jaccard_hist_sql() -> str:
    """DuckDB mirror of random_pair_true_jaccard_hist: murmur3 rank
    pairing (CTE chain) + byte-4-gram Jaccard per pair + 10-bin
    histogram with empty bins kept."""
    ctes, last = _mm_chain_sql(
        "mr0", ["doc_id"], {"hm": ("mr0.key", int(CFG.sample_seed))}, "r"
    )
    return f"""
        WITH mr0 AS (
          SELECT doc_id, doc_id % {_MM_MASK} AS key FROM documents
        ), {ctes}, ordd AS (
          SELECT doc_id, row_number() OVER (ORDER BY hm, doc_id) - 1 AS r
          FROM {last}
        ), cnt AS (
          SELECT count(*) // 2 AS half FROM documents
        ), pairs AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb
          FROM ordd a
          JOIN ordd b ON b.r = a.r + (SELECT half FROM cnt)
          WHERE a.r < (SELECT half FROM cnt)
        ), pos AS (
          SELECT doc_id, hex(encode(text)) AS th,
                 unnest(generate_series(1, greatest(octet_length(encode(text)) - 3, 1))) AS i
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id, substr(th, CAST((i - 1) * 2 + 1 AS INT), 8) AS g
          FROM pos
        ), card AS (
          SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT p.ida, p.idb, count(*) AS cnt
          FROM pairs p
          JOIN sh s1 ON s1.doc_id = p.ida
          JOIN sh s2 ON s2.doc_id = p.idb AND s2.g = s1.g
          GROUP BY 1, 2
        ), pj AS (
          SELECT p.ida,
                 coalesce(i.cnt, 0) / (ca.c + cb.c - coalesce(i.cnt, 0)) AS j
          FROM pairs p
          LEFT JOIN inter i ON i.ida = p.ida AND i.idb = p.idb
          JOIN card ca ON ca.doc_id = p.ida
          JOIN card cb ON cb.doc_id = p.idb
        ), bins AS (
          SELECT unnest(generate_series(0, 9)) AS b
        )
        SELECT round(b / 10.0, 2) AS bin_lo,
               CAST(coalesce(cntp, 0) AS BIGINT) AS n_pairs
        FROM bins LEFT JOIN (
          SELECT least(CAST(floor(j * 10) AS INT), 9) AS b, count(*) AS cntp
          FROM pj GROUP BY 1
        ) h USING (b)
    """


def _minhash_ctes(num_bands: int, rows_per_band: int,
                  src: str = "documents") -> str:
    """Shared CTE text reproducing the engine's MinHash stack in SQL:
    byte-4-gram shingles -> murmur3 premix -> per-seed min (the 128-u32
    signature) -> splitmix64 band fold (recursive CTE threading the
    64-bit state with the multiply split into 32-bit halves to stay
    inside INT128) -> (band, hash) buckets. Callers append star-edge /
    verification SELECTs. ascii() assumes single-byte text. ``src``
    names the (doc_id, text) relation to sign — default the documents
    view; the incremental near-dup oracle passes a planted-corpus CTE."""
    M = _MM_MASK
    M64 = 18446744073709551616
    H63 = 9223372036854775808
    C1, C2 = 0xCC9E2D51, 0x1B873593
    F1, F2, NC = 0x85EBCA6B, 0xC2B2AE35, 0xE6546B64
    mul_hi, mul_lo = 0x9E3779B9, 0x7F4A7C15  # splitmix64 constant halves
    bseed = 0x9747B28C
    base = int(CFG.minhash_seed_base)
    nh = int(CFG.num_hashes)
    k1 = f"CAST((CAST(w AS HUGEINT) * {C1}) % {M} AS BIGINT)"
    k2 = f"((({k1}) * 32768) % {M} | (({k1}) // 131072))"
    premix = f"CAST((CAST(({k2}) AS HUGEINT) * {C2}) % {M} AS BIGINT)"
    return f"""
        pos AS (
          SELECT doc_id, text,
                 unnest(generate_series(1, greatest(length(text) - 3, 1))) AS q
          FROM {src}
        ), sw AS MATERIALIZED (
          SELECT DISTINCT doc_id,
            CAST(ascii(substr(text, CAST(q AS INT), 1)) AS BIGINT)
              + CAST(ascii(substr(text, CAST(q + 1 AS INT), 1)) AS BIGINT) * 256
              + CAST(ascii(substr(text, CAST(q + 2 AS INT), 1)) AS BIGINT) * 65536
              + CAST(ascii(substr(text, CAST(q + 3 AS INT), 1)) AS BIGINT) * 16777216
              AS w
          FROM pos
        ), pm AS MATERIALIZED (
          SELECT doc_id, {premix} AS k3 FROM sw
        ), uk AS MATERIALIZED (
          SELECT DISTINCT k3 FROM pm
        ), um AS MATERIALIZED (
          -- murmur tail as NESTED DERIVED TABLES (each step evaluated once
          -- per row) over globally-distinct premixed keys x seeds; the
          -- inline-expression form duplicates the op chain ~16x and was the
          -- round-2 driver-gate timeout (28s -> 2s at sf0.001).
          SELECT k3, seed, xor(t5, t5 // 65536) AS m FROM (
            SELECT k3, seed,
                   CAST((CAST(t4 AS HUGEINT) * {F2}) % {M} AS BIGINT) AS t5
            FROM (
              SELECT k3, seed, xor(t3, t3 // 8192) AS t4 FROM (
                SELECT k3, seed,
                       CAST((CAST(t2 AS HUGEINT) * {F1}) % {M} AS BIGINT) AS t3
                FROM (
                  SELECT k3, seed, xor(t1, t1 // 65536) AS t2 FROM (
                    SELECT k3, seed, xor((r1 * 5 + {NC}) % {M}, 4) AS t1 FROM (
                      SELECT k3, seed,
                             (x1 * 8192) % {M} | (x1 // 524288) AS r1
                      FROM (
                        SELECT k3, seed, xor(seed, k3) AS x1
                        FROM uk, (SELECT unnest(generate_series({base},
                               {base + nh - 1})) AS seed) sd
                      )
                    )
                  )
                )
              )
            )
          )
        ), sigs AS MATERIALIZED (
          SELECT p.doc_id, u.seed, min(u.m) AS m
          FROM pm p JOIN um u ON u.k3 = p.k3
          GROUP BY 1, 2
        ), fold(doc_id, band, j, h) AS (
          SELECT DISTINCT doc_id, bb.b, CAST(0 AS BIGINT), CAST({bseed} AS BIGINT)
          FROM sw, (SELECT unnest(generate_series(0, {num_bands - 1})) AS b) bb
          UNION ALL
          SELECT doc_id, band, j + 1, xor(h2, CAST(u2 // 536870912 AS BIGINT))
          FROM (
            SELECT doc_id, band, j, h2,
                   CASE WHEN h2 < 0 THEN CAST(h2 AS HUGEINT) + {M64}
                        ELSE CAST(h2 AS HUGEINT) END AS u2
            FROM (
              SELECT doc_id, band, j,
                     CAST(CASE WHEN m1 >= {H63} THEN m1 - {M64} ELSE m1 END
                          AS BIGINT) AS h2
              FROM (
                SELECT doc_id, band, j,
                       ((u1 * {mul_lo}) % {M64}
                        + (((u1 % {M}) * {mul_hi}) % {M}) * {M}) % {M64} AS m1
                FROM (
                  SELECT doc_id, band, j,
                         CASE WHEN x1 < 0 THEN CAST(x1 AS HUGEINT) + {M64}
                              ELSE CAST(x1 AS HUGEINT) END AS u1
                  FROM (
                    SELECT f.doc_id AS doc_id, f.band AS band, f.j AS j,
                           xor(f.h, s.m) AS x1
                    FROM fold f JOIN sigs s
                      ON s.doc_id = f.doc_id
                     AND s.seed = {base} + f.band * {rows_per_band} + f.j
                    WHERE f.j < {rows_per_band}
                  )
                )
              )
            )
          )
        ), bh AS MATERIALIZED (
          SELECT CAST(doc_id AS VARCHAR) AS sid, band, h AS bv
          FROM fold WHERE j = {rows_per_band}
        )"""


def _minhash_doc_pairs_sql() -> str:
    """DuckDB mirror of minhash_doc_pairs (TEXT_CFG banding): star
    edges per (band, hash) bucket with min-string-id reps, verified by
    signature-equality estimate >= jaccard_threshold. The Ray side
    pins num_salts=1, so the unsalted edge shape this oracle reproduces
    is guaranteed, not assumed (ADVICE r3)."""
    thr = CFG.jaccard_threshold
    nh = int(CFG.num_hashes)
    return f"""
        WITH RECURSIVE {_minhash_ctes(TEXT_CFG.num_bands, TEXT_CFG.rows_per_band)},
        reps AS (
          SELECT band, bv, min(sid) AS rid FROM bh GROUP BY 1, 2
        ), cand AS (
          SELECT DISTINCT r.rid AS id_a, m.sid AS id_b
          FROM reps r
          JOIN bh m ON m.band = r.band AND m.bv = r.bv AND m.sid <> r.rid
        ), est AS (
          SELECT c.id_a, c.id_b,
                 sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) / {nh}.0
                   AS jaccard_est
          FROM cand c
          JOIN sigs sa ON sa.doc_id = CAST(c.id_a AS BIGINT)
          JOIN sigs sb ON sb.doc_id = CAST(c.id_b AS BIGINT)
                      AND sb.seed = sa.seed
          GROUP BY 1, 2
        )
        SELECT id_a, id_b, jaccard_est FROM est WHERE jaccard_est >= {thr}
    """


def _incremental_neardup_sql() -> str:
    """DuckDB mirror of incremental_neardup_dedup, bit-for-bit:

    1. ``corpus2`` regenerates base + delta including the three planted
       twin families (text || ' qq', reverse(text), reverse || ' qq' —
       all ASCII, so reverse() and the engine's text[::-1] agree);
    2. the shared _minhash_ctes chain signs the whole planted corpus
       (TEXT_CFG 16x8 banding) exactly as the actor pool does;
    3. candidates = delta x base band collisions (probe) and
       within-delta collisions ordered by numeric id, both verified by
       the 128-component signature-agreement estimate >= threshold;
    4. the ONLINE assignment is a list-threading sequential recursive
       CTE over verified-match participants in ascending id order — a
       doc is NEW iff it has no verified base match and no verified
       EARLIER-NEW delta match (exactly the entries the reference's
       online band tables would contain at its turn), else canonical =
       min(base matches ∪ earlier-new delta matches). Participants are
       only docs with >= 1 verified match, so the recursion depth is
       duplicate-bounded, not corpus-bounded."""
    thr = CFG.jaccard_threshold
    nh = int(CFG.num_hashes)
    ctes = _minhash_ctes(TEXT_CFG.num_bands, TEXT_CFG.rows_per_band,
                         src="corpus2")
    return f"""
        WITH RECURSIVE corpus2 AS MATERIALIZED (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000000, text || ' qq'
          FROM documents WHERE doc_id % 40 = 1
          UNION ALL
          SELECT doc_id + 2000000000, reverse(text)
          FROM documents WHERE doc_id % 40 = 11
          UNION ALL
          SELECT doc_id + 3000000000, reverse(text) || ' qq'
          FROM documents WHERE doc_id % 40 = 11
        ), {ctes},
        dbh AS MATERIALIZED (
          SELECT band, bv, CAST(sid AS BIGINT) AS d FROM bh
          WHERE CAST(sid AS BIGINT) % 4 = 0 OR CAST(sid AS BIGINT) >= 1000000000
        ), bbh AS MATERIALIZED (
          SELECT band, bv, CAST(sid AS BIGINT) AS d FROM bh
          WHERE CAST(sid AS BIGINT) % 4 <> 0 AND CAST(sid AS BIGINT) < 1000000000
        ), probe0 AS MATERIALIZED (
          SELECT DISTINCT dx.d AS ddoc, bx.d AS bdoc
          FROM dbh dx JOIN bbh bx ON bx.band = dx.band AND bx.bv = dx.bv
        ), dd0 AS MATERIALIZED (
          SELECT DISTINCT x.d AS u, y.d AS v
          FROM dbh x JOIN dbh y
            ON y.band = x.band AND y.bv = x.bv AND x.d < y.d
        ), pest AS MATERIALIZED (
          SELECT p.ddoc, p.bdoc,
                 sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) / {nh}.0 AS e
          FROM probe0 p
          JOIN sigs sa ON sa.doc_id = p.ddoc
          JOIN sigs sb ON sb.doc_id = p.bdoc AND sb.seed = sa.seed
          GROUP BY 1, 2
        ), vprobe AS MATERIALIZED (
          SELECT ddoc AS d, bdoc AS b FROM pest WHERE e >= {thr}
        ), dest AS MATERIALIZED (
          SELECT q.u, q.v,
                 sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) / {nh}.0 AS e
          FROM dd0 q
          JOIN sigs sa ON sa.doc_id = q.u
          JOIN sigs sb ON sb.doc_id = q.v AND sb.seed = sa.seed
          GROUP BY 1, 2
        ), vdd AS MATERIALIZED (
          SELECT u, v FROM dest WHERE e >= {thr}
        ), bmin AS MATERIALIZED (
          SELECT d, min(b) AS bm FROM vprobe GROUP BY 1
        ), parts AS MATERIALIZED (
          SELECT DISTINCT d FROM (
            SELECT d FROM vprobe
            UNION ALL SELECT u FROM vdd
            UNION ALL SELECT v FROM vdd
          )
        ), ranked AS MATERIALIZED (
          SELECT d, row_number() OVER (ORDER BY d) AS rn FROM parts
        ), seq(rn, new_ids) AS (
          SELECT CAST(0 AS BIGINT), CAST([] AS BIGINT[])
          UNION ALL
          SELECT r.rn,
                 CASE WHEN r.d NOT IN (SELECT d FROM bmin)
                       AND NOT EXISTS (
                         SELECT 1 FROM vdd e
                         WHERE e.v = r.d AND list_contains(s.new_ids, e.u))
                      THEN list_append(s.new_ids, r.d) ELSE s.new_ids END
          FROM seq s JOIN ranked r ON r.rn = s.rn + 1
        ), fnew AS (
          SELECT unnest(new_ids) AS d FROM seq
          WHERE rn = (SELECT count(*) FROM ranked)
        ), emin AS (
          SELECT e.v AS d, min(e.u) AS em
          FROM vdd e JOIN fnew f ON f.d = e.u GROUP BY 1
        ), alldelta AS (
          SELECT doc_id FROM corpus2
          WHERE doc_id % 4 = 0 OR doc_id >= 1000000000
        )
        SELECT a.doc_id,
               CAST(coalesce(least(coalesce(b.bm, m.em), coalesce(m.em, b.bm)),
                             a.doc_id) AS BIGINT) AS canonical_id,
               CAST(CASE WHEN b.bm IS NULL AND m.em IS NULL THEN 1 ELSE 0 END
                    AS BIGINT) AS is_new
        FROM alldelta a
        LEFT JOIN bmin b ON b.d = a.doc_id
        LEFT JOIN emin m ON m.d = a.doc_id
    """


def _doc_clusters_sql() -> str:
    """DuckDB mirror of doc_clusters: TEXT_CFG (16x8) MinHash banding
    star candidates (same CTEs as _minhash_doc_pairs_sql), EXACT
    byte-4-gram Jaccard >= 0.8 verification over candidates only, then
    recursive-CTE connected components with min-string-member labels.
    The Ray side pins num_salts=1 (unsalted banding), so the edge shape
    this oracle reproduces is guaranteed, not assumed (ADVICE r3)."""
    return f"""
        WITH RECURSIVE {_minhash_ctes(TEXT_CFG.num_bands, TEXT_CFG.rows_per_band)},
        cand AS (
          SELECT DISTINCT
                 least(CAST(x.sid AS BIGINT), CAST(y.sid AS BIGINT)) AS a,
                 greatest(CAST(x.sid AS BIGINT), CAST(y.sid AS BIGINT)) AS b
          FROM bh x
          JOIN bh y ON y.band = x.band AND y.bv = x.bv AND x.sid < y.sid
        ), bpos AS (
          SELECT doc_id, hex(encode(text)) AS th,
                 unnest(generate_series(1, greatest(octet_length(encode(text)) - 3, 1))) AS i
          FROM documents
        ), bsh AS MATERIALIZED (
          SELECT DISTINCT doc_id, substr(th, CAST((i - 1) * 2 + 1 AS INT), 8) AS g
          FROM bpos
        ), card AS (
          SELECT doc_id, count(*) AS c FROM bsh GROUP BY doc_id
        ), inter AS (
          SELECT cp.a, cp.b, count(*) AS cnt
          FROM cand cp
          JOIN bsh s1 ON s1.doc_id = cp.a
          JOIN bsh s2 ON s2.doc_id = cp.b AND s2.g = s1.g
          GROUP BY 1, 2
        ), e0 AS (
          SELECT a, b FROM inter
          JOIN card ca ON ca.doc_id = a JOIN card cb ON cb.doc_id = b
          WHERE cnt / (ca.c + cb.c - cnt) >= 0.8
        ), edges AS (
          SELECT CAST(a AS VARCHAR) AS u, CAST(b AS VARCHAR) AS v FROM e0
          UNION SELECT CAST(b AS VARCHAR), CAST(a AS VARCHAR) FROM e0
        ), reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ), lbl AS (
          SELECT u, least(u, min(v)) AS cluster_id FROM reach GROUP BY u
        )
        SELECT CAST(d.doc_id AS VARCHAR) AS image_id,
               coalesce(l.cluster_id, CAST(d.doc_id AS VARCHAR)) AS cluster_id
        FROM documents d LEFT JOIN lbl l ON l.u = CAST(d.doc_id AS VARCHAR)
    """


def _lsh_hit_rate_sql() -> str:
    """DuckDB mirror of lsh_hit_rate (A3, default 4x32 banding):
    candidates = distinct unverified star edges; matches = candidates
    passing the signature-estimate threshold."""
    thr = CFG.jaccard_threshold
    nh = int(CFG.num_hashes)
    return f"""
        WITH RECURSIVE {_minhash_ctes(CFG.num_bands, CFG.rows_per_band)},
        reps AS (
          SELECT band, bv, min(sid) AS rid FROM bh GROUP BY 1, 2
        ), cand AS (
          SELECT DISTINCT r.rid AS id_a, m.sid AS id_b
          FROM reps r
          JOIN bh m ON m.band = r.band AND m.bv = r.bv AND m.sid <> r.rid
        ), est AS (
          SELECT c.id_a, c.id_b,
                 sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) / {nh}.0 AS e
          FROM cand c
          JOIN sigs sa ON sa.doc_id = CAST(c.id_a AS BIGINT)
          JOIN sigs sb ON sb.doc_id = CAST(c.id_b AS BIGINT)
                      AND sb.seed = sa.seed
          GROUP BY 1, 2
        )
        SELECT count(*) AS n_candidates,
               count(*) FILTER (WHERE e >= {thr}) AS n_matches,
               count(*) FILTER (WHERE e >= {thr}) / greatest(1, count(*))
                 AS hit_rate
        FROM est
    """


def _random_pair_jaccard_hist_sql() -> str:
    """DuckDB mirror of random_pair_jaccard_hist: murmur-rank pairing +
    MinHash-estimate histogram from the SQL-recomputed signatures."""
    nh = int(CFG.num_hashes)
    ctes, last = _mm_chain_sql(
        "mr0", ["doc_id"], {"hm": ("mr0.key", int(CFG.sample_seed))}, "r"
    )
    return f"""
        WITH RECURSIVE {_minhash_ctes(CFG.num_bands, CFG.rows_per_band)},
        mr0 AS (SELECT doc_id, doc_id % {_MM_MASK} AS key FROM documents),
        {ctes}, ordd AS (
          SELECT doc_id, row_number() OVER (ORDER BY hm, doc_id) - 1 AS r
          FROM {last}
        ), cnt AS (
          SELECT count(*) // 2 AS half FROM documents
        ), pairs AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb
          FROM ordd a
          JOIN ordd b ON b.r = a.r + (SELECT half FROM cnt)
          WHERE a.r < (SELECT half FROM cnt)
        ), pj AS (
          SELECT p.ida,
                 sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END) / {nh}.0 AS e
          FROM pairs p
          JOIN sigs sa ON sa.doc_id = p.ida
          JOIN sigs sb ON sb.doc_id = p.idb AND sb.seed = sa.seed
          GROUP BY p.ida, p.idb
        ), bins AS (
          SELECT unnest(generate_series(0, 9)) AS b
        )
        SELECT round(b / 10.0, 2) AS bin_lo,
               CAST(coalesce(cntp, 0) AS BIGINT) AS n_pairs
        FROM bins LEFT JOIN (
          SELECT least(CAST(floor(e * 10) AS INT), 9) AS b, count(*) AS cntp
          FROM pj GROUP BY 1
        ) h USING (b)
    """


def _simhash_text_pairs_sql() -> str:
    """DuckDB mirror of simhash_text_pairs, bit-for-bit: Charikar token
    SimHash with murmur3_x86_32 over VARIABLE-length tokens (sequential
    block mixing as a recursive CTE threading the hash state, tail and
    length-xor finalize included), 4x16-bit band buckets, min-string-id
    star reps, Hamming<=threshold verification via bit_count(xor).

    ascii() byte access assumes single-byte text (testdata is ASCII).
    Buckets here are keyed by (band, value) directly; the engine keys by
    a 64-bit mix of the same tuple — identical partitions short of a
    2^-64 mix collision."""
    M = _MM_MASK
    C1, C2 = 0xCC9E2D51, 0x1B873593
    F1, F2, NC = 0x85EBCA6B, 0xC2B2AE35, 0xE6546B64
    seed1 = 0x51A7
    seed2 = seed1 ^ 0xFFFF
    ham = CFG.simhash_hamming_threshold

    def block_mix(h, k):
        k1 = f"CAST((CAST(({k}) AS HUGEINT) * {C1}) % {M} AS BIGINT)"
        k2 = f"((({k1}) * 32768) % {M} | (({k1}) // 131072))"
        k3 = f"CAST((CAST(({k2}) AS HUGEINT) * {C2}) % {M} AS BIGINT)"
        x = f"xor({h}, {k3})"
        r = f"((({x}) * 8192) % {M} | (({x}) // 524288))"
        return f"((({r}) * 5 + {NC}) % {M})"

    def tail_mix(h, k):
        k1 = f"CAST((CAST(({k}) AS HUGEINT) * {C1}) % {M} AS BIGINT)"
        k2 = f"((({k1}) * 32768) % {M} | (({k1}) // 131072))"
        k3 = f"CAST((CAST(({k2}) AS HUGEINT) * {C2}) % {M} AS BIGINT)"
        return f"xor({h}, {k3})"

    def fmix(h, ln):
        e = f"xor({h}, {ln})"
        e = f"xor({e}, ({e}) // 65536)"
        e = f"CAST((CAST(({e}) AS HUGEINT) * {F1}) % {M} AS BIGINT)"
        e = f"xor({e}, ({e}) // 8192)"
        e = f"CAST((CAST(({e}) AS HUGEINT) * {F2}) % {M} AS BIGINT)"
        return f"xor({e}, ({e}) // 65536)"

    def byte_at(expr):
        return f"CAST(ascii(substr(tok, CAST({expr} AS INT), 1)) AS BIGINT)"

    block = " + ".join(
        f"{byte_at(f'4 * m.i + 1 + {i}')} * {256 ** i}".replace("tok", "t.tok")
        for i in range(4)
    )
    tb = "4 * (length(tok) // 4)"
    tailv = (
        f"CASE length(tok) % 4 "
        f"WHEN 1 THEN {byte_at(f'{tb} + 1')} "
        f"WHEN 2 THEN {byte_at(f'{tb} + 1')} + {byte_at(f'{tb} + 2')} * 256 "
        f"WHEN 3 THEN {byte_at(f'{tb} + 1')} + {byte_at(f'{tb} + 2')} * 256"
        f" + {byte_at(f'{tb} + 3')} * 65536 "
        f"ELSE 0 END"
    ).replace("tok", "t.tok")
    hfinal = fmix(
        f"CASE WHEN length(t.tok) % 4 > 0 THEN {tail_mix('m.h', tailv)}"
        f" ELSE m.h END",
        "length(t.tok)",
    )
    return rf"""
        WITH RECURSIVE tk AS MATERIALIZED (
          SELECT doc_id, tseq, tok FROM (
            SELECT doc_id,
                   unnest(generate_series(1, len(string_split_regex(trim(text), '\s+')))) AS tseq,
                   unnest(string_split_regex(trim(text), '\s+')) AS tok
            FROM documents WHERE length(trim(text)) > 0
          )
        ), mm(doc_id, tseq, sd, i, h) AS (
          SELECT doc_id, tseq, CAST(s.sd AS BIGINT), CAST(0 AS BIGINT),
                 CAST(s.sd AS BIGINT)
          FROM tk, (VALUES ({seed1}), ({seed2})) s(sd)
          UNION ALL
          SELECT m.doc_id, m.tseq, m.sd, m.i + 1,
                 {block_mix("m.h", block)}
          FROM mm m JOIN tk t ON t.doc_id = m.doc_id AND t.tseq = m.tseq
          WHERE m.i < length(t.tok) // 4
        ), hdone AS MATERIALIZED (
          SELECT m.doc_id, m.tseq, m.sd, {hfinal} AS h
          FROM mm m JOIN tk t ON t.doc_id = m.doc_id AND t.tseq = m.tseq
          WHERE m.i = length(t.tok) // 4
        ), h64 AS (
          SELECT a.doc_id, a.tseq,
                 CAST(b.h AS HUGEINT) * {M} + CAST(a.h AS HUGEINT) AS hu
          FROM hdone a JOIN hdone b
            ON b.doc_id = a.doc_id AND b.tseq = a.tseq AND b.sd = {seed2}
          WHERE a.sd = {seed1}
        ), accs AS (
          SELECT doc_id, bb.b,
                 sum(CASE WHEN (hu >> CAST(bb.b AS INT)) % 2 = 1
                          THEN 1 ELSE -1 END) AS acc
          FROM h64, (SELECT unnest(generate_series(0, 63)) AS b) bb
          GROUP BY 1, 2
        ), sigs0 AS (
          SELECT doc_id,
                 sum(CASE WHEN acc > 0 THEN 1::HUGEINT << CAST(b AS INT)
                          ELSE 0 END) AS su
          FROM accs GROUP BY doc_id
        ), sims AS MATERIALIZED (
          SELECT d.doc_id, coalesce(s.su, 0) AS su,
                 CAST(CASE WHEN coalesce(s.su, 0) >= 9223372036854775808
                           THEN coalesce(s.su, 0) - 18446744073709551616
                           ELSE coalesce(s.su, 0) END AS BIGINT) AS sig
          FROM documents d LEFT JOIN sigs0 s ON s.doc_id = d.doc_id
        ), bands AS (
          SELECT CAST(doc_id AS VARCHAR) AS sid, sig, bb.b AS band,
                 CAST((su >> CAST(16 * bb.b AS INT)) % 65536 AS BIGINT) AS bv
          FROM sims, (SELECT unnest(generate_series(0, 3)) AS b) bb
        ), reps AS (
          SELECT band, bv, min(sid) AS rid FROM bands GROUP BY 1, 2
        ), edges AS (
          SELECT r.rid AS id_a, m.sid AS id_b,
                 1 - bit_count(xor(rs.sig, m.sig)) / 64.0 AS jaccard_est
          FROM reps r
          JOIN bands m ON m.band = r.band AND m.bv = r.bv AND m.sid <> r.rid
          JOIN bands rs ON rs.band = r.band AND rs.bv = r.bv AND rs.sid = r.rid
          WHERE bit_count(xor(rs.sig, m.sig)) <= {ham}
        )
        SELECT DISTINCT id_a, id_b, jaccard_est FROM edges
    """


def _cdc_source_chunks_sql() -> str:
    """DuckDB mirror of cdc_source_chunks: the FastCDC gear rolling
    hash recomputed per position (positions x 32-offset join against
    the inlined 256-entry gear table), strict/loose mask candidates,
    next-boundary per position via ASOF joins, and the sequential
    min/avg/max chunk walk as a recursive CTE over that next-boundary
    table. ascii() byte access assumes single-byte text (testdata is
    ASCII; python chunks the encoded bytes)."""
    from hmse_ray.functions import fastcdc as _fc

    gear = _fc.gear_table(CFG.gear_seed)
    gear_vals = ",".join(f"({i},{int(v)})" for i, v in enumerate(gear))
    cmin, cavg, cmax = CFG.chunk_min, CFG.chunk_avg, CFG.chunk_max
    bits = int(CFG.rabin_mask).bit_length()
    mask_s = (1 << (bits + 1)) - 1
    mask_l = (1 << (bits - 3)) - 1
    return f"""
        WITH RECURSIVE gear(b, g) AS (VALUES {gear_vals}),
        sl AS MATERIALIZED (
          SELECT source, string_agg(text, '' ORDER BY doc_id) AS s,
                 CAST(sum(length(text)) AS BIGINT) AS n
          FROM documents GROUP BY source
        ), offs AS (
          SELECT source, doc_id, text,
                 sum(length(text)) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off
          FROM documents
        ), bytes AS MATERIALIZED (
          SELECT source, CAST(coalesce(off, 0) + qd AS BIGINT) AS q,
                 ascii(substr(text, CAST(qd AS INT), 1)) AS by
          FROM (SELECT source, off, text,
                       unnest(generate_series(1, length(text))) AS qd
                FROM offs)
        ), gv AS MATERIALIZED (
          -- per-position gear value resolved ONCE (not once per offset);
          -- g * 2^k < 2^63 so the whole sum stays in BIGINT with a
          -- per-term mod (sum of 32 values < 2^32 each fits easily)
          SELECT b.source, b.q, CAST(g.g AS BIGINT) AS g
          FROM bytes b JOIN gear g ON g.b = b.by
        ), hashes AS MATERIALIZED (
          SELECT t.source, t.q,
                 CAST(sum((v.g * (1::BIGINT << CAST(t.k AS INT)))
                          % {_MM_MASK}) % {_MM_MASK} AS BIGINT) AS h
          FROM (SELECT source, q, unnest(generate_series(0, least(q - 1, 31))) AS k
                FROM bytes) t
          JOIN gv v ON v.source = t.source AND v.q = t.q - t.k
          GROUP BY 1, 2
        ), cand_s AS MATERIALIZED (
          SELECT source, q - 1 AS c FROM hashes WHERE (h & {mask_s}) = 0
        ), cand_l AS MATERIALIZED (
          SELECT source, q - 1 AS c FROM hashes WHERE (h & {mask_l}) = 0
        ), nb AS MATERIALIZED (
          SELECT p.source, p.q - 1 AS p, sl.n,
            CASE WHEN cs.c IS NOT NULL AND cs.c < p.q - 1 + {cavg} - 1 THEN cs.c + 1
                 WHEN cl.c IS NOT NULL AND cl.c <= p.q - 1 + {cmax} - 1 THEN cl.c + 1
                 ELSE least(p.q - 1 + {cmax}, sl.n) END AS e
          FROM bytes p
          JOIN sl ON sl.source = p.source
          ASOF LEFT JOIN cand_s cs
            ON cs.source = p.source AND cs.c >= p.q - 1 + {cmin} - 1
          ASOF LEFT JOIN cand_l cl
            ON cl.source = p.source AND cl.c >= p.q - 1 + {cavg} - 1
        ), ch(source, strt) AS (
          SELECT source, 0 FROM sl WHERE n > 0
          UNION ALL
          SELECT c.source, nb.e FROM ch c
          JOIN nb ON nb.source = c.source AND nb.p = c.strt
          WHERE nb.e < nb.n
        ), chunks AS (
          SELECT c.source, c.strt,
                 CASE WHEN nb.n <= {cmin} THEN nb.n
                      ELSE least(nb.e, nb.n) - c.strt END AS len
          FROM ch c JOIN nb ON nb.source = c.source AND nb.p = c.strt
        )
        SELECT c.source,
               row_number() OVER (PARTITION BY c.source ORDER BY c.strt) - 1
                 AS chunk_idx,
               c.len AS chunk_len,
               sha256(substr(sl.s, CAST(c.strt + 1 AS INT), CAST(c.len AS INT)))
                 AS sha
        FROM chunks c JOIN sl ON sl.source = c.source
    """


def _kmeans_ctes(k: int, iters: int, plant: bool) -> str:
    """CTE text reproducing stages/kmeans.py bit-for-bit, ending at
    ``af (vec_id, cluster, d2)`` with ``base (vec_id, i, qv)`` exposed.

    Exactness hinges on three shared-IEEE facts (full argument in
    stages/kmeans.py): quantization multiplies by 2^10 (exact in
    double), every distance/dot is integer, and the centroid update's
    single double division sees exactly-representable int operands on
    both sides. The planted-twin perturbation is the same murmur3 CTE
    chain the engine's numpy kernel evaluates (dim hardcoded 64 to
    match the testdata embedding width in the plant key)."""
    from hmse_ray.stages import kmeans as km

    qsrc = f"""qb AS (
          SELECT vec_id,
                 unnest(generate_series(1, len(embedding))) - 1 AS i,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {km.SCALE}
                            + 0.5) AS BIGINT) AS qv
          FROM embeddings
        )"""
    if plant:
        pch, plast = _mm_chain_sql(
            "pl0", ["vec_id", "i", "qv"], {"hd": ("pl0.key", km.PLANT_SEED)},
            "pd")
        base = f"""{qsrc}, pl0 AS (
          SELECT vec_id, i, qv, (vec_id * 64 + i) % {_MM_MASK} AS key
          FROM qb WHERE vec_id % 20 = 0
        ), {pch}, base AS (
          SELECT vec_id, i, qv FROM qb
          UNION ALL
          SELECT vec_id + {km.PLANT_BASE} AS vec_id, i,
                 qv + (hd % {2 * km.PLANT_AMP + 1} - {km.PLANT_AMP}) AS qv
          FROM {plast}
        )"""
    else:
        base = f"{qsrc}, base AS (SELECT vec_id, i, qv FROM qb)"
    ich, ilast = _mm_chain_sql(
        "ik0", ["vec_id"], {"hm": ("ik0.key", km.INIT_SEED)}, "ki")
    parts = [
        base,
        f"""ik0 AS (
          SELECT DISTINCT vec_id, vec_id % {_MM_MASK} AS key FROM base
        )""",
        ich,
        f"""rk AS (
          SELECT vec_id, row_number() OVER (ORDER BY hm, vec_id) - 1 AS j
          FROM {ilast}
        )""",
        f"""c0 AS (
          SELECT r.j, b.i, b.qv AS cv
          FROM rk r JOIN base b USING (vec_id) WHERE r.j < {k}
        )""",
    ]
    for r in range(1, iters + 1):
        p = r - 1
        parts += [
            f"""d{r} AS (
          SELECT b.vec_id, c.j, sum((b.qv - c.cv) * (b.qv - c.cv)) AS d2
          FROM base b JOIN c{p} c ON b.i = c.i GROUP BY 1, 2
        )""",
            f"""a{r} AS (
          SELECT vec_id, j FROM (
            SELECT vec_id, j,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, j) AS rn
            FROM d{r}) WHERE rn = 1
        )""",
            f"""n{r} AS (
          SELECT a.j, b.i, sum(b.qv) AS s, count(*) AS n
          FROM a{r} a JOIN base b USING (vec_id) GROUP BY 1, 2
        )""",
            f"""c{r} AS (
          SELECT p.j, p.i,
                 CASE WHEN u.s IS NULL THEN p.cv
                      ELSE CAST(floor((2 * u.s + u.n) / (2 * u.n))
                                AS BIGINT) END AS cv
          FROM c{p} p LEFT JOIN n{r} u ON u.j = p.j AND u.i = p.i
        )""",
        ]
    parts += [
        f"""df AS (
          SELECT b.vec_id, c.j,
                 CAST(sum((b.qv - c.cv) * (b.qv - c.cv)) AS BIGINT) AS d2
          FROM base b JOIN c{iters} c ON b.i = c.i GROUP BY 1, 2
        )""",
        """af AS (
          SELECT vec_id, j AS cluster, d2 FROM (
            SELECT vec_id, j, d2,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, j) AS rn
            FROM df) WHERE rn = 1
        )""",
    ]
    return ", ".join(parts)


def _kmeans_clusters_sql() -> str:
    from hmse_ray.stages import kmeans as km

    return f"""
        WITH {_kmeans_ctes(km.K, km.ITERS, plant=False)}
        SELECT vec_id, cluster, d2 AS dist2 FROM af
    """


def _semantic_dedup_sql() -> str:
    from hmse_ray.stages import kmeans as km

    return f"""
        WITH {_kmeans_ctes(km.K, km.ITERS, plant=True)}, nrm AS (
          SELECT vec_id, sum(qv * qv) AS n2 FROM base GROUP BY 1
        ), rnk AS (
          SELECT vec_id, cluster,
                 row_number() OVER (PARTITION BY cluster
                                    ORDER BY d2, vec_id) AS r
          FROM af
        ), prs AS (
          SELECT x.cluster, x.vec_id AS ua, x.r AS ra, y.vec_id AS vb
          FROM rnk x JOIN rnk y ON x.cluster = y.cluster AND x.r < y.r
        ), dots AS (
          SELECT p.ua, p.ra, p.vb, sum(ba.qv * bb.qv) AS dot
          FROM prs p
          JOIN base ba ON ba.vec_id = p.ua
          JOIN base bb ON bb.vec_id = p.vb AND bb.i = ba.i
          GROUP BY 1, 2, 3
        ), qual AS (
          SELECT d.vb AS vec_id, min(d.ra) AS mr
          FROM dots d
          JOIN nrm na ON na.vec_id = d.ua
          JOIN nrm nb ON nb.vec_id = d.vb
          WHERE d.dot > 0
            AND {km.T_DEN} * d.dot * d.dot >= {km.T_NUM} * na.n2 * nb.n2
          GROUP BY 1
        ), keep AS (
          SELECT q.vec_id, r2.vec_id AS keeper
          FROM qual q
          JOIN rnk rv ON rv.vec_id = q.vec_id
          JOIN rnk r2 ON r2.cluster = rv.cluster AND r2.r = q.mr
        )
        SELECT a.vec_id, a.cluster,
               CAST(CASE WHEN kp.keeper IS NULL THEN 0 ELSE 1 END
                    AS BIGINT) AS is_dup,
               COALESCE(kp.keeper, a.vec_id) AS keeper_id
        FROM af a LEFT JOIN keep kp USING (vec_id)
    """


def _stratified_sample_sql(per_source: int = 8) -> str:
    """DuckDB mirror of stratified_sample_docs: same murmur3 CTE chain
    over doc_id, row_number per source, top per_source."""
    ctes, last = _mm_chain_sql(
        "st0", ["doc_id", "source"], {"hm": ("st0.key", _STRAT_SEED)}, "ss")
    return f"""
        WITH st0 AS (
          SELECT doc_id, source, doc_id % {_MM_MASK} AS key FROM documents
        ), {ctes}, rk AS (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY hm, doc_id) AS sel_rank
          FROM {last}
        )
        SELECT doc_id, source, CAST(sel_rank AS BIGINT) AS sel_rank FROM rk
        WHERE sel_rank <= {per_source}
    """


def _hll_sql(p: int = HLL_P) -> str:
    """DuckDB mirror of hll_distinct_docs (functions/hll.py): top-64-bit
    sha256 hash (16 hex chars parsed positionally into HUGEINT — exact
    integer arithmetic, no 2^32 ceiling), register/rho via
    length(bin(w)) (= bitlength, exact), and the EXACT integer-scaled
    register sum ``SUM(1 << (wbits+1-max_rho)) + zeros * 2^(wbits+1)``
    (each term <= 2^wbits; SUM(BIGINT) promotes to HUGEINT) converted
    to DOUBLE once — the same single rounding the Python side performs —
    then the identical IEEE alpha/raw/linear-counting sequence rounded
    to 3 decimals."""
    m = 1 << p
    wbits = 64 - p
    wdiv = 1 << wbits
    scale = 1 << (wbits + 1)
    # first term HUGEINT to promote the whole 16-digit sum past BIGINT
    hex64 = " + ".join(
        ("CAST(strpos('0123456789abcdef', substr(hx, 1, 1)) - 1 AS HUGEINT)"
         f" * {16 ** 15}") if i == 0 else
        f"(strpos('0123456789abcdef', substr(hx, {i + 1}, 1)) - 1)"
        f" * {16 ** (15 - i)}"
        for i in range(16)
    )
    return f"""
        WITH hx0 AS (
          SELECT source, sha256(text) AS hx FROM documents
        ), h AS (
          SELECT source, {hex64} AS h64 FROM hx0
        ), r AS (
          SELECT source, CAST(h64 // {wdiv} AS BIGINT) AS register,
                 CASE WHEN h64 % {wdiv} = 0 THEN {wbits + 1}
                      ELSE {wbits + 1}
                           - length(bin(CAST(h64 % {wdiv} AS BIGINT)))
                 END AS rho
          FROM h
        ), mx AS (
          SELECT source, register, MAX(rho) AS max_rho
          FROM r GROUP BY 1, 2
        ), s AS (
          SELECT source,
                 SUM(CAST(1 AS BIGINT) << ({wbits + 1} - max_rho))
                   + CAST({m} - COUNT(*) AS HUGEINT) * {scale} AS sum_scaled,
                 {m} - COUNT(*) AS zero_registers
          FROM mx GROUP BY source
        )
        SELECT source, CAST({m} AS BIGINT) AS m,
               CAST(zero_registers AS BIGINT) AS zero_registers,
               ROUND(CASE WHEN raw <= 2.5 * {m} AND zero_registers > 0
                          THEN {m} * ln({m}.0 / zero_registers)
                          ELSE raw END, 3) AS est_distinct_r
        FROM (SELECT *, (0.7213 / (1.0 + 1.079 / {m})) * {m} * {m}
                     / (CAST(sum_scaled AS DOUBLE) / {float(scale)}) AS raw
              FROM s)
    """


ORACLES = {
    "hll_distinct_docs": _hll_sql(),
    "tfidf_top_terms": _tfidf_sql(),
    "windowed_chunk_embed": _windowed_chunk_embed_sql(),
    "stratified_sample_docs": _stratified_sample_sql(),
    "decontaminate_docs": r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
          FROM documents
        ), gi AS (
          SELECT doc_id, a, unnest(generate_series(1, len(a) - 3)) AS i
          FROM toks WHERE len(a) >= 4
        ), grams AS (
          SELECT DISTINCT doc_id, array_to_string(a[i:i+3], ' ') AS g
          FROM gi
        ), bg AS (
          SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 7
        ), hits AS (
          SELECT c.doc_id, count(*) AS n_hits
          FROM grams c JOIN bg USING (g)
          WHERE c.doc_id % 50 <> 7 GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(CASE WHEN h.n_hits IS NULL THEN 0 ELSE 1 END
                    AS BIGINT) AS contaminated,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits
        FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 7) d
        LEFT JOIN hits h USING (doc_id)
    """,
    "incremental_exact_dedup": """
        WITH delta AS (
          SELECT doc_id, sha256(text) AS sha FROM documents
          WHERE doc_id % 4 = 0
          UNION ALL
          SELECT doc_id + 1000000000 AS doc_id, sha256(text) AS sha
          FROM documents WHERE doc_id % 40 = 1
        ), bidx AS (
          SELECT sha256(text) AS sha, MIN(doc_id) AS canonical
          FROM documents WHERE doc_id % 4 <> 0 GROUP BY 1
        ), dmin AS (
          SELECT sha, MIN(doc_id) AS dcanon FROM delta GROUP BY 1
        )
        SELECT d.doc_id, d.sha AS sha256,
               COALESCE(b.canonical, dm.dcanon) AS canonical_id,
               CAST(CASE WHEN b.canonical IS NULL THEN 1 ELSE 0 END
                    AS BIGINT) AS is_new
        FROM delta d
        LEFT JOIN bidx b ON b.sha = d.sha
        JOIN dmin dm ON dm.sha = d.sha
    """,
    "kmeans_clusters": _kmeans_clusters_sql(),
    "semantic_dedup": _semantic_dedup_sql(),
    "exact_dedup_docs": """
        SELECT sha256(text) AS sha256, MIN(doc_id) AS canonical_id,
               COUNT(*) AS refcount
        FROM documents GROUP BY sha256(text)
    """,
    "fixed_chunk_histogram": f"""
        WITH exploded AS (
          SELECT text,
                 unnest(generate_series(1,
                   GREATEST(1, CAST(ceil(length(text)/{FIXED_CHUNK}.0) AS BIGINT)))) AS i
          FROM documents
        ), refs AS (
          SELECT sha256(substr(text, (i-1)*{FIXED_CHUNK}+1, {FIXED_CHUNK})) AS sha,
                 COUNT(*) AS refcount
          FROM exploded GROUP BY 1
        )
        SELECT refcount, COUNT(*) AS n_chunks FROM refs GROUP BY refcount
    """,
    "token_counts": r"""
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE length(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
               length(text) AS n_chars
        FROM documents
    """,
    "char_class_profile": r"""
        SELECT doc_id,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
               length(text) - length(replace(text, ' ', '')) AS n_spaces,
               length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
               length(text) - length(regexp_replace(text, '[^\sA-Za-z0-9]', '', 'g')) AS n_punct
        FROM documents
    """,
    "dup_ratio_by_source": """
        SELECT source, COUNT(*) AS n_docs,
               COUNT(DISTINCT sha256(text)) AS n_distinct
        FROM documents GROUP BY source
    """,
    "top_longest_docs": """
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT 20
    """,
    "sample_docs": """
        SELECT doc_id, source FROM documents WHERE doc_id % 16 = 0
    """,
    "events_window_agg": """
        SELECT user_id,
               CAST(floor(epoch(ts)/300) AS BIGINT) AS window,
               COUNT(*) AS n_events,
               round(SUM(value), 6) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "events_sessionize": """
        WITH d AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
          SELECT user_id, ts, value,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM d
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events, round(SUM(value), 6) AS sum_value,
               CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start
        FROM s GROUP BY user_id, session_id
    """,
    "orders_by_segment": """
        SELECT c.c_mktsegment, COUNT(*) AS n_orders,
               round(SUM(o.o_totalprice), 2) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    # Byte-4-gram Jaccard over encode(text) blobs: byte-exact vs the
    # implementation's uint32 byte shingles even for multibyte UTF-8
    # (the latent fixed_chunk_histogram divergence doesn't recur here).
    # Docs shorter than 4 bytes diverge (python pads with NULs) — the
    # testdata minimum is 48 chars.
    "ngram_jaccard_pairs": """
        WITH pos AS (
          SELECT doc_id, hex(encode(text)) AS th,
                 unnest(generate_series(1, greatest(octet_length(encode(text)) - 3, 1))) AS i
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id, substr(th, CAST((i - 1) * 2 + 1 AS INT), 8) AS g FROM pos
        ), card AS (
          SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT s1.doc_id AS a, s2.doc_id AS b, count(*) AS cnt
          FROM sh s1 JOIN sh s2 ON s1.g = s2.g AND s1.doc_id < s2.doc_id
          GROUP BY 1, 2
        )
        SELECT CAST(a AS BIGINT) AS id_a, CAST(b AS BIGINT) AS id_b,
               round(cnt / (ca.c + cb.c - cnt), 6) AS jaccard
        FROM inter
        JOIN card ca ON ca.doc_id = a
        JOIN card cb ON cb.doc_id = b
        WHERE cnt / (ca.c + cb.c - cnt) >= 0.7
    """,
    # Exact containment cross join — the recall oracle for the winnowed
    # suffix-array path (min_len 23 = winnowing guarantee k+window-1;
    # the Ray side is exact at or above it, see substring_dup_docs)
    "substring_dup_pairs": """
        SELECT a.doc_id AS id_sub, b.doc_id AS id_sup,
               length(a.text) AS len_sub, length(b.text) AS len_sup
        FROM documents a, documents b
        WHERE length(a.text) >= 23
          AND length(a.text) < length(b.text)
          AND position(a.text IN b.text) > 0
    """,
    # Containment edges -> recursive-CTE connected components with
    # min-string-member labels (same CC shape as _doc_clusters_sql)
    "substring_doc_clusters": """
        WITH RECURSIVE e0 AS (
          SELECT a.doc_id AS a, b.doc_id AS b
          FROM documents a, documents b
          WHERE length(a.text) >= 23
            AND length(a.text) < length(b.text)
            AND position(a.text IN b.text) > 0
        ), edges AS (
          SELECT CAST(a AS VARCHAR) AS u, CAST(b AS VARCHAR) AS v FROM e0
          UNION SELECT CAST(b AS VARCHAR), CAST(a AS VARCHAR) FROM e0
        ), reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ), lbl AS (
          SELECT u, least(u, min(v)) AS cluster_id FROM reach GROUP BY u
        )
        SELECT CAST(d.doc_id AS VARCHAR) AS image_id,
               coalesce(l.cluster_id, CAST(d.doc_id AS VARCHAR)) AS cluster_id
        FROM documents d LEFT JOIN lbl l ON l.u = CAST(d.doc_id AS VARCHAR)
    """,
    # Connected components (min-member label, string compare — matching
    # components_unionfind) over the pipeline's ACTUAL edge set:
    # MinHash-LSH (TEXT_CFG 16x8) star candidates reproduced bit-for-bit
    # via _minhash_ctes, then EXACT byte-4-gram Jaccard >= 0.8
    # verification — so the hash check is sound independent of LSH
    # recall (recall vs the prefix-filter exact join is pinned
    # separately in tests).
    "doc_clusters": _doc_clusters_sql(),
    # Stopword-vote language ID: DISTINCT lowercase whitespace tokens,
    # votes per language, argmax with en>de>fr>es tie priority
    # (matching the STOPWORDS dict insertion order argmax).
    "lang_id_docs": r"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
          FROM documents
        ), dt AS (
          SELECT DISTINCT doc_id, tok FROM toks
        ), v AS (
          SELECT doc_id,
            count(*) FILTER (WHERE tok IN ('the','and','of','to','a','in','is','that','it','for')) AS v_en,
            count(*) FILTER (WHERE tok IN ('der','die','das','und','ist','nicht','ein','mit','zu','auf')) AS v_de,
            count(*) FILTER (WHERE tok IN ('le','la','les','et','est','une','pas','pour','dans','que')) AS v_fr,
            count(*) FILTER (WHERE tok IN ('el','la','los','y','es','una','no','por','con','que')) AS v_es
          FROM dt GROUP BY doc_id
        )
        SELECT d.doc_id,
          CASE WHEN v_en + v_de + v_fr + v_es = 0 THEN 'und'
               WHEN v_en >= v_de AND v_en >= v_fr AND v_en >= v_es THEN 'en'
               WHEN v_de >= v_fr AND v_de >= v_es THEN 'de'
               WHEN v_fr >= v_es THEN 'fr'
               ELSE 'es' END AS lang_pred,
          round(CASE WHEN v_en + v_de + v_fr + v_es = 0 THEN 0.0
                     ELSE greatest(v_en, v_de, v_fr, v_es) / (v_en + v_de + v_fr + v_es)
                END, 6) AS confidence
        FROM documents d JOIN v ON v.doc_id = d.doc_id
    """,
    # Composite quality score; the arithmetic mirrors
    # textstats.quality_scores term-for-term (same left-assoc float64
    # op order -> bit-identical before round).
    "quality_docs": r"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
          FROM documents
        ), v AS (
          SELECT doc_id, count(*) AS n_toks,
            count(*) FILTER (WHERE tok IN ('the','and','of','to','a','in','is','that','it','for')) AS v_en
          FROM toks GROUP BY doc_id
        ), c AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
                 length(text) - length(regexp_replace(text, '[^\sA-Za-z0-9]', '', 'g')) AS n_punct
          FROM documents
        )
        SELECT c.doc_id,
               round(least(greatest(
                 0.35 * (n_alpha / greatest(1, n_chars))
                 + 0.25 * least(greatest(n_chars / 200.0, 0.0), 1.0)
                 + 0.4 * least((v_en / greatest(1, n_toks)) * 4, 1.0)
                 - 0.5 * greatest(n_punct / greatest(1, n_chars) - 0.2, 0.0),
               0.0), 1.0), 6) AS quality
        FROM c JOIN v ON v.doc_id = c.doc_id
    """,
    "ann_topk": """
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10
        ), scored AS (
          SELECT q.query_id, e.vec_id,
                 list_cosine_similarity(q.qe, e.embedding) AS score
          FROM q CROSS JOIN embeddings e
        )
        SELECT query_id, vec_id, round(score, 4) AS score_r
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) <= 10
    """,
    "doc_fingerprints": _winnow_fingerprint_sql(),
    "decode_resize_features": _decode_resize_sql(),
    "audio_features": _audio_features_sql(),
    "video_frame_stats": _video_frame_stats_sql(),
    "embedding_near_dups": _embedding_near_dups_sql(),
    "cdc_source_chunks": _cdc_source_chunks_sql(),
    # the file-based source reads byte-identical streams, so the same
    # gear-hash oracle verifies it
    "corpus_file_chunks": _cdc_source_chunks_sql(),
    "random_pair_true_jaccard_hist": _random_pair_true_jaccard_hist_sql(),
    "simhash_text_pairs": _simhash_text_pairs_sql(),
    "minhash_doc_pairs": _minhash_doc_pairs_sql(),
    "lsh_hit_rate": _lsh_hit_rate_sql(),
    "random_pair_jaccard_hist": _random_pair_jaccard_hist_sql(),
    # Per-document FastCDC reduces to one whole-doc chunk while every
    # document is shorter than chunk_min (testdata max 553 B vs min
    # 1024) — the boundary case of chunk_boundaries. These oracles
    # verify exactly that premise; cdc_source_chunks exercises (and
    # verifies) real gear-hash cuts on longer streams.
    "cdc_chunk_stats": """
        SELECT count(*) AS n_chunks,
               avg(length(text)) AS mean_len,
               min(length(text)) AS min_len,
               max(length(text)) AS max_len
        FROM documents
    """,
    "cdc_chunk_index": """
        SELECT sha256(text) AS sha256,
               min(CAST(doc_id AS VARCHAR) || '#000000') AS canonical_ref,
               count(*) AS refcount,
               min(length(text)) AS chunk_len
        FROM documents GROUP BY sha256(text)
    """,
}

# the bloom semi-join path is bit-identical to the unfiltered ingest
# (no false negatives), so it shares the oracle verbatim
ORACLES["incremental_semijoin_dedup"] = ORACLES["incremental_exact_dedup"]

ORACLES["incremental_neardup_dedup"] = _incremental_neardup_sql()
# same no-false-negative argument for the int64-bucket bloom variant
ORACLES["incremental_neardup_semijoin"] = ORACLES["incremental_neardup_dedup"]

QUERIES = {
    "exact_dedup_docs": exact_dedup_docs,
    "incremental_exact_dedup": incremental_exact_dedup,
    "incremental_semijoin_dedup": incremental_semijoin_dedup,
    "incremental_neardup_dedup": incremental_neardup_dedup,
    "incremental_neardup_semijoin": incremental_neardup_semijoin,
    "hll_distinct_docs": hll_distinct_docs,
    "tfidf_top_terms": tfidf_top_terms,
    "windowed_chunk_embed": windowed_chunk_embed,
    "fixed_chunk_histogram": fixed_chunk_histogram,
    "cdc_chunk_stats": cdc_chunk_stats,
    "cdc_chunk_index": cdc_chunk_index,
    "cdc_source_chunks": cdc_source_chunks,
    "corpus_file_chunks": corpus_file_chunks,
    "compression_accounting": compression_accounting,
    "compression_accounting_shared": compression_accounting_shared,
    "token_counts": token_counts,
    "char_class_profile": char_class_profile,
    "lang_id_docs": lang_id_docs,
    "quality_docs": quality_docs,
    "doc_fingerprints": doc_fingerprints,
    "decontaminate_docs": decontaminate_docs,
    "dup_ratio_by_source": dup_ratio_by_source,
    "top_longest_docs": top_longest_docs,
    "sample_docs": sample_docs,
    "stratified_sample_docs": stratified_sample_docs,
    "events_window_agg": events_window_agg,
    "events_sessionize": events_sessionize,
    "orders_by_segment": orders_by_segment,
    "ann_topk": ann_topk,
    "ann_topk_lsh": ann_topk_lsh,
    "ann_topk_lsh_partitioned": ann_topk_lsh_partitioned,
    "ann_topk_ivf": ann_topk_ivf,
    "ann_recall": ann_recall,
    "embedding_near_dups": embedding_near_dups,
    "kmeans_clusters": kmeans_clusters,
    "semantic_dedup": semantic_dedup,
    "store_kind_stats": store_kind_stats_docs,
    "roundtrip_invariant": roundtrip_invariant,
    "minhash_doc_pairs": minhash_doc_pairs,
    "doc_clusters": doc_clusters,
    "simhash_text_pairs": simhash_text_pairs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "substring_dup_pairs": substring_dup_pairs,
    "substring_doc_clusters": substring_doc_clusters,
    "decode_resize_features": decode_resize_features,
    "jfif_roundtrip_psnr": jfif_roundtrip_psnr,
    "audio_features": audio_features,
    "video_frame_stats": video_frame_stats,
    "random_pair_jaccard_hist": random_pair_jaccard_hist,
    "random_pair_true_jaccard_hist": random_pair_true_jaccard_hist,
    "lsh_hit_rate": lsh_hit_rate,
    "image_clusters": image_clusters,
}
