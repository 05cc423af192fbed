"""Deterministic synthetic image+caption fixtures with golden dup labels.

Reference analog: the host-side dataset prep (S5,
VALIDATION_METHODS.md:115-147, 215-220) — seeded, reproducible corpora
with SHA-256 manifests. This sandbox has no external data
(BASELINE.json), so the corpus is synthesized: a Lance-shaped table
(columns image_id, bytes, w, h, fmt, caption, phash — BASELINE.json
input_hint; materialized as parquet since lance is not installed) with
PLANTED duplicate structure whose golden cluster labels are known by
construction:

  * exact-dup groups    — identical (bytes, caption) under fresh ids
                          ("write 5 copies" test, README.md:1210, 2153)
  * caption near-dups   — token-level variants; the generator measures
                          the REALIZED 4-byte-shingle Jaccard of every
                          planted pair ("100 similar variants" test,
                          README.md:2154)
  * image near-dups     — same base picture re-encoded (jpeg) or lightly
                          perturbed, captions unique (SimHash path)
  * unique singletons   — high-entropy captions+images (random-data
                          worst case, VALIDATION_METHODS.md:213)

Golden outputs: cluster assignment per image_id plus the planted dup-pair
list with realized similarity, from which dup-pair recall >= 0.99 is
scored over the *reliably detectable* pairs (exact dups; caption pairs
with realized shingle Jaccard >= 0.99; image pairs with simhash Hamming
distance <= 3 — with b=4 16-bit simhash bands, <= 3 flipped bits leaves
one band intact by pigeonhole). The reference's own operating point
(b=4, r=32) detects a single s=0.90 pair only ~13% of the time
(README.md:2261 formula), so lower-similarity pairs are planted for the
LSH-curve test but not counted against recall.

Everything derives from a single integer seed; identical inputs across
runs (VALIDATION_METHODS.md:125-128).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from hmse_ray.config import Config, DEFAULT_CONFIG
from hmse_ray.functions import imagecodec, minhash, simhash

IMG_W, IMG_H = 64, 48
FIXTURE_VERSION = 4  # bump when generation logic changes (invalidates /tmp cache)
# v4: fmt="png" payloads are real spec-compliant PNGs (functions/pngcodec.py)

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def _vocab(rng: np.random.Generator, n=400) -> list[str]:
    syll = ["ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne",
            "pa", "qui", "ro", "su", "ta", "ve", "wo", "xy", "za", "the"]
    out = []
    for _ in range(n):
        k = rng.integers(2, 5)
        out.append("".join(rng.choice(syll) for _ in range(k)))
    return out


def _caption(rng: np.random.Generator, vocab: list[str], n_tokens: int) -> list[str]:
    # Wikipedia-infobox-style boilerplate prefix creates realistic
    # cross-document redundancy (README.md:1175-1180)
    boiler = ("infobox settlement name type region population area elevation "
              "timezone coordinates website established density").split()
    body = [vocab[i] for i in rng.integers(0, len(vocab), n_tokens)]
    return boiler + body


def _perturb_tokens(rng, tokens: list[str], vocab: list[str], frac: float) -> list[str]:
    out = list(tokens)
    n_edit = max(1, int(len(out) * frac))
    idx = rng.choice(len(out), size=n_edit, replace=False)
    for i in idx:
        out[i] = vocab[rng.integers(0, len(vocab))]
    return out


def _base_pixels(rng: np.random.Generator) -> np.ndarray:
    """Structurally diverse picture: random coarse 12x16 block pattern
    (drives the perceptual-hash grid features apart between distinct
    images) upsampled 4x, plus mild fine noise. Distinct draws land
    ~32 bits apart in SimHash space; small perturbations / lossy
    re-enceds stay within a few bits."""
    coarse = rng.integers(0, 256, (IMG_H // 4, IMG_W // 4, 3))
    img = np.kron(coarse, np.ones((4, 4, 1), dtype=np.int64))
    img = img + rng.integers(-8, 9, (IMG_H, IMG_W, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _tok_jaccard_shingles(a: str, b: str) -> float:
    sa = minhash.shingles_u32(a.encode())
    sb = minhash.shingles_u32(b.encode())
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / (sa.size + sb.size - inter)


def generate_images(
    n_rows: int,
    seed: int = 42,
    cfg: Config = DEFAULT_CONFIG,
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Generate the images table + golden labels.

    Returns (images, golden_clusters, golden_pairs):
      images:          IMAGES_SCHEMA, n_rows rows
      golden_clusters: (image_id, cluster_id) — cluster_id = min image_id
                       of the planted group (singletons cluster alone)
      golden_pairs:    (id_a, id_b, kind, similarity, required) — all
                       planted dup pairs; ``required`` marks the pairs
                       counted in the recall >= 0.99 gate
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    proj = simhash.projection_matrix(cfg)

    ids: list[str] = []
    blobs: list[bytes] = []
    fmts: list[str] = []
    caps: list[str] = []
    phs: list[int] = []
    cluster_of: dict[str, str] = {}
    pairs: list[tuple[str, str, str, float, bool]] = []

    def add_row(pix: np.ndarray, fmt: str, caption: str) -> str:
        iid = f"img{len(ids):08d}"
        ids.append(iid)
        blobs.append(imagecodec.encode(pix, fmt))
        fmts.append(fmt)
        caps.append(caption)
        phs.append(simhash.phash64(imagecodec.decode(blobs[-1], IMG_W, IMG_H, fmt)))
        return iid

    def new_group(members: list[str]):
        root = min(members)
        for m in members:
            cluster_of[m] = root

    # group plan: fractions of rows by structure
    i = 0
    while i < n_rows:
        r = rng.random()
        remaining = n_rows - i
        if r < 0.20 and remaining >= 3:
            # exact-dup group: k identical copies
            k = min(int(rng.integers(2, 6)), remaining)
            pix = _base_pixels(rng)
            fmt = str(rng.choice(["png", "jpeg"]))
            cap = " ".join(_caption(rng, vocab, int(rng.integers(120, 500))))
            members = [add_row(pix, fmt, cap) for _ in range(k)]
            new_group(members)
            for a in range(k):
                for b in range(a + 1, k):
                    pairs.append((members[a], members[b], "exact", 1.0, True))
            i += k
        elif r < 0.50 and remaining >= 2:
            # caption near-dup group at a controlled edit level
            k = min(int(rng.integers(2, 5)), remaining)
            target_s = float(rng.choice([0.75, 0.85, 0.90, 0.95, 0.99]))
            # token edit fraction roughly mapping to shingle jaccard
            frac = max(0.002, (1.0 - target_s) * 0.6)
            base_tokens = _caption(rng, vocab, int(rng.integers(150, 500)))
            base_cap = " ".join(base_tokens)
            members = []
            caps_local = [base_cap]
            pix0 = _base_pixels(rng)
            members.append(add_row(pix0, "png", base_cap))
            for _ in range(k - 1):
                var = " ".join(_perturb_tokens(rng, base_tokens, vocab, frac))
                caps_local.append(var)
                members.append(add_row(_base_pixels(rng), "png", var))
            new_group(members)
            for a in range(k):
                for b in range(a + 1, k):
                    s = _tok_jaccard_shingles(caps_local[a], caps_local[b])
                    pairs.append((members[a], members[b], "caption", s, s >= 0.99))
            i += k
        elif r < 0.65 and remaining >= 2:
            # image near-dup group: same picture re-encoded / perturbed,
            # unique captions
            k = min(int(rng.integers(2, 4)), remaining)
            pix = _base_pixels(rng)
            members = [
                add_row(pix, "png", " ".join(_caption(rng, vocab, int(rng.integers(100, 300)))))
            ]
            sims_local = [simhash.simhash64(pix, proj, cfg)]
            for _ in range(k - 1):
                mode = rng.random()
                if mode < 0.5:
                    fmt2, pix2 = "jpeg", pix  # re-encode lossy
                else:
                    pix2 = np.clip(
                        pix.astype(np.int16) + rng.integers(-2, 3, pix.shape), 0, 255
                    ).astype(np.uint8)
                    fmt2 = "png"
                dec = imagecodec.decode(imagecodec.encode(pix2, fmt2), IMG_W, IMG_H, fmt2)
                sims_local.append(simhash.simhash64(dec, proj, cfg))
                members.append(
                    add_row(pix2, fmt2, " ".join(_caption(rng, vocab, int(rng.integers(100, 300)))))
                )
            new_group(members)
            sarr = np.array(sims_local, dtype=np.int64)
            for a in range(k):
                for b in range(a + 1, k):
                    ham = int(simhash.hamming64(sarr[a : a + 1], sarr[b : b + 1])[0])
                    pairs.append((members[a], members[b], "image", 1.0 - ham / 64.0, ham <= 3))
            i += k
        else:
            # unique singleton: high-entropy caption + image
            alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz0123456789", dtype=np.uint8)
            n_tok = int(rng.integers(80, 300))
            mat = alpha[rng.integers(0, alpha.size, (n_tok, 9))]
            mat[:, 8] = 32  # space separator
            cap = mat.tobytes().decode()[:-1]
            iid = add_row(_base_pixels(rng), "png", cap)
            cluster_of[iid] = iid
            i += 1

    images = pa.table(
        {
            "image_id": ids,
            "bytes": blobs,
            "w": pa.array([IMG_W] * len(ids), pa.int32()),
            "h": pa.array([IMG_H] * len(ids), pa.int32()),
            "fmt": fmts,
            "caption": caps,
            "phash": pa.array(phs, pa.int64()),
        },
        schema=IMAGES_SCHEMA,
    )
    golden_clusters = pa.table(
        {
            "image_id": ids,
            "cluster_id": [cluster_of[i_] for i_ in ids],
        }
    )
    golden_pairs = pa.table(
        {
            "id_a": [p[0] for p in pairs],
            "id_b": [p[1] for p in pairs],
            "kind": [p[2] for p in pairs],
            "similarity": pa.array([p[3] for p in pairs], pa.float64()),
            "required": pa.array([p[4] for p in pairs], pa.bool_()),
        }
    )
    return images, golden_clusters, golden_pairs


def fixture_dir(n_rows: int, seed: int = 42, root: str = "/tmp/hmse_fixtures") -> str:
    """Materialize (once) the fixture as parquet; returns the directory.

    Layout: {root}/n{n_rows}_s{seed}/{images,golden_clusters,golden_pairs}.parquet
    Cached by (n_rows, seed) — generation is deterministic so the cache
    is always valid.
    """
    d = os.path.join(root, f"v{FIXTURE_VERSION}_n{n_rows}_s{seed}")
    marker = os.path.join(d, "_SUCCESS")
    if not os.path.exists(marker):
        images, gc, gp = generate_images(n_rows, seed)
        tmp = d + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        # images are SHARDED (16 files) so ray.data reads them with file
        # parallelism — a single parquet file reads in one task
        write_sharded(images, os.path.join(tmp, "images"), shards=16)
        pq.write_table(gc, os.path.join(tmp, "golden_clusters.parquet"))
        pq.write_table(gp, os.path.join(tmp, "golden_pairs.parquet"))
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok")
        if os.path.exists(d):
            import shutil

            shutil.rmtree(d)
        os.replace(tmp, d)
    return d


def write_sharded(table: pa.Table, out_dir: str, shards: int = 8) -> list[str]:
    """Write a table as N parquet file shards (the input layout a real
    100 TB corpus would have; partition unit for resumable runs)."""
    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    per = -(-n // shards)
    files = []
    for s in range(shards):
        part = table.slice(s * per, per)
        if part.num_rows == 0:
            continue
        f = os.path.join(out_dir, f"shard_{s:04d}.parquet")
        pq.write_table(part, f)
        files.append(f)
    return files


IMG_SEED = 505  # murmur seed for derived-image pixels (distinct from audio/video)


def image_pixels_for_doc(doc_id: int) -> np.ndarray:
    """Deterministic (IMG_H, IMG_W, 3) uint8 pixels for one document:
    pixel[p] = murmur3((doc_id*KEY_MUL + p) mod 2^32, IMG_SEED) % 256 —
    the same SQL-reproducible construction as the audio waveforms and
    video frames, so the image decode/resize path gets a bit-exact
    DuckDB oracle instead of a rows-only check (VERDICT r3 item 4)."""
    from hmse_ray.functions import murmur3

    npx = IMG_W * IMG_H * 3
    base = np.uint32((int(doc_id) * _KEY_MUL) & 0xFFFFFFFF)
    keys = base + np.arange(npx, dtype=np.uint32)
    h = murmur3.murmur3_u32(keys, IMG_SEED)
    return (h % np.uint32(256)).astype(np.uint8).reshape(IMG_H, IMG_W, 3)


def _image_rows_from_docs(docs: pa.Table, seed: int) -> pa.Table:
    """One batch of documents -> image rows, derived PER doc_id so the
    derivation is deterministic under any batching/partitioning (the
    ``seed`` parameter affects nothing today — pixels are murmur3 of the
    doc_id so the SQL oracle can regenerate them; kept for signature
    stability).

    Each document becomes one image row (caption = doc text, murmur
    noise picture); every 7th document also gets an exact-dup row and
    every 11th a near-dup caption variant, planting known redundancy.
    """
    doc_ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    ids, blobs, fmts, caps, phs = [], [], [], [], []
    for did, text in zip(doc_ids, texts):
        pix = image_pixels_for_doc(did)
        fmt = "jpeg" if did % 3 == 0 else "png"
        enc = imagecodec.encode(pix, fmt)
        dec = imagecodec.decode(enc, IMG_W, IMG_H, fmt)
        ph = simhash.phash64(dec)
        ids.append(f"doc{did:08d}")
        blobs.append(enc)
        fmts.append(fmt)
        caps.append(text)
        phs.append(ph)
        if did % 7 == 0:  # exact dup
            ids.append(f"doc{did:08d}x")
            blobs.append(enc)
            fmts.append(fmt)
            caps.append(text)
            phs.append(ph)
        if did % 11 == 0:  # near-dup caption variant
            ids.append(f"doc{did:08d}v")
            blobs.append(enc)
            fmts.append(fmt)
            caps.append(text[: max(0, len(text) - 12)] + " trailing edit")
            phs.append(ph)
    return pa.table(
        {
            "image_id": ids,
            "bytes": blobs,
            "w": pa.array([IMG_W] * len(ids), pa.int32()),
            "h": pa.array([IMG_H] * len(ids), pa.int32()),
            "fmt": fmts,
            "caption": caps,
            "phash": pa.array(phs, pa.int64()),
        },
        schema=IMAGES_SCHEMA,
    )


def images_from_documents_ds(sf_dir: str, cfg: Config = DEFAULT_CONFIG, seed: int = 42):
    """STREAMING derivation of the images table from documents.parquet:
    rows are synthesized inside map_batches over the documents Dataset —
    the driver never materializes the input (VERDICT r01: entry() input
    synthesis was a driver-side loop)."""
    import ray.data as rd

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return docs.map_batches(
        lambda t: _image_rows_from_docs(t, seed), batch_format="pyarrow"
    )


def images_from_documents(sf_dir: str, cfg: Config = DEFAULT_CONFIG, seed: int = 42) -> pa.Table:
    """In-memory variant of images_from_documents_ds (tests/tools); same
    rows as the streaming derivation by construction (per-doc_id seeds)."""
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return _image_rows_from_docs(docs, seed)


# --- audio / video derivations (murmur3 waveforms: SQL-reproducible) --------
# Sample values are murmur3_u32 of a per-(doc, position) key, so the
# DuckDB oracle regenerates the exact waveform with the same CTE chain
# used for the MinHash/winnowing oracles — clip features (sum of squares
# is integer) verify bit-for-bit, not rows-only.

AUDIO_RATE = 16000
AUDIO_SEED = 909
AUDIO_DOC_MOD = 5   # every 5th doc gets a clip (bounds oracle cost)
VIDEO_SEED = 707
VIDEO_DOC_MOD = 7
VIDEO_W, VIDEO_H = 16, 12
_KEY_MUL = 2654435761  # Knuth multiplicative constant
_FRAME_MUL = 65599

AUDIO_SCHEMA = pa.schema(
    [("clip_id", pa.string()), ("bytes", pa.binary()), ("fmt", pa.string())]
)
VIDEO_SCHEMA = pa.schema(
    [("video_id", pa.string()), ("bytes", pa.binary()), ("fmt", pa.string())]
)


def audio_samples_for_doc(doc_id: int, text: str) -> np.ndarray:
    """Deterministic int16 waveform for one document (uniform murmur
    noise in [-8192, 8191]); n_samples varies with the text length."""
    from hmse_ray.functions import murmur3

    n = 800 + (len(text.encode()) * 7) % 3200
    base = np.uint32((int(doc_id) * _KEY_MUL) & 0xFFFFFFFF)
    keys = base + np.arange(n, dtype=np.uint32)
    h = murmur3.murmur3_u32(keys, AUDIO_SEED)
    return (h % np.uint32(16384)).astype(np.int64).astype(np.int16) - np.int16(8192)


def _audio_rows_from_docs(docs: pa.Table) -> pa.Table:
    from hmse_ray.functions import audiocodec

    ids, blobs = [], []
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        did = int(did)
        if did % AUDIO_DOC_MOD:
            continue
        ids.append(f"aud{did:08d}")
        blobs.append(audiocodec.encode_wav(
            audio_samples_for_doc(did, text or ""), AUDIO_RATE))
    return pa.table(
        {"clip_id": ids, "bytes": blobs, "fmt": ["wav"] * len(ids)},
        schema=AUDIO_SCHEMA,
    )


def audio_from_documents_ds(sf_dir: str):
    """STREAMING derivation of a WAV clip table from documents.parquet
    (same pattern as images_from_documents_ds)."""
    import ray.data as rd

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return docs.map_batches(_audio_rows_from_docs, batch_format="pyarrow")


def video_frames_for_doc(doc_id: int, text: str) -> np.ndarray:
    """Deterministic (n_frames, VIDEO_H, VIDEO_W) uint8 gray frames:
    pixel = murmur3(doc*MUL + frame*FRAME_MUL + pos) % 256."""
    from hmse_ray.functions import murmur3

    n_frames = 8 + len(text.encode()) % 25
    npx = VIDEO_W * VIDEO_H
    frame = np.repeat(np.arange(n_frames, dtype=np.uint32), npx)
    pos = np.tile(np.arange(npx, dtype=np.uint32), n_frames)
    base = np.uint32((int(doc_id) * _KEY_MUL) & 0xFFFFFFFF)
    keys = base + frame * np.uint32(_FRAME_MUL) + pos
    h = murmur3.murmur3_u32(keys, VIDEO_SEED)
    return (h % np.uint32(256)).astype(np.uint8).reshape(n_frames, VIDEO_H, VIDEO_W)


def _video_rows_from_docs(docs: pa.Table) -> pa.Table:
    from hmse_ray.functions import videocodec

    ids, blobs = [], []
    for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        did = int(did)
        if did % VIDEO_DOC_MOD:
            continue
        ids.append(f"vid{did:08d}")
        blobs.append(videocodec.encode_video(video_frames_for_doc(did, text or "")))
    return pa.table(
        {"video_id": ids, "bytes": blobs, "fmt": ["hvid"] * len(ids)},
        schema=VIDEO_SCHEMA,
    )


def video_from_documents_ds(sf_dir: str):
    """STREAMING derivation of an HVID video table from documents.parquet."""
    import ray.data as rd

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return docs.map_batches(_video_rows_from_docs, batch_format="pyarrow")
