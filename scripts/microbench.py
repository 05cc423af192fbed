"""Per-kernel microbenchmarks mirroring the reference's Benchmarks 1-5
(README.md:2343-2700) — DEFLATE, FastCDC, SHA-256, MinHash, plus our
SimHash/decode. Prints a table vs the reference per-layer budgets
(README.md:288-291) and appends BENCH/MICRO.md. Pure single-core kernel
numbers; no Ray session."""

import hashlib
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hmse_ray.config import DEFAULT_CONFIG as cfg
from hmse_ray.functions import fastcdc, imagecodec, minhash, simhash


def timeit(fn, data_mb, reps=3):
    fn()  # warm
    best = min((lambda: (lambda t0: (fn(), time.time() - t0)[1])(time.time()))() for _ in range(reps))
    return data_mb / best


def main():
    rng = np.random.default_rng(42)
    text = rng.integers(0, 256, 8_000_000, dtype=np.uint8).tobytes()
    mb = len(text) / 1e6
    rows = []

    # Benchmark 1: DEFLATE level 9 (reference budget ~1.5 MB/s on ESP32)
    comp_text = (b"the quick brown fox jumps over the lazy dog " * 200000)[:8_000_000]
    rows.append(("L1 DEFLATE-9 compress", timeit(lambda: zlib.compress(comp_text, 9), mb), 1.5))
    # Benchmark 2: FastCDC chunking (~8 MB/s budget)
    rows.append(("L2 FastCDC chunking", timeit(lambda: fastcdc.chunk_boundaries(text, cfg), mb), 8.0))
    # Benchmark 3: SHA-256 (~15 MB/s budget)
    rows.append(("L3 SHA-256", timeit(lambda: hashlib.sha256(text).digest(), mb), 15.0))
    # Benchmark 4: MinHash n=128 (~1.2 MB/s budget; <=1.5 ms / 4KB chunk)
    docs = [text[i * 4096 : (i + 1) * 4096] for i in range(256)]
    mh_mb = 256 * 4096 / 1e6
    rows.append(("L4 MinHash n=128", timeit(lambda: minhash.signatures(docs, cfg), mh_mb), 1.2))
    # SimHash + decode (graft)
    px = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    blob = imagecodec.encode(px, "png")
    proj = simhash.projection_matrix(cfg)

    def simjob():
        for _ in range(200):
            simhash.simhash64(imagecodec.decode(blob, 64, 48, "png"), proj, cfg)

    sim_mb = 200 * len(blob) / 1e6
    rows.append(("SimHash decode+sign", timeit(simjob, sim_mb), float("nan")))

    # Audio WAV decode + features (graft r3: pure-numpy RIFF parser)
    from hmse_ray.functions import audiocodec, videocodec

    samples = rng.integers(-8192, 8192, 2_000_000, dtype=np.int16)
    wav = audiocodec.encode_wav(samples, 16000)
    wav_mb = len(wav) / 1e6

    def wavjob():
        s, rate, _ = audiocodec.decode_wav(wav)
        audiocodec.audio_features(s, rate)

    rows.append(("Audio WAV decode+features", timeit(wavjob, wav_mb), float("nan")))

    # Video HVID frame sampling (1-in-4 seek reads vs full decode)
    frames = rng.integers(0, 256, (2000, 12, 16), dtype=np.uint8)
    vid = videocodec.encode_video(frames)
    vid_mb = len(vid) / 1e6

    def vidjob():
        w, h, n = videocodec.probe(vid)
        for fi in range(0, n, 4):
            videocodec.decode_frame(vid, fi)

    rows.append(("Video HVID 1-in-4 frame sample", timeit(vidjob, vid_mb), float("nan")))

    # Suffix array build + greedy longest-match scan (bsdiff role, r4)
    from hmse_ray.functions import delta, jpegcodec, suffixarray

    base = text[:65536]
    blocks = [base[i : i + 4096] for i in range(0, len(base), 4096)]
    target = b"".join(reversed(blocks))
    sa_mb = (len(base) + len(target)) / 1e6

    def sajob():
        sa = suffixarray.build(base)
        i = 0
        while i < len(target):
            _, ln = suffixarray.longest_match(base, sa, target, i)
            i += max(ln, 1)

    rows.append(("Suffix array build+match (64KB)", timeit(sajob, sa_mb), float("nan")))

    # Delta encode (hash ops + zdict smallest-wins) on a near-dup pair
    nd_target = base[:300] + b"EDIT" + base[300:]
    d_mb = len(nd_target) / 1e6
    rows.append(
        ("Delta encode (near-dup 64KB)", timeit(lambda: delta.delta_encode(base, nd_target, cfg), d_mb), float("nan"))
    )

    # Bloom semi-join filter + HLL registers (r4): vectorized sha-hex
    # kernels — throughput in MB of sha-hex keys per second
    from hmse_ray.functions import bloom, hll

    shas = [hashlib.sha256(str(i).encode()).hexdigest() for i in range(200_000)]
    sha_mb = 64 * len(shas) / 1e6
    bf = bloom.Bloom(1 << 22, k=7).add_many(shas)
    rows.append(("Bloom add 200k keys", timeit(lambda: bloom.Bloom(1 << 22, k=7).add_many(shas), sha_mb), float("nan")))
    rows.append(("Bloom probe 200k keys", timeit(lambda: bf.contains_many(shas), sha_mb), float("nan")))
    rows.append(("HLL registers 200k keys", timeit(lambda: hll.registers64(shas, 12), sha_mb), float("nan")))
    # r5: int64-key bloom (LSH bucket semi-join for near-dup ingest)
    ikeys = (np.arange(200_000, dtype=np.int64) * 0x9E3779B9) - 7
    ik_mb = ikeys.nbytes / 1e6
    ibf = bloom.Bloom(1 << 22, k=7).add_many_i64(ikeys)
    rows.append(("Bloom i64 add 200k buckets", timeit(lambda: bloom.Bloom(1 << 22, k=7).add_many_i64(ikeys), ik_mb), float("nan")))
    rows.append(("Bloom i64 probe 200k buckets", timeit(lambda: ibf.contains_many_i64(ikeys), ik_mb), float("nan")))

    # Real JFIF codec (r4): encode / decode 96x72 RGB
    jpx = rng.integers(0, 256, (72, 96, 3), dtype=np.uint8)
    j_mb = jpx.nbytes / 1e6
    rows.append(("JFIF encode 96x72 q98", timeit(lambda: jpegcodec.jfif_encode(jpx, 98), j_mb), float("nan")))
    jblob = jpegcodec.jfif_encode(jpx, 98)
    rows.append(("JFIF decode 96x72", timeit(lambda: jpegcodec.jfif_decode(jblob), j_mb), float("nan")))

    lines = [
        "| kernel | this repo (MB/s, 1 core) | reference budget (MB/s, ESP32-S3) |",
        "|---|---|---|",
    ]
    for name, got, budget in rows:
        b = "—" if budget != budget else f"{budget}"
        lines.append(f"| {name} | {got:.1f} | {b} |")
    table = "\n".join(lines)
    print(table)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/MICRO.md", "w") as f:
        f.write(
            "# Kernel microbenchmarks (reference Benchmarks 1-5 analog)\n\n"
            "Reference budgets are ESP32-S3 @240 MHz projections "
            "(README.md:288-291); ours are single-core numbers on this host "
            "(multiply by usable cores for stage throughput).\n\n" + table + "\n"
        )


if __name__ == "__main__":
    main()
