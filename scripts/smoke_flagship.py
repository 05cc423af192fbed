"""Dev smoke: flagship pipeline on the 500-row fixture + recall scoring."""

import collections
import sys
import time

import pyarrow.parquet as pq

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from hmse_ray.config import DEFAULT_CONFIG as cfg
from hmse_ray.pipelines import dedup
from hmse_ray.sources import fixtures

n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
d = fixtures.fixture_dir(n, seed=42)
images = dedup.read_images(d + "/images")
t0 = time.time()
res = dedup.flagship(images, cfg)
cl = res["clusters"].to_pandas()
print("clusters rows", len(cl), "uniq clusters", cl.cluster_id.nunique(),
      "elapsed", round(time.time() - t0, 1), flush=True)
idx = res["chunk_index"].to_pandas()
print("chunk index rows", len(idx), "max refcount", idx.refcount.max(), flush=True)
st = res["dedup_stats"].to_pandas()
print(st.to_dict("records"), flush=True)

gp = pq.read_table(d + "/golden_pairs.parquet").to_pandas()
lbl = dict(zip(cl.image_id, cl.cluster_id))
req = gp[gp.required]
hit = sum(lbl[a] == lbl[b] for a, b in zip(req.id_a, req.id_b))
print(f"required dup-pair recall: {hit}/{len(req)} = {hit/len(req):.4f}", flush=True)
allhit = sum(lbl[a] == lbl[b] for a, b in zip(gp.id_a, gp.id_b))
print(f"all planted pairs recalled: {allhit}/{len(gp)}", flush=True)
gc = pq.read_table(d + "/golden_clusters.parquet").to_pandas()
gold = dict(zip(gc.image_id, gc.cluster_id))
merged = collections.defaultdict(set)
for iid, c in lbl.items():
    merged[c].add(gold[iid])
overmerged = sum(1 for v in merged.values() if len(v) > 1)
print("clusters mixing golden groups (overmerge):", overmerged, "/", len(merged), flush=True)


# store + verify roundtrip
from hmse_ray.pipelines import verify as vfy
clusters_ds = ray.data.from_pandas(cl)
inv = vfy.roundtrip(dedup.read_images(d + "/images"), clusters_ds, cfg)
print("roundtrip invariant:", inv, flush=True)
from hmse_ray.stages import store as store_stage
st = store_stage.store_table(dedup.read_images(d + "/images"), clusters_ds, cfg)
print("store kinds:", store_stage.store_kind_stats(st).to_pandas().to_dict("records"), flush=True)
ray.shutdown()
