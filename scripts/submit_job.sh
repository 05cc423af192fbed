#!/usr/bin/env bash
# Launch the flagship dedup pipeline on a fixed-size multi-node Ray
# cluster via `ray job submit` (the north rule's launch path).
#
#   RAY_ADDRESS=http://<head>:8265 ./scripts/submit_job.sh \
#       s3://bucket/images_lance_or_parquet s3://bucket/clusters_out
#
# The job ships this repo as the working dir; hmse_ray.run connects to
# the job's cluster through the RAY_ADDRESS the job server exports (see
# hmse_ray/run.py). Scaling protocol: submit the same job to the N-node
# and 4N-node clusters and compare images/sec — the sandbox stand-in
# for this is `python bench.py --scaling` (fresh ray.init at 2 and 8
# CPUs), recorded in BENCH/BASELINE.md.
#
# NOTE: `ray job submit` needs the cluster dashboard API, which this
# sandbox disables (include_dashboard=False, single node) — so this
# script is exercised against real clusters, while every pipeline it
# launches is covered by pytest + bench.py locally.
set -euo pipefail

INPUT="${1:?usage: submit_job.sh INPUT_URI OUTPUT_URI [NUM_CPUS_HINT]}"
OUTPUT="${2:?usage: submit_job.sh INPUT_URI OUTPUT_URI [NUM_CPUS_HINT]}"

exec ray job submit \
  --working-dir "$(dirname "$0")/.." \
  --runtime-env-json '{"env_vars": {"PYTHONPATH": "."}}' \
  -- python -m hmse_ray.run cluster --input "$INPUT" --output "$OUTPUT"
