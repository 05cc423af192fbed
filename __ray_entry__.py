"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship dedup pipeline (SURVEY.md section 3.1) on
an image+caption table deterministically derived from
/root/testdata/sf0.001/documents.parquet. ``queries()`` exposes one
callable per implemented operator (SURVEY.md section 2 coverage map in
hmse_ray/pipelines/queries.py); ``oracle_sql()`` gives DuckDB
equivalents for the SQL-expressible subset.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in hmse_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _tuned(fn: Callable) -> Callable:
    """Apply the session DataContext tuning (min_parallelism sized to the
    cluster — NOT ray.init; the driver owns the session) before a query
    runs. Idempotent and cheap."""

    def wrapped(*a, **kw):
        try:
            from hmse_ray.util import tune_data_context

            tune_data_context()
        except Exception:
            pass
        return fn(*a, **kw)

    return wrapped


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: image+caption table ->
    dedup cluster assignments (image_id, cluster_id)."""
    from hmse_ray.pipelines.queries import image_clusters

    return _tuned(image_clusters)("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md section 2."""
    from hmse_ray.pipelines.queries import QUERIES

    return {name: _tuned(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for the SQL-expressible subset of queries().

    Hash-based operators (MinHash signatures + band LSH, SimHash over
    variable-length tokens, winnowing fingerprints, FastCDC gear cuts,
    murmur-planted embeddings, murmur-pixel image decode/resize) are
    reproduced bit-for-bit via generated murmur3/splitmix CTE chains
    (queries.py:_mm_chain_sql and friends). Omitted — irreducibly, each
    documented in its query docstring — are only: zlib compression
    (compression_accounting[_shared], store_kind_stats,
    roundtrip_invariant), the approximate-by-design ANN variants
    (ann_topk_lsh[_partitioned]/ivf/ann_recall, checked instead by the
    ann_recall >= 0.9 gate vs the oracle-verified brute force and by
    the partitioned==broadcast equality pin), jfif_roundtrip_psnr
    (float DCT; gated by the PSNR >= 40 dB invariant instead), and
    image_clusters (float SimHash dot products — numpy pairwise
    summation is not reproducible in SQL). The driver records
    rows-only checks for those 10.
    """
    from hmse_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
