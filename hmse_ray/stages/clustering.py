"""Connected components -> cluster assignments (north_rule output).

Reference analog: base-pointer chains group near-identical chunks around
a canonical base (README.md:1419-1427, 1456); the graft's required
output is a ``cluster_id`` per image = min image_id of its connected
component over LSH candidate edges (SURVEY.md section 1.3).

Design: the LSH membership table reduces to STAR EDGES per bucket
(member -> bucket-min) with one groupby+map_groups — singleton buckets
(the overwhelming majority) emit nothing, so the edge set is tiny
relative to the input: only near-duplicate members carry edges. Then:

* ``components_unionfind`` — edges pulled to the driver, exact
  union-find. Right whenever edges fit driver memory (they are ids
  only; ~100 bytes/edge — hundreds of millions of dup pairs fit).
* ``components_distributed`` — alternating large-star / small-star
  rounds (Kiveris et al., "Connected Components in MapReduce and
  Beyond", public algorithm): pure groupby+map_groups edge rewrites,
  NO joins, converges to star graphs rooted at each component minimum.
  Used when the edge set is too big for the driver; skew-safe because
  every round's groups are node-adjacency lists and hot nodes shrink
  monotonically toward stars.

``cluster_stage`` picks the path by edge count (threshold documented) —
labels for images with no dup edge default to their own id, applied as
a broadcast map over the full id column (no shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data.aggregate import Count, Min

from hmse_ray.config import Config, DEFAULT_CONFIG

# Above this many candidate edges, switch to the distributed CC path.
# Driver union-find at ~100 B/edge: 5e7 edges ~= 5 GB driver heap.
DRIVER_EDGE_LIMIT = 50_000_000


def _bucket_star_group(group: pa.Table) -> pa.Table:
    """(bucket group) -> star edges (bucket-min -> member), ids only."""
    n = group.num_rows
    if n < 2:
        return pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    ids = group["image_id"].to_pylist()
    rep = min(ids)
    dst = [i for i in ids if i != rep]
    return pa.table({"src": pa.array([rep] * len(dst), pa.string()), "dst": pa.array(dst)})


def _dedup_src_dst(edges_ds):
    """Distinct (src, dst) via one packed string key (see lsh.dedup_pair_edges)."""
    import pyarrow.compute as pc

    def pack(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pairkey", pc.binary_join_element_wise(t["src"], t["dst"], "|")
        )

    return (
        edges_ds.map_batches(pack, batch_format="pyarrow")
        .groupby("pairkey")
        .aggregate(Min("src", alias_name="src"), Min("dst", alias_name="dst"))
        .drop_columns(["pairkey"])
    )


def star_edges(membership_ds):
    """(image_id, bucket) membership -> deduplicated (src, dst) edges."""
    edges = membership_ds.groupby("bucket").map_groups(
        _bucket_star_group, batch_format="pyarrow"
    )
    return _dedup_src_dst(edges)


def components_unionfind(edges: list[tuple[str, str]],
                         all_ids: list[str] | None = None) -> dict[str, str]:
    """Exact union-find on the driver; cluster_id = min member id."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        if rb < ra:  # min-id wins as root => cluster_id = component min
            ra, rb = rb, ra
        parent[rb] = ra

    for a, b in edges:
        union(a, b)
    members = set(all_ids or [])
    for a, b in edges:
        members.add(a)
        members.add(b)
    return {m: find(m) for m in members}


def _large_star_group(group: pa.Table) -> pa.Table:
    """large-star: connect strictly-greater neighbors to the local min."""
    u = group["node"][0].as_py()
    nbrs = group["nbr"].to_pylist()
    m = min([u] + nbrs)
    out_s, out_d = [], []
    for v in nbrs:
        if v > u and v != m:
            out_s.append(min(v, m))
            out_d.append(max(v, m))
    return pa.table({"src": pa.array(out_s, pa.string()), "dst": pa.array(out_d, pa.string())})


def _small_star_group(group: pa.Table) -> pa.Table:
    """small-star: connect not-greater neighbors (and u) to the local min."""
    u = group["node"][0].as_py()
    nbrs = [v for v in group["nbr"].to_pylist() if v <= u]
    m = min([u] + nbrs)
    out_s, out_d = [], []
    for v in nbrs + [u]:
        if v != m:
            out_s.append(m)
            out_d.append(v)
    return pa.table({"src": pa.array(out_s, pa.string()), "dst": pa.array(out_d, pa.string())})


def _as_adjacency(edges_ds, direction: str):
    """edges -> (node, nbr) rows; 'both' emits each edge twice."""

    def explode(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks() if isinstance(t["src"], pa.ChunkedArray) else t["src"]
        d = t["dst"].combine_chunks() if isinstance(t["dst"], pa.ChunkedArray) else t["dst"]
        if direction == "both":
            return pa.table(
                {"node": pa.concat_arrays([s, d]), "nbr": pa.concat_arrays([d, s])}
            )
        return pa.table({"node": s, "nbr": d})

    return edges_ds.map_batches(explode, batch_format="pyarrow")


def components_distributed(edges_ds, max_rounds: int = 10):
    """Large-star/small-star CC; returns (image_id, cluster_id) for nodes
    WITH at least one edge. Converges when the small-star edge set is a
    stable set of stars (checked via count + sum-of-hash aggregate)."""
    def edge_checksum(ds):
        def h(t: pa.Table) -> pa.Table:
            from hmse_ray.functions import murmur3

            vals = [
                murmur3.murmur3_bytes(f"{a}|{b}".encode(), 17)
                for a, b in zip(t["src"].to_pylist(), t["dst"].to_pylist())
            ]
            return pa.table(
                {"h": pa.array([sum(vals)], pa.int64()), "n": pa.array([len(vals)], pa.int64())}
            )

        r = ds.map_batches(h, batch_format="pyarrow").materialize()
        return (r.sum("h") or 0, r.sum("n") or 0)

    cur = edges_ds
    prev_sig = None
    for _ in range(max_rounds):
        ls = _as_adjacency(cur, "both").groupby("node").map_groups(
            _large_star_group, batch_format="pyarrow"
        )
        merged = cur.union(ls)
        ss = _as_adjacency(merged, "both").groupby("node").map_groups(
            _small_star_group, batch_format="pyarrow"
        )
        cur = _dedup_src_dst(ss).materialize()
        sig = edge_checksum(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    # stable star edges: src is the component min for every dst
    def emit(t: pa.Table) -> pa.Table:
        return pa.table({"image_id": t["dst"], "cluster_id": t["src"]})

    roots = cur.map_batches(
        lambda t: pa.table({"image_id": t["src"], "cluster_id": t["src"]}),
        batch_format="pyarrow",
    )
    return (
        cur.map_batches(emit, batch_format="pyarrow")
        .union(roots)
        .groupby("image_id")
        .aggregate(Min("cluster_id", alias_name="cluster_id"))
    )


def cluster_from_edges(edges_ds, images_ds, cfg: Config = DEFAULT_CONFIG,
                       force_distributed: bool | None = None):
    """verified edges (src, dst) + images -> (image_id, cluster_id) for ALL images.

    Picks driver union-find vs distributed CC by edge count. The label
    map for dup members is broadcast via ray.put and applied to the full
    id column inside map_batches — singletons label themselves; no
    all-to-all join of the full input anywhere.
    """
    schema = edges_ds.schema()
    if schema is None:  # no candidate edges at all -> everything singleton
        import pyarrow as _pa

        import ray.data as _rd

        edges_ds = _rd.from_arrow(
            _pa.table({"src": _pa.array([], _pa.string()), "dst": _pa.array([], _pa.string())})
        )
        schema = edges_ds.schema()
    names = schema.names
    if "id_a" in names:  # candidate-pair schema -> generic edge schema
        edges_ds = edges_ds.select_columns(["id_a", "id_b"]).rename_columns(
            {"id_a": "src", "id_b": "dst"}
        )
    elif set(names) - {"src", "dst"}:
        edges_ds = edges_ds.select_columns(["src", "dst"])
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    use_driver = (
        not force_distributed if force_distributed is not None else n_edges <= DRIVER_EDGE_LIMIT
    )
    ids_ds = images_ds.select_columns(["image_id"])
    if use_driver:
        if n_edges == 0:
            labels = {}
        else:
            et = edges_ds.to_pandas()
            labels = components_unionfind(list(zip(et["src"], et["dst"])))
        ref = ray.put(labels)

        def assign(t: pa.Table) -> pa.Table:
            lbl = ray.get(ref)
            ids = t["image_id"].to_pylist()
            return pa.table(
                {
                    "image_id": t["image_id"],
                    "cluster_id": pa.array([lbl.get(i, i) for i in ids], pa.string()),
                }
            )

        return ids_ds.map_batches(assign, batch_format="pyarrow")
    # distributed path: CC labels for edge-bearing nodes, then a
    # left-anti fill for singletons via hash join on image_id
    from hmse_ray.util import join_partitions

    lbl = components_distributed(edges_ds)
    joined = ids_ds.join(
        lbl, join_type="left_outer", num_partitions=join_partitions(),
        on=("image_id",),
    )

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "image_id": t["image_id"],
                "cluster_id": pc.coalesce(t["cluster_id"], t["image_id"]),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


def cluster_stage(membership_ds, images_ds, cfg: Config = DEFAULT_CONFIG,
                  force_distributed: bool | None = None):
    """UNVERIFIED path: membership -> star edges -> components.

    Cheapest possible candidate linking (ids only through the shuffle);
    use only when band collision alone is trustworthy (r=32 MinHash
    bands). The flagship uses verified pair edges instead — see
    pipelines.dedup.
    """
    edges_ds = star_edges(membership_ds)
    return cluster_from_edges(
        edges_ds, images_ds, cfg, force_distributed=force_distributed
    )
