"""Dataset -> Dataset stage functions (the engine's operator surface).

Each stage is a pure function ``(ray.data.Dataset, Config) -> Dataset``
so pipelines compose per the reference's layer-ablation surface
(VALIDATION_METHODS.md:458-464). Stateless transforms are plain
functions passed to map_batches; stateful transforms (signature signers)
are callable classes running as actor pools.
"""
