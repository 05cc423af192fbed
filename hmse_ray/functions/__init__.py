"""Pure, deterministic, vectorized kernels.

Every function here is a pure function of (content, Config) — no global
state, no wall clock, no unseeded RNG. Stages in hmse_ray.stages wrap these
into Ray Data map_batches bodies.
"""
