"""End-to-end pipelines composed from hmse_ray.stages."""
