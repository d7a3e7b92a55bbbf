"""Device parallelism: meshes, sharded batch pipelines, collectives."""
