"""Multi-chip sharding: device meshes, sharded MSM, batch-axis parallelism."""
