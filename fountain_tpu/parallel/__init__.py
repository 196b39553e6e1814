"""Multi-chip parallelism: pixel-sharded rendering over a device mesh."""
