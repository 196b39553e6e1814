"""Scene data model, camera, film: the I/O of the estimator (reference L2/L5)."""
