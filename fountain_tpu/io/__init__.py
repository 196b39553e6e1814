"""Scene frontends & image I/O (reference L7 + imageio)."""
