"""Integrators: the render engine (reference L6)."""
