"""Shapes, intersection, and acceleration (reference L2)."""
