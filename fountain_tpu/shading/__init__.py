"""Appearance: BSDFs, Fresnel, microfacets, textures (reference L3)."""
