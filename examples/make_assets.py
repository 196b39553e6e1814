"""Generate the procedural image assets used by testscenes/logo_cube.pbrt.

The reference's rust_logo scene uses a local PNG texture + env map that are
not part of its repo; we generate equivalents (a synthetic logo texture and
an HDR sky with a bright sun) so the flagship scene is self-contained.

Usage: python examples/make_assets.py  (writes into data/)
"""
import os
import sys

import numpy as np


def make_logo(res=256) -> np.ndarray:
    """Synthetic 'logo': rings + spokes, used as a roughness/albedo map."""
    y, x = np.mgrid[0:res, 0:res].astype(np.float32)
    cx = cy = (res - 1) / 2.0
    r = np.sqrt((x - cx) ** 2 + (y - cy) ** 2) / (res / 2.0)
    phi = np.arctan2(y - cy, x - cx)
    rings = 0.5 + 0.5 * np.cos(10.0 * np.pi * r)
    spokes = 0.5 + 0.5 * np.cos(12.0 * phi)
    gear = np.clip(rings * 0.6 + spokes * 0.4, 0.0, 1.0)
    disk = (r < 0.9).astype(np.float32)
    v = gear * disk + 0.15 * (1.0 - disk)
    rgb = np.stack([v, 0.35 + 0.3 * v, 0.25 + 0.2 * (1 - v)], axis=-1)
    return rgb.astype(np.float32)


def make_sky(h=128, w=256, sun_dir=(0.3, 0.5, 0.65)) -> np.ndarray:
    """HDR equirect sky: blue gradient + warm horizon + bright sun disk.

    Row 0 is the image TOP (zenith) pre-flip; io.image flips on load."""
    v = (np.arange(h, dtype=np.float32) + 0.5) / h       # 0 = top = zenith
    u = (np.arange(w, dtype=np.float32) + 0.5) / w
    theta = np.pi * v[:, None] * np.ones((1, w), np.float32)
    phi = 2.0 * np.pi * u[None, :] * np.ones((h, 1), np.float32)
    d = np.stack([np.sin(theta) * np.cos(phi),
                  np.sin(theta) * np.sin(phi),
                  np.cos(theta)], axis=-1)
    sd = np.asarray(sun_dir, np.float32)
    sd = sd / np.linalg.norm(sd)
    cos_sun = (d * sd).sum(-1)
    sky_t = np.clip(d[..., 2], 0.0, 1.0)[..., None]
    sky = (np.array([0.35, 0.5, 0.9], np.float32) * sky_t
           + np.array([0.9, 0.75, 0.6], np.float32) * (1.0 - sky_t))
    ground = np.array([0.25, 0.22, 0.2], np.float32) * np.ones_like(sky)
    img = np.where(d[..., 2:3] >= 0.0, sky, ground)
    sun = 200.0 * np.clip((cos_sun - 0.9995) / 0.0005, 0.0, 1.0)[..., None]
    img = img + sun * np.array([1.0, 0.95, 0.9], np.float32)
    return img.astype(np.float32)


def main(out_dir="data"):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from fountain_tpu.io.exr import write_exr
    from fountain_tpu.io.image import save_image

    os.makedirs(out_dir, exist_ok=True)
    logo = make_logo()
    save_image(os.path.join(out_dir, "logo.png"), logo)
    write_exr(os.path.join(out_dir, "sky.exr"), make_sky())
    print(f"wrote {out_dir}/logo.png and {out_dir}/sky.exr")


if __name__ == "__main__":
    main()
