"""Domain-randomized scene renderer — the rd/ analog.

The reference renders photoreal training/eval images with Blender Cycles plus
a large procedural-material library (ref: src/rd/render.py:9-332,
rd/render_utils.py:492-1501, rd/modify_material.py). Blender is an external
host-side process there; here the same three-call contract

  init_scene(scene)            (ref rd/render.py:9   blender_init_scene)
  render_views(scene, ...)     (ref rd/render.py:254 blender_render)
  update_sceneobj(scene)       (ref rd/render.py:238 blender_update_sceneobj)

is served by a native ray tracer (C++/OpenMP via sim.objects.PrimScene.trace)
with randomized Blinn-Phong materials per material class, randomized
multi-light rigs with shadow rays, and procedural floor/table textures. The
on-disk contract matches the reference's exactly — rgb/%04d.png +
camera_pose.npy (+ depth/mask arrays) — so the planner-side loader
(detect.planner.load_rendered_views) cannot tell the two apart.

When real Blender is wanted, run it as the host process exactly like the
reference (run_simgrasp.sh) — nothing in this module imports bpy.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .objects import PrimScene

# material classes (ref rd/modify_material.py: metal / porcelain / plastic /
# paint / glass / rubber / paper / leather / wood / clay / fabric — the
# Blinn-Phong-expressible subset, keyed by PrimObject.material % len)
MATERIAL_CLASSES = (
    "metal", "porcelain", "plastic", "paint",
    "rubber", "paper", "wood", "clay",
)

_CLASS_PARAMS = {
    #            spec,  shininess, metallic, albedo value-range
    "metal":     (0.9,  48.0,      0.9,      (0.3, 0.8)),
    "porcelain": (0.7,  64.0,      0.0,      (0.6, 0.95)),
    "plastic":   (0.5,  32.0,      0.0,      (0.2, 0.9)),
    "paint":     (0.4,  24.0,      0.0,      (0.2, 0.9)),
    "rubber":    (0.1,  8.0,       0.0,      (0.05, 0.5)),
    "paper":     (0.05, 4.0,       0.0,      (0.5, 0.95)),
    "wood":      (0.2,  12.0,      0.0,      (0.25, 0.7)),
    "clay":      (0.15, 8.0,       0.0,      (0.3, 0.7)),
}


def _value_noise(x: np.ndarray, y: np.ndarray, seed: int, scale: float
                 ) -> np.ndarray:
    """Smoothed lattice value noise in [0,1] (procedural texture base)."""
    xs, ys = x * scale, y * scale
    xi, yi = np.floor(xs).astype(np.int64), np.floor(ys).astype(np.int64)
    xf, yf = xs - xi, ys - yi

    def h(ix, iy):
        v = (ix * 374761393 + iy * 668265263 + seed * 1442695041) & 0x7fffffff
        v = (v ^ (v >> 13)) * 1274126177 & 0x7fffffff
        return (v & 0xffff) / 65535.0

    u = xf * xf * (3 - 2 * xf)
    v = yf * yf * (3 - 2 * yf)
    a = h(xi, yi) * (1 - u) + h(xi + 1, yi) * u
    b = h(xi, yi + 1) * (1 - u) + h(xi + 1, yi + 1) * u
    return a * (1 - v) + b * v


class DomainRandomizer:
    """Per-scene randomized materials + lights + floor texture
    (ref rd/render.py:10-18 per-scene seeding, :169-234 material binding)."""

    def __init__(self, rng: Optional[np.random.RandomState] = None):
        self.rng = rng if rng is not None else np.random.RandomState(0)
        self.materials: list = []
        self.lights: list = []
        self.floor: dict = {}
        self.texture_seed = 0
        self.ambient = 0.25  # overwritten by init_scene

    # ------------------------------------------------------------ sampling
    def _sample_material(self, ob) -> dict:
        rng = self.rng
        cls = MATERIAL_CLASSES[ob.material % len(MATERIAL_CLASSES)]
        spec, shin, metal, (lo, hi) = _CLASS_PARAMS[cls]
        albedo = rng.uniform(lo, hi, 3).astype(np.float32)
        return {
            "class": cls, "albedo": albedo,
            "spec": spec * rng.uniform(0.7, 1.3),
            "shin": shin * rng.uniform(0.7, 1.3),
            "metal": metal,
        }

    def init_scene(self, scene: PrimScene):
        """Sample materials for every object + the table and the light rig.

        Materials are bound to object *identity* (stored on the PrimObject, as
        the reference binds Blender materials to object UIDs —
        rd/render.py:238-251) so removing an object never re-shuffles the
        survivors' appearance across closed-loop rounds."""
        rng = self.rng
        self.materials = []
        for ob in scene.objects:
            mat = self._sample_material(ob)
            ob._dr_material = mat
            self.materials.append(mat)
        # table/floor material (ref rd/render.py:215-234)
        base = rng.uniform(0.25, 0.8)
        tint = rng.uniform(0.85, 1.0, 3)
        self.floor = {
            "albedo": (base * tint).astype(np.float32),
            "spec": rng.uniform(0.0, 0.3), "shin": rng.uniform(4, 24),
            "tex_scale": rng.uniform(15.0, 80.0),
            "tex_amp": rng.uniform(0.05, 0.35),
        }
        self.texture_seed = int(rng.randint(1, 2 ** 31 - 1))
        # 1-3 lights: direction on the upper hemisphere, warm/cool color
        n_lights = rng.randint(1, 4)
        self.lights = []
        for _ in range(n_lights):
            az = rng.uniform(0, 2 * np.pi)
            el = rng.uniform(np.deg2rad(25), np.deg2rad(80))
            d = np.array([np.cos(az) * np.cos(el), np.sin(az) * np.cos(el),
                          np.sin(el)], np.float32)
            temp = rng.uniform(-0.1, 0.1)
            color = np.clip(np.array([1 + temp, 1.0, 1 - temp]), 0, None)
            self.lights.append({
                "dir": d, "color": (color * rng.uniform(0.5, 1.1)
                                    / n_lights).astype(np.float32)})
        self.ambient = rng.uniform(0.15, 0.4)
        return self

    def update_sceneobj(self, scene: PrimScene):
        """Re-sync materials after objects were removed or added
        (ref rd/render.py:238-251). Materials follow object identity: each
        survivor keeps the material stored on it; new objects get a fresh
        sample."""
        mats = []
        for ob in scene.objects:
            mat = getattr(ob, "_dr_material", None)
            if mat is None:
                mat = self._sample_material(ob)
                ob._dr_material = mat
            mats.append(mat)
        self.materials = mats

    # ------------------------------------------------------------- shading
    def shade(self, scene: PrimScene, points, normals, ids, miss_value=0.05):
        """Blinn-Phong with shadow rays at hit `points` [N,3]."""
        N = len(points)
        table_id = scene.table_id
        hit = ids >= 0
        is_table = ids == table_id

        albedo = np.full((N, 3), miss_value, np.float32)
        spec = np.zeros(N, np.float32)
        shin = np.ones(N, np.float32)
        metal = np.zeros(N, np.float32)
        for i, m in enumerate(self.materials[:len(scene.objects)]):
            sel = ids == i
            albedo[sel] = m["albedo"]
            spec[sel] = m["spec"]
            shin[sel] = m["shin"]
            metal[sel] = m["metal"]
        if is_table.any():
            f = self.floor
            tex = _value_noise(points[is_table, 0], points[is_table, 1],
                               self.texture_seed, f["tex_scale"])
            tex = 1.0 + f["tex_amp"] * (2 * tex - 1)
            albedo[is_table] = f["albedo"][None] * tex[:, None].astype(
                np.float32)
            spec[is_table] = f["spec"]
            shin[is_table] = f["shin"]

        rgb = albedo * self.ambient
        for light in self.lights:
            ldir = light["dir"]
            lam = np.clip(normals @ ldir, 0.0, None)
            # shadow ray (objects only — lights are above the table)
            shadow = np.ones(N, np.float32)
            if hit.any() and len(scene.objects) > 0:
                o = points[hit] + normals[hit] * 1e-4
                d = np.tile(ldir[None], (int(hit.sum()), 1))
                t, _, sid = scene.trace(o, d, with_table=False)
                shadow_hit = np.isfinite(t)
                s = np.ones(int(hit.sum()), np.float32)
                s[shadow_hit] = 0.25
                shadow[hit] = s
            diffuse = albedo * (lam * shadow)[:, None]
            rgb = rgb + diffuse * light["color"][None]
        return np.clip(rgb, 0.0, 1.0), spec, shin, metal


def render_scene(scene: PrimScene, pose: np.ndarray, K: np.ndarray,
                 h: int, w: int, randomizer: Optional[DomainRandomizer] = None
                 ):
    """Render one view. Returns (rgb [h,w,3] in [0,1], z-depth [h,w]
    (0 = miss), fg_mask [h,w] bool). pose = world->cam [3,4]."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3)
    Kinv = np.linalg.inv(K)
    cam_dirs = pix @ Kinv.T
    R, t = pose[:3, :3], pose[:3, 3]
    eye = -R.T @ t
    world_dirs = cam_dirs @ R
    unit = (world_dirs / np.linalg.norm(world_dirs, axis=-1, keepdims=True)
            ).astype(np.float32)
    origins = np.broadcast_to(eye.astype(np.float32), unit.shape)

    tt, n, oid = scene.trace(origins, unit)
    hit = np.isfinite(tt)
    pts = origins + unit * np.where(hit, tt, 0.0)[:, None]

    if randomizer is None:
        # flat Lambert fallback (same look as data.synthetic.Scene.render)
        light = np.array([0.3, -0.5, 0.8])
        light /= np.linalg.norm(light)
        lam = np.clip(n @ light, 0.0, 1.0) * 0.7 + 0.3
        palette = _default_palette(len(scene.objects) + 1)
        base = palette[np.clip(oid, 0, len(palette) - 1)]
        rgb = np.where(hit[:, None], base * lam[:, None], 0.05)
    else:
        rgb, spec, shin, metal = randomizer.shade(scene, pts, n, oid)
        # specular highlights with the true view direction
        view = -unit
        for light in randomizer.lights:
            half = light["dir"][None] + view
            half /= np.linalg.norm(half, axis=-1, keepdims=True) + 1e-9
            nh = np.clip(np.sum(n * half, -1), 0.0, None)
            s = spec * nh ** np.maximum(shin, 1.0)
            tint = (1 - metal)[:, None] + metal[:, None] * rgb
            rgb = rgb + (s[:, None] * tint) * light["color"][None]
        rgb = np.clip(np.where(hit[:, None], rgb, 0.05), 0.0, 1.0)

    zdepth = np.where(hit, tt * (unit @ R[2]), 0.0)
    fg = hit & (oid >= 0) & (oid < len(scene.objects))
    return (rgb.reshape(h, w, 3).astype(np.float32),
            zdepth.reshape(h, w).astype(np.float32), fg.reshape(h, w))


def _default_palette(n: int) -> np.ndarray:
    rng = np.random.RandomState(7)
    return rng.uniform(0.2, 0.9, (max(n, 1), 3)).astype(np.float32)


def render_views_to_dir(scene: PrimScene, poses: np.ndarray, K: np.ndarray,
                        h: int, w: int, outdir: str,
                        randomizer: Optional[DomainRandomizer] = None,
                        frame_ids=None, write_depth: bool = False,
                        write_mask: bool = False):
    """Write the reference's file contract (ref rd/render.py:254-332 +
    dataset/database.py:110-111): rgb/%04d.png for each frame id +
    camera_pose.npy [V,4,4] world->cam for ALL poses."""
    from PIL import Image
    os.makedirs(os.path.join(outdir, "rgb"), exist_ok=True)
    if write_depth:
        os.makedirs(os.path.join(outdir, "depth"), exist_ok=True)
    if write_mask:
        os.makedirs(os.path.join(outdir, "mask"), exist_ok=True)
    frame_ids = (list(range(len(poses))) if frame_ids is None
                 else list(frame_ids))
    for fid in frame_ids:
        rgb, depth, fg = render_scene(scene, poses[fid], K, h, w, randomizer)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(outdir, "rgb", f"{fid:04d}.png"))
        if write_depth:
            np.save(os.path.join(outdir, "depth", f"{fid:04d}.npy"), depth)
        if write_mask:
            np.save(os.path.join(outdir, "mask", f"{fid:04d}.npy"),
                    fg.astype(np.uint8))
    # camera_pose.npy follows the reference contract: cam->world matrices in
    # Blender camera axes (ref dataset/database.py:110-111, the loader
    # computes world->cam = inv(pose @ BLENDER2OPENCV))
    from ..data.database import BLENDER2OPENCV
    exts = np.tile(np.eye(4, dtype=np.float32)[None], (len(poses), 1, 1))
    exts[:, :3, :] = poses
    cams = np.linalg.inv(exts) @ BLENDER2OPENCV[None]
    np.save(os.path.join(outdir, "camera_pose.npy"), cams.astype(np.float32))
    return outdir
