"""Generate the committed DR asset banks (run once; outputs are committed).

  graspnerf_tpu/assets/envmaps/*.npz   small equirect environment maps
                                       (HDRI analogs: sky/sun, indoor,
                                       dusk, overcast)
  graspnerf_tpu/assets/textures/*.png  albedo texture images (wood rings,
                                       fabric weave, marble, checker,
                                       speckle, paper fiber)

Real HDRIs/photos can replace or extend these via $GRASPNERF_HDRI_DIR /
$GRASPNERF_TEX_DIR (sim/render.py loaders).
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from graspnerf_tpu.sim.render import _value_noise  # noqa: E402

ROOT = Path(__file__).resolve().parents[1] / "graspnerf_tpu" / "assets"


def _dirs(H, W):
    v, u = np.meshgrid((np.arange(H) + 0.5) / H, (np.arange(W) + 0.5) / W,
                       indexing="ij")
    az = (u - 0.5) * 2 * np.pi
    el = (0.5 - v) * np.pi
    return np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                     np.sin(el)], -1)


def make_envmaps(H=32, W=64):
    out = ROOT / "envmaps"
    out.mkdir(parents=True, exist_ok=True)
    d = _dirs(H, W)
    z = d[..., 2]

    def save(name, img):
        np.savez_compressed(out / f"{name}.npz",
                            img=np.clip(img, 0, 4).astype(np.float16))
        print("wrote", out / f"{name}.npz")

    # clear sky with sun disc
    sun = np.array([0.5, 0.3, 0.81])
    sun /= np.linalg.norm(sun)
    cos = np.clip((d * sun).sum(-1), 0, 1)
    sky = (np.array([0.35, 0.55, 0.9])[None, None] * np.clip(z, 0, 1)[..., None]
           + np.array([0.75, 0.8, 0.85])[None, None]
           * (1 - np.clip(z, 0, 1))[..., None])
    ground = np.array([0.25, 0.2, 0.16])[None, None] * np.ones((H, W, 3))
    img = np.where(z[..., None] > 0, sky, ground)
    img += (cos ** 200)[..., None] * np.array([3.0, 2.8, 2.2])
    save("sky_sun", img)

    # indoor: warm ceiling panels
    n = _value_noise(d[..., 0] * 0.5 + 0.5, d[..., 1] * 0.5 + 0.5, 11, 6.0)
    panels = ((n > 0.6) & (z > 0.3)).astype(np.float32)
    img = (0.18 + 0.1 * np.clip(z, 0, 1))[..., None] * np.array([1.0, 0.95, 0.85])
    img += panels[..., None] * np.array([1.8, 1.7, 1.4])
    save("indoor_panels", img)

    # dusk: orange horizon band
    band = np.exp(-(z / 0.18) ** 2)
    img = (np.array([0.1, 0.12, 0.25])[None, None]
           * np.clip(z, 0, 1)[..., None]
           + np.array([0.1, 0.08, 0.1])[None, None])
    img += band[..., None] * np.array([0.9, 0.45, 0.15])
    save("dusk", img)

    # overcast: flat gray with soft cloud noise
    n = _value_noise(d[..., 0] + 2, d[..., 1] - 1, 23, 3.0)
    img = (0.45 + 0.25 * np.clip(z, 0, 1) + 0.15 * n)[..., None] \
        * np.array([0.95, 0.97, 1.0])
    img = np.where(z[..., None] > -0.05, img,
                   np.array([0.2, 0.19, 0.18])[None, None] * (1 + 0 * img))
    save("overcast", img)


def make_textures(S=96):
    from PIL import Image
    out = ROOT / "textures"
    out.mkdir(parents=True, exist_ok=True)
    y, x = np.meshgrid((np.arange(S) + 0.5) / S, (np.arange(S) + 0.5) / S,
                       indexing="ij")

    def save(name, img):
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            out / f"{name}.png")
        print("wrote", out / f"{name}.png")

    # wood rings
    cx, cy = -0.2, 0.45
    r = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
    rings = 0.5 + 0.5 * np.sin(r * 60 + 3 * _value_noise(x, y, 3, 4.0))
    img = (np.array([0.45, 0.3, 0.17])[None, None]
           * (0.75 + 0.5 * rings)[..., None])
    save("wood_rings", img)

    # fabric weave
    wx = 0.5 + 0.5 * np.sin(x * S * 1.2 * np.pi)
    wy = 0.5 + 0.5 * np.sin(y * S * 1.2 * np.pi)
    weave = 0.6 + 0.4 * np.maximum(wx, wy) * (0.8 + 0.4 * _value_noise(
        x, y, 5, 9.0))
    save("fabric_weave", np.stack([weave * 0.55, weave * 0.55, weave * 0.65],
                                  -1))

    # marble
    v = _value_noise(x, y, 7, 3.0) + 0.5 * _value_noise(x, y, 8, 7.0)
    veins = 0.5 + 0.5 * np.sin((x + y) * 9 + v * 7)
    img = (0.75 + 0.25 * veins)[..., None] * np.array([0.95, 0.93, 0.9])
    save("marble", img)

    # checker
    cells = ((np.floor(x * 8) + np.floor(y * 8)) % 2)
    img = (0.35 + 0.55 * cells)[..., None] * np.array([0.9, 0.85, 0.8])
    save("checker", img)

    # speckle (terrazzo-ish)
    n1 = _value_noise(x, y, 13, 25.0)
    img = np.where((n1 > 0.75)[..., None],
                   np.array([0.8, 0.45, 0.35])[None, None],
                   np.array([0.55, 0.55, 0.5])[None, None]) \
        * (0.8 + 0.3 * _value_noise(x, y, 14, 6.0))[..., None]
    save("speckle", img)

    # paper fiber
    f = (0.85 + 0.1 * _value_noise(x * 4, y, 17, 40.0)
         + 0.05 * _value_noise(x, y, 18, 90.0))
    save("paper_fiber", np.stack([f, f, f * 0.97], -1))


if __name__ == "__main__":
    make_envmaps()
    make_textures()
