"""Explorer texture pipeline: corrections, shader filters, LRU paging.

Mirrors the reference explorer's texture handling:

- base 512² textures get histogram matching, vignette correction and CLAHE
  'value' equalization at load (reference explorer.py:229-307);
- the "top" image under the view center is paged in at full resolution
  from the project's originals, run through the same corrections plus the
  selected display filter, and kept in an LRU cache of 10
  (reference explorer.py:386-689, ``tcache``/``cachesize``);
- display filters are numpy equivalents of explore/myshader.frag and the
  explorer's ``filter_by`` modes: the GLSL red/green-ratio emphasis runs
  as vectorized math on the texture instead of in a fragment shader (no
  GPU rasterizer here — the data product is identical).
"""

from __future__ import annotations

import os
import time

import numpy as np

from . import histogram

FILTERS = ("none", "equalize_value", "equalize_rgb", "equalize_red",
           "equalize_green", "equalize_blue", "red/green", "shader")


def _clahe(clip=1.0):
    import cv2

    return cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8))


def equalize_value(bgr, clip=1.0):
    """CLAHE on the HSV value channel (explorer.py filter 'equalize_value')."""
    import cv2

    hsv = cv2.cvtColor(bgr, cv2.COLOR_BGR2HSV)
    hue, sat, val = cv2.split(hsv)
    aeq = _clahe(clip).apply(val)
    return cv2.cvtColor(cv2.merge((hue, sat, aeq)), cv2.COLOR_HSV2BGR)


def equalize_rgb(bgr, clip=1.0):
    import cv2

    b, g, r = cv2.split(bgr)
    c = _clahe(clip)
    return cv2.merge((c.apply(b), c.apply(g), c.apply(r)))


def equalize_channel(bgr, channel):
    """Hue-distance channel emphasis (explorer.py equalize_red/green/blue):
    distance of each pixel's hue from the target hue scaled by saturation,
    written into the corresponding output channel."""
    import cv2

    hsv = cv2.cvtColor(bgr, cv2.COLOR_BGR2HSV)
    hue, sat, _ = cv2.split(hsv)
    target = {"red": 0.0, "green": 60.0, "blue": 120.0}[channel]
    diff = np.mod(hue.astype(np.float64) - target + 90.0, 180.0)
    diff = 1.0 - np.abs(diff - 90.0) / 90.0
    chan = (diff * sat).astype(np.uint8)
    zeros = np.zeros(hue.shape, np.uint8)
    out = {"red": (zeros, zeros, chan), "green": (zeros, chan, zeros),
           "blue": (chan, zeros, zeros)}[channel]
    return cv2.merge(out)


def red_green_ratio(bgr, max_ratio=4.0):
    """explorer.py 'red/green': r/g and g/r ratio channels."""
    import cv2

    b, g, r = cv2.split(bgr)
    ratio = np.clip(r / (g.astype(np.float64) + 1.0), 0, max_ratio)
    inv = np.clip(g / (r.astype(np.float64) + 1.0), 0, max_ratio)
    return cv2.merge((np.zeros_like(b),
                      (inv * (255.0 / max_ratio)).astype(np.uint8),
                      (ratio * (255.0 / max_ratio)).astype(np.uint8)))


def _smoothstep(e0, e1, x):
    t = np.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def shader_red_emphasis(bgr):
    """Numpy port of explore/myshader.frag's active branch: emphasize
    dominant-red pixels, luminance-gated against basement noise."""
    f = bgr.astype(np.float32) / 255.0
    b, g, r = f[..., 0], f[..., 1], f[..., 2]
    red = r / np.maximum(g, 0.01)
    green = g / np.maximum(r, 0.01)
    lum = 0.21 * r + 0.72 * g + 0.07 * b
    lum_factor = _smoothstep(0.0, 0.2, lum)
    out = np.zeros_like(f)
    out[..., 2] = _smoothstep(0.9, 3.0, red * lum_factor)
    out[..., 1] = _smoothstep(0.5, 2.5, green)
    return (out * 255.0).astype(np.uint8)


def apply_filter(bgr, mode):
    if mode in (None, "none"):
        return bgr
    if mode == "equalize_value":
        return equalize_value(bgr)
    if mode == "equalize_rgb":
        return equalize_rgb(bgr)
    if mode in ("equalize_red", "equalize_green", "equalize_blue"):
        return equalize_channel(bgr, mode.split("_")[1])
    if mode == "red/green":
        return red_green_ratio(bgr)
    if mode == "shader":
        return shader_red_emphasis(bgr)
    raise ValueError(f"unknown filter {mode}")


class TextureManager:
    """Loads corrected textures with an LRU full-resolution cache.

    proj: ProjectMgr. Corrections applied in reference order: histogram
    matching → vignette → filter (CLAHE value-equalize by default)."""

    CACHE_SIZE = 10          # reference explorer.py cachesize = 10
    MAX_TEXTURE_DIM = 4096   # stand-in for the GPU max texture query

    def __init__(self, proj, filter_mode="equalize_value"):
        self.proj = proj
        self.models_dir = proj.models_dir
        self.filter_mode = filter_mode
        self.tcache = {}     # name -> [bgr, timestamp]
        self.histograms, self.templates = histogram.load(proj.analysis_dir)
        self.vignette_full = None
        self.vignette_small = None
        vfile = os.path.join(proj.analysis_dir, "vignette-mask.jpg")
        if os.path.isfile(vfile):
            import cv2

            self.vignette_full = cv2.imread(vfile)
            self.vignette_small = cv2.resize(self.vignette_full, (512, 512))

    @staticmethod
    def _ensure_bgr(img):
        if img is None or img.ndim == 3 and img.shape[2] == 3:
            return img
        import cv2

        if img.ndim == 2:
            return cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
        return cv2.cvtColor(img, cv2.COLOR_BGRA2BGR)

    def _correct(self, bgr, name, vignette):
        if self.templates and name in self.templates:
            own = (self.histograms.get(name)
                   or histogram.image_histogram_rgb(
                       self.proj, self.proj.image_by_name(name)))
            bgr = histogram.match_to_template(bgr, own, self.templates[name])
        if vignette is not None:
            import cv2

            if vignette.shape[:2] != bgr.shape[:2]:
                vignette = cv2.resize(vignette,
                                      (bgr.shape[1], bgr.shape[0]))
            bgr = np.clip(bgr.astype(np.uint16) + vignette,
                          0, 255).astype(np.uint8)
        return apply_filter(bgr, self.filter_mode)

    def load_base(self, name):
        """512² model texture with corrections (explorer.py:264-307)."""
        import cv2

        for ext in (".JPG", ".jpg"):
            p = os.path.join(self.models_dir, name + ext)
            if os.path.isfile(p):
                bgr = cv2.imread(p, flags=cv2.IMREAD_ANYCOLOR
                                 | cv2.IMREAD_IGNORE_ORIENTATION)
                return self._correct(self._ensure_bgr(bgr), name,
                                     self.vignette_small)
        return None

    def load_full(self, name):
        """Full-resolution texture through the LRU cache
        (explorer.py:476-689 updateTexture + tcache eviction)."""
        if name in self.tcache:
            entry = self.tcache[name]
            entry[1] = time.time()
            return entry[0]
        import cv2

        image_file = None
        search = [self.proj.project_dir,
                  os.path.join(self.proj.project_dir, "images")]
        for d in search:
            for ext in (".JPG", ".jpg"):
                p = os.path.join(d, name + ext)
                if os.path.isfile(p):
                    image_file = p
        if image_file is None:
            return None
        bgr = self._ensure_bgr(
            cv2.imread(image_file, flags=cv2.IMREAD_ANYCOLOR
                       | cv2.IMREAD_IGNORE_ORIENTATION))
        h, w = bgr.shape[:2]
        m = self.MAX_TEXTURE_DIM
        if h > m or w > m:
            s = m / max(h, w)
            bgr = cv2.resize(bgr, (int(w * s), int(h * s)))
        bgr = self._correct(bgr, name, self.vignette_full)
        self.tcache[name] = [bgr, time.time()]
        while len(self.tcache) > self.CACHE_SIZE:
            oldest = min(self.tcache, key=lambda k: self.tcache[k][1])
            del self.tcache[oldest]
        return bgr


def build_histograms(proj, dist_cutoff=40.0, self_weight=0.1):
    """Compute + persist the neighborhood histogram-match tables
    (reference lib/histogram.py make_histograms/make_templates/save)."""
    hists = histogram.make_histograms(proj)
    templates = histogram.make_templates(proj, hists,
                                         dist_cutoff=dist_cutoff,
                                         self_weight=self_weight)
    histogram.save(proj.analysis_dir, hists, templates)
    return hists, templates
