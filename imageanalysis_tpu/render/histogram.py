"""Neighborhood histogram matching for seamless mosaics.

Reference histogram.py:18-135: per-image RGB histograms; for each image a
"template" histogram = 1/distance-weighted average of neighbors within 40 m
(self at 10% of the neighbor mass); textures are remapped at load time by
quantile mapping onto the template. Persisted as a pickle the explorer loads.

The histogram math runs batched in numpy (256-bin ops on ≤ thousands of
images are not device work); the per-pixel LUT application happens where the
texture is loaded.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def image_histogram_rgb(proj, image, scale=0.25):
    import cv2

    rgb = cv2.imread(proj.image_path(image),
                     flags=cv2.IMREAD_ANYCOLOR | cv2.IMREAD_IGNORE_ORIENTATION)
    if rgb.ndim == 2:
        rgb = cv2.cvtColor(rgb, cv2.COLOR_GRAY2BGR)
    scaled = cv2.resize(rgb, (0, 0), fx=scale, fy=scale)
    chans = cv2.split(scaled)  # b, g, r order from cv2
    return tuple(np.bincount(c.ravel(), minlength=256).astype(np.float32)
                 for c in chans)


def make_histograms(proj, image_list=None):
    image_list = image_list if image_list is not None else proj.image_list
    return {im.name: image_histogram_rgb(proj, im) for im in image_list}


def make_templates(proj, histograms, dist_cutoff=40.0, self_weight=0.1):
    """Per-image quantile templates (reference histogram.py:39-96)."""
    image_list = [im for im in proj.image_list if im.name in histograms]
    poses = np.array([im.get_camera_pose()[0] for im in image_list])
    templates = {}
    for i, i1 in enumerate(image_list):
        acc = None
        wsum = 0.0
        d = np.linalg.norm(poses - poses[i], axis=1)
        for j, i2 in enumerate(image_list):
            if i == j or d[j] > dist_cutoff:
                continue
            w = 1.0 if d[j] <= 1 else 1.0 / d[j]
            h = histograms[i2.name]
            acc = ([c * w for c in h] if acc is None
                   else [a + c * w for a, c in zip(acc, h)])
            wsum += w
        w = self_weight * wsum if wsum > 0 else 1.0
        h = histograms[i1.name]
        acc = ([c * w for c in h] if acc is None
               else [a + c * w for a, c in zip(acc, h)])
        wsum += w
        quants = []
        for c in acc:
            q = np.cumsum(c / wsum)
            quants.append(q / q[-1])
        templates[i1.name] = tuple(quants)
    return templates


def match_to_template(img_bgr, own_hists, template_quants):
    """Quantile-map each channel of an image onto the template
    (reference histogram.py:98-119 match_neighbors)."""
    out = img_bgr.copy()
    for ch in range(3):
        own_q = np.cumsum(own_hists[ch])
        own_q = own_q / own_q[-1]
        lut = np.searchsorted(template_quants[ch], own_q).clip(0, 255)
        out[..., ch] = lut.astype(np.uint8)[img_bgr[..., ch]]
    return out


def save(analysis_dir, histograms, templates):
    with open(os.path.join(analysis_dir, "histogram.pickle"), "wb") as f:
        pickle.dump({"histograms": histograms, "templates": templates}, f)


def load(analysis_dir):
    path = os.path.join(analysis_dir, "histogram.pickle")
    if not os.path.isfile(path):
        return None, None
    with open(path, "rb") as f:
        d = pickle.load(f)
    return d["histograms"], d["templates"]
