"""Connected-image grouping (reference groups.py:25-153).

Greedy algorithm, faithful to the reference: seed each group with the
unplaced feature chain having the most connections, then iteratively sweep
all chains, adding any chain that touches the group (≥2 placed-ish images or
the seed image) and still contributes needed connections, with per-image
quotas max_wanted = clamp(8000/√n, ≥200) and acceptance thresholds
min_connections=25 / min_group=7. Chains are tagged with their group id in
match[1]; groups persist as groups.json (list of image-name lists).
"""

from __future__ import annotations

import json
import os
from math import sqrt

import numpy as np

from ..io.logger import log

MIN_GROUP = 7
MIN_CONNECTIONS = 25


def compute(image_list, matches, min_chain_len=3, min_group=MIN_GROUP,
            min_connections=MIN_CONNECTIONS):
    """matches must be sorted longest-chain-first (cleanup.link_matches)."""
    log("Start of grouping algorithm...")
    use_single_pairs = min_chain_len == 2
    n_images = len(image_list)
    max_wanted = max(int(8000 / sqrt(max(n_images, 1))), 200)
    log("max features desired per image:", max_wanted)

    # pre-extract chain image lists
    chain_imgs = [np.array([m[0] for m in match[2:]], np.int32)
                  for match in matches]
    for match in matches:
        match[1] = -1

    placed_images: set[int] = set()
    groups = []

    while True:
        group_level = len(groups)
        placed_matches = np.zeros(n_images, np.int64)

        # seed: unaffiliated chain with most connections to unplaced images
        max_connections = 2
        seed_index = -1
        for i, match in enumerate(matches):
            if match[1] < 0:
                imgs = chain_imgs[i]
                placed_mask = np.fromiter((im in placed_images for im in imgs),
                                          bool, len(imgs))
                if placed_mask.any():
                    continue
                count = len(imgs)
                if count > max_connections:
                    max_connections = count
                    seed_index = i
        if seed_index == -1:
            break
        seed_image = int(chain_imgs[seed_index][1]) if len(chain_imgs[seed_index]) > 1 \
            else int(chain_imgs[seed_index][0])
        matches[seed_index][1] = group_level
        np.add.at(placed_matches, chain_imgs[seed_index], 1)
        log("Seeding group with:", image_list[seed_image].name
            if hasattr(image_list[seed_image], "name") else seed_image)

        still_working = True
        while still_working:
            still_working = False
            for i, match in enumerate(matches):
                if match[1] >= 0:
                    continue
                imgs = chain_imgs[i]
                if not use_single_pairs and len(imgs) <= 2:
                    continue
                placed_count = 0
                placed_need_count = 0
                unplaced_count = 0
                seed_connection = False
                for im in imgs:
                    im = int(im)
                    if im in placed_images:
                        continue
                    if im == seed_image:
                        seed_connection = True
                    pm = placed_matches[im]
                    if pm >= max_wanted:
                        placed_count += 1
                    elif pm >= min_connections:
                        placed_count += 1
                        placed_need_count += 1
                    elif pm > 0:
                        placed_need_count += 1
                    else:
                        unplaced_count += 1
                if placed_count > 1 or (use_single_pairs and placed_count > 0) \
                        or seed_connection:
                    if placed_need_count > 0 or unplaced_count > 0:
                        match[1] = group_level
                        np.add.at(placed_matches, imgs, 1)
                        still_working = True

        group_images = set(int(i) for i in np.nonzero(
            placed_matches >= min_connections)[0])
        group_list = []
        for i in group_images:
            placed_images.add(i)
            group_list.append(image_list[i].name
                              if hasattr(image_list[i], "name") else str(i))
        if len(group_images) >= min_group:
            log("Group %d: %d images" % (group_level, len(group_list)))
            groups.append(sorted(group_list))
        if len(group_images) < 3:
            break
    return groups


def save(analysis_dir, groups):
    with open(os.path.join(analysis_dir, "groups.json"), "w") as f:
        json.dump(groups, f, indent=4, sort_keys=True)


def load(analysis_dir):
    path = os.path.join(analysis_dir, "groups.json")
    if not os.path.isfile(path):
        return []
    with open(path) as f:
        return json.load(f)
