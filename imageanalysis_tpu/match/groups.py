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

    # pre-extract chain image lists into one padded array (built once):
    # flat (n_chains, max_len) of image ids, −1 padding
    chain_imgs = [np.array([m[0] for m in match[2:]], np.int32)
                  for match in matches]
    for match in matches:
        match[1] = -1
    max_len = max((len(c) for c in chain_imgs), default=0)
    flat = np.full((len(matches), max_len), -1, np.int64)
    for i, c in enumerate(chain_imgs):
        flat[i, :len(c)] = c
    valid_slot = flat >= 0
    flat_c = np.where(valid_slot, flat, 0)
    lengths = valid_slot.sum(1)
    assigned = np.zeros(len(matches), bool)

    placed_images: set[int] = set()
    prev_placed = np.zeros(n_images, bool)
    groups = []

    while True:
        group_level = len(groups)
        placed_matches = np.zeros(n_images, np.int64)

        # seed: unaffiliated chain (touching no placed image) with the most
        # connections — vectorized over all chains
        has_placed = (prev_placed[flat_c] & valid_slot).any(1)
        cand = (~assigned) & ~has_placed & (lengths > 2)
        if not cand.any():
            break
        seed_index = int(np.argmax(np.where(cand, lengths, 0)))
        seed_image = int(chain_imgs[seed_index][1]) \
            if len(chain_imgs[seed_index]) > 1 \
            else int(chain_imgs[seed_index][0])
        matches[seed_index][1] = group_level
        assigned[seed_index] = True
        np.add.at(placed_matches, chain_imgs[seed_index], 1)
        log("Seeding group with:", image_list[seed_image].name
            if hasattr(image_list[seed_image], "name") else seed_image)

        # vectorized expansion sweeps. The reference updates placed_matches
        # WITHIN a sweep (Gauss–Seidel); evaluating each sweep against the
        # previous sweep's counts (Jacobi) reaches the same fixed point in a
        # few more sweeps and turns the per-chain Python loop into flat
        # numpy over all chains — at 10⁵–10⁶ chains the difference is
        # minutes vs hours.
        eligible = (~assigned) & (use_single_pairs | (lengths > 2))
        slot_prev_placed = prev_placed[flat_c] & valid_slot
        slot_is_seed = (flat_c == seed_image) & valid_slot & ~slot_prev_placed

        still_working = True
        while still_working:
            pm = placed_matches[flat_c]
            live = valid_slot & ~slot_prev_placed
            full = live & (pm >= max_wanted)
            need_hi = live & (pm >= min_connections) & (pm < max_wanted)
            need_lo = live & (pm > 0) & (pm < min_connections)
            unplaced = live & (pm == 0)
            placed_count = (full | need_hi).sum(1)
            placed_need = (need_hi | need_lo).sum(1)
            unplaced_count = unplaced.sum(1)
            seed_conn = slot_is_seed.any(1)
            add = eligible & (
                (placed_count > 1)
                | (use_single_pairs & (placed_count > 0))
                | seed_conn) & ((placed_need > 0) | (unplaced_count > 0))
            if not add.any():
                still_working = False
                break
            for i in np.nonzero(add)[0]:
                matches[i][1] = group_level
            assigned |= add
            np.add.at(placed_matches, flat_c[add][valid_slot[add]], 1)
            eligible &= ~add

        group_images = set(int(i) for i in np.nonzero(
            placed_matches >= min_connections)[0])
        group_list = []
        for i in group_images:
            placed_images.add(i)
            prev_placed[i] = True
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
