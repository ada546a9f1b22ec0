"""match.groups: greedy connected-image grouping (reference groups.py:25-153).

The production implementation sweeps in CSR form (concatenated chain slots);
the oracle here is the padded-array formulation it replaced — both must reach
the same Jacobi fixed point: identical groups AND identical per-chain group
tags on randomized chain graphs.
"""

import numpy as np
import pytest

from imageanalysis_tpu.match import groups


class _Img:
    def __init__(self, i):
        self.name = f"img{i:04d}"


def _oracle_compute(image_list, matches, min_chain_len=3,
                    min_group=groups.MIN_GROUP,
                    min_connections=groups.MIN_CONNECTIONS):
    """Padded-array formulation (pre-CSR), kept verbatim as the oracle."""
    from math import sqrt
    use_single_pairs = min_chain_len == 2
    n_images = len(image_list)
    max_wanted = max(int(8000 / sqrt(max(n_images, 1))), 200)
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
    prev_placed = np.zeros(n_images, bool)
    out = []
    while True:
        group_level = len(out)
        placed_matches = np.zeros(n_images, np.int64)
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
        eligible = (~assigned) & (use_single_pairs | (lengths > 2))
        slot_prev_placed = prev_placed[flat_c] & valid_slot
        slot_is_seed = (flat_c == seed_image) & valid_slot & ~slot_prev_placed
        while True:
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
            prev_placed[i] = True
            group_list.append(image_list[i].name)
        if len(group_images) >= min_group:
            out.append(sorted(group_list))
        if len(group_images) < 3:
            break
    return out


def _random_chains(rng, n_images, n_chains, two_clusters=False):
    """Chains as [uv, group_id, [img, feat], ...] records."""
    matches = []
    for _ in range(n_chains):
        k = int(rng.integers(2, 6))
        if two_clusters and n_images >= 8:
            half = n_images // 2
            base = 0 if rng.random() < 0.5 else half
            imgs = rng.choice(half, size=min(k, half), replace=False) + base
        else:
            imgs = rng.choice(n_images, size=min(k, n_images), replace=False)
        matches.append([[0.0, 0.0, 0.0], -1]
                       + [[int(i), int(rng.integers(0, 1000))] for i in imgs])
    # longest-first, as cleanup.link_matches provides
    matches.sort(key=lambda m: -len(m))
    return matches


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("min_chain_len", [2, 3])
def test_groups_match_padded_oracle(seed, min_chain_len):
    rng = np.random.default_rng(seed)
    n_images = 40
    image_list = [_Img(i) for i in range(n_images)]
    matches = _random_chains(rng, n_images, 600)
    import copy
    m_new = copy.deepcopy(matches)
    m_ref = copy.deepcopy(matches)
    got = groups.compute(image_list, m_new, min_chain_len=min_chain_len,
                         min_group=3, min_connections=5)
    want = _oracle_compute(image_list, m_ref, min_chain_len=min_chain_len,
                           min_group=3, min_connections=5)
    assert got == want
    assert [m[1] for m in m_new] == [m[1] for m in m_ref]


def test_groups_two_disjoint_clusters():
    rng = np.random.default_rng(7)
    n_images = 24
    image_list = [_Img(i) for i in range(n_images)]
    matches = _random_chains(rng, n_images, 800, two_clusters=True)
    import copy
    m_new = copy.deepcopy(matches)
    m_ref = copy.deepcopy(matches)
    got = groups.compute(image_list, m_new, min_chain_len=3,
                         min_group=3, min_connections=5)
    want = _oracle_compute(image_list, m_ref, min_chain_len=3,
                           min_group=3, min_connections=5)
    assert got == want
    assert len(got) >= 2          # both clusters found
    assert [m[1] for m in m_new] == [m[1] for m in m_ref]


def test_groups_empty_and_tiny():
    image_list = [_Img(i) for i in range(4)]
    assert groups.compute(image_list, []) == []
    # one chain of 3 images: seeds, but the group is below min_connections
    matches = [[[0.0] * 3, -1, [0, 1], [1, 2], [2, 3]]]
    got = groups.compute(image_list, matches, min_group=3, min_connections=5)
    assert got == []
