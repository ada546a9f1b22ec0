"""Minimal aura-props `props_json` shim: JSON <-> PropertyNode.

Implements the three entry points the reference uses (process.py:40,
project.py save/load, pose.py meta writes): load(path, node), save(path,
node), overlay(dest, src). JSON objects map to subnodes, scalars/lists map
to typed attributes, so config.json / meta/*.json round-trip with the same
document shape the real aura-props produces.
"""

from __future__ import annotations

import json

from props import PropertyNode


def _merge_dict(node: PropertyNode, data: dict) -> None:
    for k, v in data.items():
        if isinstance(v, dict):
            child = node.getChild(k, create=True)
            _merge_dict(child, v)
        else:
            node._entries[k] = v


def load(path, node) -> bool:
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return False
    if not isinstance(data, dict):
        return False
    _merge_dict(node, data)
    return True


def _to_dict(node: PropertyNode) -> dict:
    out = {}
    for k, v in node._entries.items():
        out[k] = _to_dict(v) if isinstance(v, PropertyNode) else v
    return out


def save(path, node) -> bool:
    try:
        with open(path, "w") as f:
            json.dump(_to_dict(node), f, indent=4, sort_keys=True)
            f.write("\n")
    except OSError:
        return False
    return True


def overlay(dest: PropertyNode, src: PropertyNode) -> None:
    """Recursively copy src's entries onto dest (src wins)."""
    for k, v in src._entries.items():
        if isinstance(v, PropertyNode):
            child = dest.getChild(k, create=True)
            overlay(child, v)
        else:
            dest._entries[k] = list(v) if isinstance(v, list) else v
