"""Minimal aura-props shim: the global property tree the reference expects.

The reference pipeline (/root/reference/scripts) stores all configuration and
per-image metadata in the `props` package's global property tree (reference
process.py:39, camera.py, image.py, smart.py). The real aura-props package is
not installed in this environment, so this shim implements exactly the API
surface the reference's canonical path uses — written from the observed call
sites, not copied from aura-props:

    getNode(path, create=False) -> PropertyNode | None
    PropertyNode: getString/setString, getFloat/setFloat, getInt/setInt,
        getBool/setBool, getLen/setLen, getFloatEnum/setFloatEnum,
        getChild(name, create=False), getChildren(), hasChild(name),
        pretty_print()

Semantics chosen to match aura-props behavior relied on by the reference:
- typed getters coerce and return zero-values ("" / 0.0 / 0 / False) for
  missing attributes without creating them;
- hasChild() is true for both subnodes and value attributes (the reference
  calls it on floats, e.g. matcher.py:372 `matcher_node.hasChild("ground_m")`);
- enum attributes are python lists; setLen resizes, setFloatEnum writes;
- single-point access is squeezed exactly as the call sites require.
"""

from __future__ import annotations


class PropertyNode:
    def __init__(self):
        # one namespace per node: name -> PropertyNode (subnode) or value
        # (scalar / list attribute); insertion-ordered like a python dict
        self._entries = {}

    # -- children ----------------------------------------------------------
    def getChild(self, name, create=False):
        # '/'-separated paths walk multiple levels (aura-props allows this)
        node = self
        parts = [p for p in str(name).split("/") if p]
        for part in parts:
            nxt = node._entries.get(part)
            if not isinstance(nxt, PropertyNode):
                if not create:
                    return None
                nxt = PropertyNode()
                node._entries[part] = nxt
            node = nxt
        return node

    def getChildren(self, expand=True):
        return [k for k, v in self._entries.items()
                if isinstance(v, PropertyNode)]

    def hasChild(self, name):
        return name in self._entries

    # -- typed attribute accessors ------------------------------------------
    def _get(self, name, default):
        v = self._entries.get(name)
        if v is None or isinstance(v, PropertyNode):
            return default
        return v

    def getString(self, name):
        v = self._get(name, "")
        return v if isinstance(v, str) else str(v)

    def getFloat(self, name):
        try:
            return float(self._get(name, 0.0))
        except (TypeError, ValueError):
            return 0.0

    def getInt(self, name):
        try:
            return int(float(self._get(name, 0)))
        except (TypeError, ValueError):
            return 0

    def getBool(self, name):
        v = self._get(name, False)
        if isinstance(v, str):
            return v.lower() in ("true", "1", "yes")
        return bool(v)

    def setString(self, name, val):
        self._entries[name] = str(val)

    def setFloat(self, name, val):
        self._entries[name] = float(val)

    def setInt(self, name, val):
        self._entries[name] = int(val)

    def setBool(self, name, val):
        self._entries[name] = bool(val)

    # -- enumerated (list) attributes ----------------------------------------
    def getLen(self, name):
        v = self._entries.get(name)
        return len(v) if isinstance(v, list) else 0

    def setLen(self, name, n, init_val=None):
        v = self._entries.get(name)
        if not isinstance(v, list):
            v = []
        fill = 0.0 if init_val is None else init_val
        if len(v) < n:
            v = v + [fill] * (n - len(v))
        else:
            v = v[:n]
        self._entries[name] = v

    def getFloatEnum(self, name, i):
        v = self._entries.get(name)
        if isinstance(v, list) and 0 <= i < len(v):
            try:
                return float(v[i])
            except (TypeError, ValueError):
                return 0.0
        return 0.0

    def setFloatEnum(self, name, i, val):
        v = self._entries.get(name)
        if not isinstance(v, list):
            v = []
        if len(v) <= i:
            v = v + [0.0] * (i + 1 - len(v))
        v[i] = float(val)
        self._entries[name] = v

    # -- debug ---------------------------------------------------------------
    def pretty_print(self, indent=""):
        for k, v in self._entries.items():
            if isinstance(v, PropertyNode):
                print(indent + k + "/")
                v.pretty_print(indent + "  ")
            else:
                print(indent + k + " =", v)


root = PropertyNode()


def getNode(path, create=False):
    """Return the node at '/'-separated *path*, creating it if asked."""
    parts = [p for p in str(path).split("/") if p]
    node = root
    for part in parts:
        nxt = node._entries.get(part)
        if not isinstance(nxt, PropertyNode):
            if not create:
                return None
            nxt = PropertyNode()
            node._entries[part] = nxt
        node = nxt
    return node
