"""Auto-loaded (PYTHONPATH site hook) in the reference subprocess only.

cv2 5.0 here has no xfeatures2d module; graft the GMS shim in so the
reference's unconditional cv2.xfeatures2d.matchGMS call
(reference matcher.py:285) works.
"""

try:
    import cv2

    if not hasattr(cv2, "xfeatures2d"):
        import types

        import gms_shim

        mod = types.ModuleType("cv2.xfeatures2d")
        mod.matchGMS = gms_shim.matchGMS
        cv2.xfeatures2d = mod
except Exception:  # pragma: no cover - never break interpreter startup
    pass


# The reference's basic_pair_matches divides by len(matches) unguarded
# (matcher.py:232): a worklist pair with zero raw knn matches (e.g. an
# image with <2 descriptors) raises ZeroDivisionError and kills a
# multi-hour run at whichever pair hits it. Wrap it post-import to return
# the empty match list that the function computes for that case anyway.
# (We may not modify /root/reference; this guards OUR invocation only.)
try:
    import importlib.abc
    import importlib.machinery
    import sys

    class _MatcherGuard(importlib.abc.MetaPathFinder, importlib.abc.Loader):
        def find_spec(self, name, path, target=None):
            if name != "lib.matcher":
                return None
            # delegate real resolution, then take over exec to post-patch
            for finder in sys.meta_path:
                if finder is self:
                    continue
                spec = finder.find_spec(name, path, target)
                if spec is not None:
                    self._inner = spec.loader
                    return importlib.machinery.ModuleSpec(
                        name, self, origin=spec.origin)
            return None

        def create_module(self, spec):
            return None

        def exec_module(self, module):
            self._inner.exec_module(module)
            orig = module.basic_pair_matches

            def guarded(i1, i2):
                try:
                    return orig(i1, i2)
                except ZeroDivisionError:
                    return []

            module.basic_pair_matches = guarded

    sys.meta_path.insert(0, _MatcherGuard())
except Exception:  # pragma: no cover - never break interpreter startup
    pass
