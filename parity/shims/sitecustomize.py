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
