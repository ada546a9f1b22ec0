"""Import-time stub for piexif.

The reference's lib/exif.py imports piexif at module level (exif.py:6), but
the parity harness always supplies a pix4d.csv pose file and a --camera
config, so no EXIF parsing is ever executed (reference process.py:131,
177-196). This stub satisfies the import; any actual call fails loudly.
"""


class _IFDConsts:
    def __getattr__(self, name):  # piexif.ImageIFD.Make etc.
        return -1


ImageIFD = _IFDConsts()
ExifIFD = _IFDConsts()
GPSIFD = _IFDConsts()


def load(*a, **kw):
    raise NotImplementedError(
        "piexif shim: EXIF parsing is not available in the parity harness; "
        "supply pix4d.csv and --camera instead")


def dump(*a, **kw):
    raise NotImplementedError("piexif shim")


def insert(*a, **kw):
    raise NotImplementedError("piexif shim")
