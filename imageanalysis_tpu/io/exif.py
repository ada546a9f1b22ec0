"""EXIF / XMP metadata extraction (camera identity + geotagged pose).

Behavior-compatible replacement for the reference's piexif-based reader
(reference exif.py:11-147): camera make/model/lens → camera DB key; GPS
lat/lon/alt; capture time; DJI ``drone-dji:*`` gimbal attitude tags from the
XMP packet (including the Mavic Mini 2 FC7303 flight-yaw special case).
Implemented with PIL (piexif is not in this environment) plus the same raw
XMP scan the reference uses.
"""

from __future__ import annotations

import datetime
import re

from PIL import Image as PILImage
from PIL.ExifTags import Base as ExifBase, GPS as GPSTags, IFD

from .logger import log


def _ratio(v):
    try:
        return float(v)
    except TypeError:
        return float(v[0]) / float(v[1])


def get_camera_info(image_file: str):
    """Returns (camera_key, make, model, lens_model) where camera_key is the
    cameras/<key>.json DB name: 'Make_Model[_Lens]' with spaces → underscores
    (reference exif.py:11-28)."""
    with PILImage.open(image_file) as im:
        exif = im.getexif()
        make = str(exif.get(ExifBase.Make, "") or "").rstrip("\x00")
        model = str(exif.get(ExifBase.Model, "") or "").rstrip("\x00")
        try:
            exif_ifd = exif.get_ifd(IFD.Exif)
            lens_model = exif_ifd.get(ExifBase.LensModel)
            lens_model = str(lens_model).rstrip("\x00") if lens_model else None
        except KeyError:
            lens_model = None
    camera = make
    if model:
        camera += "_" + model
    if lens_model:
        camera += "_" + lens_model
    camera = camera.replace(" ", "_")
    return camera, make, model, lens_model


def _read_xmp(image_file: str) -> dict:
    """Scan the raw file for the x:xmpmeta packet and pull attribute-style
    tags — the same 'hack' the reference uses (exif.py:48-66), tolerant of
    both attribute (key="val") and element (<key>val</key>) XMP forms."""
    with open(image_file, "rb") as f:
        data = f.read()
    start = data.find(b"<x:xmpmeta")
    if start < 0:
        return {}
    end = data.find(b"</x:xmpmeta", start)
    blob = data[start: end + 12].decode("utf-8", errors="replace")
    xmp = {}
    for key, val in re.findall(r'([\w:-]+)="([^"]*)"', blob):
        xmp[key] = val
    for key, val in re.findall(r"<([\w:-]+)>([^<]+)</\1>", blob):
        xmp[key] = val
    return xmp


def get_pose(image_file: str):
    """Returns (lon_deg, lat_deg, alt_m, unixtime, yaw_deg, pitch_deg,
    roll_deg) — any of the last four may be None (reference exif.py:44-147)."""
    xmp = _read_xmp(image_file)
    with PILImage.open(image_file) as im:
        exif = im.getexif()
        try:
            gps = exif.get_ifd(IFD.GPSInfo)
        except KeyError:
            gps = {}
        dt_str = exif.get(ExifBase.DateTime)

    def dms(vals, ref):
        sign = -1.0 if str(ref) in ("S", "W", "s", "w") else 1.0
        d, m, s = (_ratio(v) for v in vals)
        return sign * (d + m / 60.0 + s / 3600.0)

    if "drone-dji:GpsLatitude" in xmp:
        lat_deg = float(xmp["drone-dji:GpsLatitude"])
    elif GPSTags.GPSLatitude in gps:
        lat_deg = dms(gps[GPSTags.GPSLatitude], gps.get(GPSTags.GPSLatitudeRef, "N"))
    else:
        lat_deg = None
    if "drone-dji:GpsLongitude" in xmp:
        lon_deg = float(xmp["drone-dji:GpsLongitude"])
    elif GPSTags.GPSLongitude in gps:
        lon_deg = dms(gps[GPSTags.GPSLongitude], gps.get(GPSTags.GPSLongitudeRef, "E"))
    else:
        lon_deg = None
    if "drone-dji:AbsoluteAltitude" in xmp:
        alt_m = float(xmp["drone-dji:AbsoluteAltitude"])
        if alt_m < 0:
            log("image meta data is reporting negative absolute altitude!")
    elif GPSTags.GPSAltitude in gps:
        alt_m = _ratio(gps[GPSTags.GPSAltitude])
    else:
        alt_m = None

    unixtime = None
    if dt_str:
        strdate, strtime = str(dt_str).split()
        year, month, day = strdate.split(":")
        hour, minute, second = strtime.split(":")
        dt = datetime.datetime(int(year), int(month), int(day),
                               int(hour), int(minute), int(second))
        unixtime = dt.timestamp()

    def norm_yaw(y):
        while y < 0:
            y += 360
        return y

    yaw_deg = pitch_deg = roll_deg = None
    if xmp.get("tiff:Model") == "FC7303" and "drone-dji:FlightYawDegree" in xmp:
        # Mavic Mini 2 reports only flight yaw (reference exif.py:117-121)
        yaw_deg = norm_yaw(float(xmp["drone-dji:FlightYawDegree"]))
    elif "drone-dji:GimbalYawDegree" in xmp:
        yaw_deg = norm_yaw(float(xmp["drone-dji:GimbalYawDegree"]))
    elif "Camera:Yaw" in xmp:
        yaw_deg = norm_yaw(float(xmp["Camera:Yaw"]))

    if "drone-dji:GimbalPitchDegree" in xmp:
        pitch_deg = float(xmp["drone-dji:GimbalPitchDegree"])
    elif "Camera:Pitch" in xmp:
        pitch_deg = float(xmp["Camera:Pitch"])

    if "drone-dji:GimbalRollDegree" in xmp:
        roll_deg = float(xmp["drone-dji:GimbalRollDegree"])
    elif "Camera:Roll" in xmp:
        roll_deg = float(xmp["Camera:Roll"])

    return lon_deg, lat_deg, alt_m, unixtime, yaw_deg, pitch_deg, roll_deg


def write_geotag(image_file, lat_deg, lon_deg, alt_m, unixtime=None,
                 out_file=None):
    """Write GPS EXIF tags (+ DateTime) into a JPEG — the reference's
    extracted-frame geotagging (3-extract-and-geotag-frames.py uses
    piexif/pyexiv2; here Pillow writes the GPS IFD directly). The pose is
    also independently carried by pix4d.csv; EXIF write-back keeps the
    frames usable by third-party tools."""
    import datetime

    from PIL import Image as PILImage2
    from PIL.ExifTags import Base as ExifBase2
    from PIL.TiffImagePlugin import IFDRational

    def dms_rational(deg):
        deg = abs(deg)
        d = int(deg)
        m = int((deg - d) * 60)
        s = ((deg - d) * 60 - m) * 60
        return (IFDRational(d, 1), IFDRational(m, 1),
                IFDRational(int(round(s * 10000)), 10000))

    with PILImage.open(image_file) as im:
        exif = im.getexif()
        gps = {
            1: "N" if lat_deg >= 0 else "S",
            2: dms_rational(lat_deg),
            3: "E" if lon_deg >= 0 else "W",
            4: dms_rational(lon_deg),
            5: 0 if alt_m >= 0 else 1,
            6: IFDRational(int(round(abs(alt_m) * 100)), 100),
        }
        exif[0x8825] = gps
        if unixtime is not None:
            dt = datetime.datetime.fromtimestamp(unixtime)
            exif[ExifBase2.DateTime] = dt.strftime("%Y:%m:%d %H:%M:%S")
        im.save(out_file or image_file, exif=exif,
                quality="keep" if (out_file or image_file).lower()
                .endswith(("jpg", "jpeg")) else 95)
