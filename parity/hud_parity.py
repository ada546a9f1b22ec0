"""Golden-frame HUD parity: our glass symbology vs the ACTUAL reference
hud_glass.py (VERDICT r3 missing #4 / next #9).

Loads /root/reference/video/hud_glass.py unmodified (props/navpy/
transformations come from parity/shims; ephem and rcUAS.wgs84 are stubbed
— they gate only the astro and landing-task symbols, which we exclude),
feeds both HUDs an identical aircraft state and camera, renders each
symbol group alone on a black canvas, and scores pixel agreement:

- IoU of the drawn masks after a 3 px dilation (rasterization slack),
- symmetric chamfer distance (mean nearest-neighbor px between masks).

A symbol group counts as EQUIVALENT when dilated IoU ≥ 0.5 and chamfer
≤ 4 px — loose enough to absorb anti-aliasing and font hinting, tight
enough that a missing tic row, wrong radius, or misplaced tape fails.

Usage: python parity/hud_parity.py [--out HUD_PARITY_r4.json] [--dump DIR]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REF_VIDEO = "/root/reference/video"

# shims first (props/navpy/transformations), then the reference video dir
sys.path.insert(0, os.path.join(HERE, "shims"))
sys.path.insert(0, REF_VIDEO)
sys.path.insert(0, REPO)

# stub the two deps the excluded symbols need
ephem_stub = types.ModuleType("ephem")
ephem_stub.Observer = object
ephem_stub.Date = lambda *a, **k: None
sys.modules.setdefault("ephem", ephem_stub)
rcuas_stub = types.ModuleType("rcUAS")
rcuas_stub.wgs84 = types.ModuleType("rcUAS.wgs84")
sys.modules.setdefault("rcUAS", rcuas_stub)
sys.modules.setdefault("rcUAS.wgs84", rcuas_stub.wgs84)

import cv2  # noqa: E402

import hud_glass  # noqa: E402  (the reference module, unmodified)

from imageanalysis_tpu.video.camera import VirtualCamera  # noqa: E402
from imageanalysis_tpu.video import hud as our_hud  # noqa: E402
from imageanalysis_tpu.core import rotations as rot  # noqa: E402

W, H = 1280, 720
K = np.array([[1000.0, 0.0, W / 2], [0.0, 1000.0, H / 2], [0.0, 0.0, 1.0]])

# one shared aircraft state
STATE = dict(
    ned=np.array([10.0, -20.0, -120.0]),
    yaw_deg=35.0, pitch_deg=4.0, roll_deg=-12.0,
    vel_ned=np.array([20.0, 14.0, -1.0]),
    airspeed_kt=24.0, altitude_m=123.4,
    ap_roll=-5.0, ap_pitch=2.0, ap_hdg=50.0, ap_speed=25.0,
    ap_alt_ft=450.0, ground_m=20.0,
    pilot=(0.15, -0.1, 0.6, 0.02), act=(0.12, -0.08, 0.55, 0.01),
    alpha_rad=math.radians(4.0), beta_rad=math.radians(-2.0),
    time_s=123.45,
)


def _track_history(s):
    """History points IN VIEW of the camera (ahead and below the
    aircraft), so the track comparison exercises real pixels — a
    straight-behind history projects behind the camera and both HUDs
    rendered 0 px, making the old check vacuous (ADVICE r4)."""
    yaw = math.radians(s["yaw_deg"])
    fwd = np.array([math.cos(yaw), math.sin(yaw), 0.0])
    right = np.array([-math.sin(yaw), math.cos(yaw), 0.0])
    out = []
    for i in range(40):
        # 1 s steps: the reference appends at most one point per integer
        # second of its clock (hud_glass.py:154)
        t = s["time_s"] - (40 - i) * 1.0
        d = 120.0 + i * 10.0
        p = s["ned"] + fwd * d + right * ((i - 20) * 1.5) \
            + np.array([0.0, 0.0, 25.0])
        out.append((t, p))
    return out


class _RefCamShim:
    """Duck-typed stand-in for the reference VirtualCamera: plain-ndarray
    project_ned/project_xyz with the reference's exact math
    (reference video/camera.py:134-156)."""

    def __init__(self, K, PROJ):
        self.K = np.asarray(K, float)
        self.PROJ = np.asarray(PROJ, float)  # 3x4 [R|t] (no K)

    def project_ned(self, ned):
        uvh = self.K @ (self.PROJ @ np.array([ned[0], ned[1], ned[2], 1.0]))
        if uvh[2] > 0.2:
            uvh = uvh / uvh[2]
            return (int(round(uvh[0])), int(round(uvh[1])))
        return None

    def project_xyz(self, v):
        uvh = self.K @ np.asarray(v, float)
        if uvh[2] > 0.2:
            uvh = uvh / uvh[2]
            return (int(round(uvh[0])), int(round(uvh[1])))
        return None


def build_huds():
    s = STATE
    quat = np.asarray(rot.quat_from_ypr(math.radians(s["yaw_deg"]),
                                        math.radians(s["pitch_deg"]),
                                        math.radians(s["roll_deg"])))
    cam = VirtualCamera({"K": K.ravel().tolist(), "dist_coeffs": [0.0] * 5,
                         "width_px": W, "height_px": H,
                         "mount_ypr": [0.0, 0.0, 0.0]})
    ours = our_hud.HUD(cam, line_width=2, style="glass")
    ours.update_state(s["ned"], quat, (s["yaw_deg"], s["pitch_deg"],
                                       s["roll_deg"]),
                      vel_ned=s["vel_ned"], airspeed=s["airspeed_kt"],
                      altitude=s["altitude_m"])
    ours.update_ap("auto", s["ap_roll"], s["ap_pitch"], s["ap_hdg"],
                   s["ap_speed"], s["ap_alt_ft"])
    ours.update_pilot(*s["pilot"])
    ours.update_act(*s["act"])
    ours.update_airdata(alpha_rad=s["alpha_rad"], beta_rad=s["beta_rad"])
    ours.update_time(s["time_s"])
    ours.ground_m = s["ground_m"]
    for t, p in _track_history(s):
        ours.update_ned_history(t, p)
    # steady-state velocity filter (both HUDs low-pass velocity inside
    # their draw loops; one-shot symbol calls need the converged value)
    ours._vel_filt = np.asarray(s["vel_ned"], float).copy()

    ref = hud_glass.HUD()
    if ref.dg_img is None:  # cv2.imread('hdg_hud.png') is CWD-relative
        ref.dg_img = cv2.imread(os.path.join(REF_VIDEO, "hdg_hud.png"), -1)
    ref.nose_uv = None      # [0,0] default would anchor the dg at col 0
                            # (set to cam_helper(0,0) after update_camera)
    ref.set_render_size(W, H)
    ref.set_line_width(2)
    size = math.sqrt(W * W + H * H)
    ref.set_font_size(size / 1400.0)
    ref.set_units("kt", "ft")
    # same PROJ as ours (transposed convention checked below)
    PROJ = np.linalg.inv(K) @ np.asarray(cam.proj_matrix(s["ned"], quat))
    ref.update_camera(_RefCamShim(K, PROJ))
    ref.update_cam_att(0.0, 0.0, 0.0)
    ref.update_ned(s["ned"], 60.0)
    # the reference appends history only when int(self.time) advances
    # (hud_glass.py:153-158) — step its clock alongside the points
    for t, p in _track_history(s):
        ref.update_time(t, 0.0)
        ref.update_ned_history(list(p), 60.0)
    ref.update_vel(*s["vel_ned"])
    ref.update_att_rad(math.radians(s["roll_deg"]),
                       math.radians(s["pitch_deg"]),
                       math.radians(s["yaw_deg"]))
    ref.update_airdata(s["airspeed_kt"], s["altitude_m"], 0, 0,
                       s["alpha_rad"], s["beta_rad"])
    ref.update_ap("auto", s["ap_roll"], s["ap_pitch"], s["ap_hdg"],
                  s["ap_speed"], s["ap_alt_ft"])
    ref.update_pilot(*s["pilot"])
    ref.update_act(*s["act"])
    ref.update_time(s["time_s"], 0.0)  # unixtime 0 keeps astro off
    ref.set_ground_m(s["ground_m"])
    ref.filter_vn, ref.filter_ve = float(s["vel_ned"][0]), \
        float(s["vel_ned"][1])
    ref.vel_filt = [float(v) for v in s["vel_ned"]]
    ref.nose_uv = ref.cam_helper(0.0, 0.0)  # as ref draw() does (l.1617)
    return ours, ref


def _mask(frame):
    return (frame.max(axis=2) > 0).astype(np.uint8)


def score(frame_a, frame_b, dilate_px=3):
    a, b = _mask(frame_a), _mask(frame_b)
    if a.sum() == 0 and b.sum() == 0:
        return {"iou": 1.0, "chamfer_px": 0.0, "px_ours": 0, "px_ref": 0}
    k = np.ones((2 * dilate_px + 1, 2 * dilate_px + 1), np.uint8)
    ad, bd = cv2.dilate(a, k), cv2.dilate(b, k)
    inter = float(np.logical_and(ad, bd).sum())
    union = float(np.logical_or(ad, bd).sum())
    iou = inter / union if union else 0.0
    cham = 0.0
    if a.sum() and b.sum():
        da = cv2.distanceTransform(1 - a, cv2.DIST_L2, 3)
        db = cv2.distanceTransform(1 - b, cv2.DIST_L2, 3)
        cham = 0.5 * (float(da[b > 0].mean()) + float(db[a > 0].mean()))
    else:
        cham = float("inf")
    return {"iou": round(iou, 3), "chamfer_px": round(cham, 2),
            "px_ours": int(a.sum()), "px_ref": int(b.sum())}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "HUD_PARITY_r5.json"))
    ap.add_argument("--dump", default=None,
                    help="directory for per-symbol side-by-side PNGs")
    args = ap.parse_args(argv)

    ours, ref = build_huds()

    def ours_draw(name):
        frame = np.zeros((H, W, 3), np.uint8)
        getattr(ours, name)(frame, cv2)
        return frame

    def ref_draw(name, *a):
        frame = np.zeros((H, W, 3), np.uint8)
        ref.update_frame(frame)
        getattr(ref, name)(*a)
        return frame

    def ref_tapes():
        frame = np.zeros((H, W, 3), np.uint8)
        ref.update_frame(frame)
        ref.draw_speed_tape(STATE["airspeed_kt"], STATE["ap_speed"], "kt")
        ref.draw_altitude_tape(STATE["altitude_m"] / 0.3048,
                               STATE["ap_alt_ft"], "ft")
        return frame

    symbols = {
        "horizon": (lambda: ours_draw("draw_horizon"),
                    lambda: ref_draw("draw_horizon")),
        "pitch_ladder": (lambda: ours_draw("draw_pitch_ladder"),
                         lambda: ref_draw("draw_pitch_ladder")),
        "vbars": (lambda: ours_draw("draw_vbars"),
                  lambda: ref_draw("draw_vbars")),
        "dg": (lambda: ours_draw("draw_dg"), lambda: ref_draw("draw_dg")),
        "heading_bug": (lambda: ours_draw("draw_heading_bug"),
                        lambda: ref_draw("draw_heading_bug")),
        "bird": (lambda: ours_draw("draw_bird"),
                 lambda: ref_draw("draw_bird")),
        "course": (lambda: ours_draw("draw_course"),
                   lambda: ref_draw("draw_course")),
        "roll_indicator": (lambda: ours_draw("draw_roll_indicator"),
                           lambda: ref_draw("draw_roll_indicator")),
        "tapes": (lambda: ours_draw("draw_tapes_glass"), ref_tapes),
        "compass_points": (lambda: ours_draw("draw_compass_points"),
                           lambda: ref_draw("draw_compass_points")),
        "nose": (lambda: ours_draw("draw_nose"),
                 lambda: ref_draw("draw_nose")),
        "velocity_vector": (lambda: ours_draw("draw_flight_path_marker"),
                            lambda: ref_draw("draw_velocity_vector")),
        "track": (lambda: ours_draw("draw_track"),
                  lambda: ref_draw("draw_track")),
        "sticks": (lambda: ours_draw("draw_sticks"),
                   lambda: ref_draw("draw_sticks")),
        "time": (lambda: ours_draw("draw_time"),
                 lambda: ref_draw("draw_time")),
    }

    report = {}
    for name, (f_ours, f_ref) in symbols.items():
        try:
            fo = f_ours()
        except Exception as e:  # noqa: BLE001
            report[name] = {"error_ours": repr(e)}
            continue
        try:
            fr = f_ref()
        except Exception as e:  # noqa: BLE001
            report[name] = {"error_ref": repr(e)}
            continue
        sc = score(fo, fr)
        if sc["px_ours"] == 0 and sc["px_ref"] == 0:
            # both drew nothing: certifies nothing — flag, don't count
            sc["not_exercised"] = True
            sc["equivalent"] = False
        else:
            sc["equivalent"] = bool(sc["iou"] >= 0.5
                                    and sc["chamfer_px"] <= 4.0)
        report[name] = sc
        if args.dump:
            os.makedirs(args.dump, exist_ok=True)
            side = np.concatenate([fo, fr], axis=1)
            cv2.imwrite(os.path.join(args.dump, f"{name}.png"), side)

    n_eq = sum(1 for v in report.values() if v.get("equivalent"))
    n_not_exercised = sum(1 for v in report.values()
                          if v.get("not_exercised"))
    out = {
        "image_size": [W, H],
        "state": {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                  for k, v in STATE.items()},
        "criteria": "dilated(3px) IoU >= 0.5 AND chamfer <= 4 px",
        "excluded": ["astro (ephem)", "airports (apt.csv db)",
                     "task/gate (rcUAS task records)",
                     "events/test_index (flight-log records)",
                     "alpha_beta (reference disables it: hud_glass.py:483 "
                     "'if True: return'; ours implements the marker)"],
        "symbols": report,
        "equivalent": n_eq,
        "not_exercised": n_not_exercised,
        "total": len(report),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    for name, v in report.items():
        print(f"{name:18s} {v}")
    print(f"{n_eq}/{len(report)} equivalent -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
