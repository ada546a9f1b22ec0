"""AR HUD overlay rendering on flight video.

Reference video/hud.py:27-1034 (+ hud_glass.py variant): all symbology is
drawn by projecting NED-space geometry through K·[R|t] for the current
aircraft state (hud.py:214-222) — horizon line, pitch ladders, heading
bug/compass, airspeed & altitude tapes, flight-path marker — then alpha
blending over the frame.

This implements the core instrument set with the same projection math; the
decorative variants (glass-style tapes, sun/moon via ephem, airport
database) are gated extensions.
"""

from __future__ import annotations

import math

import numpy as np

from ..core import geodesy
from .camera import VirtualCamera

D2R = math.pi / 180.0
R2D = 180.0 / math.pi

GREEN = (20, 220, 20)
WHITE = (240, 240, 240)


class HUD:
    def __init__(self, cam: VirtualCamera, color=GREEN, line_width=2,
                 style="classic"):
        """style: 'classic' (reference hud.py) or 'glass' (hud_glass.py) —
        glass draws filled translucent tapes/boxes and a sky-pointer roll
        indicator instead of bare line symbology."""
        self.cam = cam
        self.color = color
        self.lw = line_width
        self.style = style
        # current state
        self.ned = np.zeros(3)
        self.quat = np.array([1.0, 0, 0, 0])
        self.ypr = (0.0, 0.0, 0.0)
        self.vel_ned = np.zeros(3)
        self.airspeed = 0.0
        self.altitude = 0.0

    def update_state(self, ned, quat, ypr_deg, vel_ned=None, airspeed=None,
                     altitude=None):
        self.ned = np.asarray(ned, float)
        self.quat = np.asarray(quat, float)
        self.ypr = tuple(ypr_deg)
        if vel_ned is not None:
            self.vel_ned = np.asarray(vel_ned, float)
        self.airspeed = airspeed if airspeed is not None else \
            float(np.linalg.norm(self.vel_ned))
        self.altitude = altitude if altitude is not None else -self.ned[2]

    # -- projection helpers (reference hud.py:214-222) --------------------
    def project(self, points_ned):
        return self.cam.project_ned(points_ned, self.ned, self.quat)

    def _ladder_points(self, pitch_deg, width_deg=10.0):
        """NED points of a pitch-ladder rung at the given pitch angle,
        1000 m out, centered on the current heading."""
        yaw = self.ypr[0] * D2R
        pitch = pitch_deg * D2R
        pts = []
        for dyaw in (-width_deg / 2 * D2R, width_deg / 2 * D2R):
            d = 1000.0
            n = d * math.cos(pitch) * math.cos(yaw + dyaw)
            e = d * math.cos(pitch) * math.sin(yaw + dyaw)
            dwn = -d * math.sin(pitch)
            pts.append(self.ned + [n, e, dwn])
        return np.asarray(pts)

    # -- drawing ----------------------------------------------------------
    def draw(self, frame):
        import cv2

        self.draw_horizon(frame, cv2)
        self.draw_pitch_ladder(frame, cv2)
        self.draw_heading(frame, cv2)
        if self.style == "glass":
            self.draw_tapes_glass(frame, cv2)
            self.draw_roll_indicator(frame, cv2)
        else:
            self.draw_tapes(frame, cv2)
        self.draw_flight_path_marker(frame, cv2)
        return frame

    def draw_tapes_glass(self, frame, cv2):
        """Glass-cockpit style: translucent filled tape strips with a value
        box and pointer (reference hud_glass.py:34-1600 tape family)."""
        h, w = frame.shape[:2]
        cy = h // 2
        overlay = frame.copy()
        for side, value, label in ((0, self.airspeed, "SPD"),
                                   (1, self.altitude, "ALT")):
            x0 = 16 if side == 0 else w - 86
            cv2.rectangle(overlay, (x0, cy - 120), (x0 + 70, cy + 120),
                          (40, 40, 40), -1)
            for dv in range(-25, 30, 5):
                v = (round(value / 5) * 5) + dv
                if v < 0:
                    continue
                y = int(cy - (v - value) * 4)
                if cy - 110 < y < cy + 110:
                    cv2.line(overlay, (x0 + 54, y), (x0 + 66, y), WHITE, 1)
                    cv2.putText(overlay, "%d" % v, (x0 + 6, y + 4),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.4, WHITE, 1)
            cv2.rectangle(overlay, (x0 - 2, cy - 14), (x0 + 70, cy + 14),
                          (0, 0, 0), -1)
            cv2.rectangle(overlay, (x0 - 2, cy - 14), (x0 + 70, cy + 14),
                          WHITE, 1)
            cv2.putText(overlay, "%.0f" % value, (x0 + 6, cy + 7),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.6, WHITE, 2)
            cv2.putText(overlay, label, (x0 + 8, cy - 126),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, WHITE, 1)
        cv2.addWeighted(overlay, 0.65, frame, 0.35, 0, dst=frame)

    def draw_roll_indicator(self, frame, cv2):
        """Sky-pointer roll arc at the top (hud_glass.py bank indicator)."""
        h, w = frame.shape[:2]
        cx = w // 2
        cyc = 110
        radius = 70
        for ang in (-60, -45, -30, -20, -10, 0, 10, 20, 30, 45, 60):
            a = math.radians(ang - 90)
            x1 = int(cx + radius * math.cos(a))
            y1 = int(cyc + radius * math.sin(a))
            ln = 10 if ang % 30 == 0 else 6
            x2 = int(cx + (radius - ln) * math.cos(a))
            y2 = int(cyc + (radius - ln) * math.sin(a))
            cv2.line(frame, (x1, y1), (x2, y2), self.color, 1)
        roll = self.ypr[2]
        a = math.radians(-roll - 90)
        px = int(cx + (radius - 14) * math.cos(a))
        py = int(cyc + (radius - 14) * math.sin(a))
        cv2.drawMarker(frame, (px, py), self.color,
                       cv2.MARKER_TRIANGLE_UP, 12, 2)

    def draw_horizon(self, frame, cv2):
        """True horizon: points at zero elevation angle, far away
        (reference hud.py:223-254)."""
        yaw = self.ypr[0] * D2R
        pts = []
        for dyaw in np.linspace(-60, 60, 9) * D2R:
            d = 5000.0
            pts.append(self.ned + [d * math.cos(yaw + dyaw),
                                   d * math.sin(yaw + dyaw), 0.0])
        uv = self.project(np.asarray(pts))
        self._polyline(frame, cv2, uv)

    def draw_pitch_ladder(self, frame, cv2):
        for pitch in range(-30, 35, 5):
            if pitch == 0:
                continue
            uv = self.project(self._ladder_points(pitch, width_deg=6.0))
            if np.isnan(uv).any():
                continue
            p1, p2 = uv.astype(int)
            dashed = pitch < 0
            if dashed:
                mid1 = p1 + (p2 - p1) * 0.33
                mid2 = p1 + (p2 - p1) * 0.67
                cv2.line(frame, tuple(p1), tuple(mid1.astype(int)),
                         self.color, self.lw)
                cv2.line(frame, tuple(mid2.astype(int)), tuple(p2),
                         self.color, self.lw)
            else:
                cv2.line(frame, tuple(p1), tuple(p2), self.color, self.lw)
            cv2.putText(frame, str(abs(pitch)), tuple(p2 + [8, 4]),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, self.color, 1)

    def draw_heading(self, frame, cv2):
        """Compass ribbon along the top (reference hud.py:648-700)."""
        w = frame.shape[1]
        yaw = self.ypr[0] % 360
        cx = w // 2
        span = 60.0  # degrees visible
        for hdg in range(0, 360, 5):
            diff = (hdg - yaw + 180) % 360 - 180
            if abs(diff) > span / 2:
                continue
            x = int(cx + diff / (span / 2) * (w * 0.25))
            major = hdg % 10 == 0
            cv2.line(frame, (x, 18), (x, 30 if major else 24), self.color, 1)
            if hdg % 30 == 0:
                label = str(hdg // 10)
                cv2.putText(frame, label, (x - 8, 14),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.45, self.color, 1)
        cv2.putText(frame, "%03d" % round(yaw), (cx - 18, 48),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, WHITE, 2)

    def draw_tapes(self, frame, cv2):
        """Airspeed (left) and altitude (right) tapes (hud.py:648-834)."""
        h, w = frame.shape[:2]
        cy = h // 2
        for side, value, label in ((0, self.airspeed, "m/s"),
                                   (1, self.altitude, "m")):
            x = 30 if side == 0 else w - 90
            for dv in range(-25, 30, 5):
                v = (round(value / 5) * 5) + dv
                if v < 0:
                    continue
                y = int(cy - (v - value) * 4)
                if 40 < y < h - 40:
                    cv2.line(frame, (x + 45, y), (x + 52, y), self.color, 1)
                    cv2.putText(frame, "%d" % v, (x, y + 4),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.45, self.color, 1)
            cv2.rectangle(frame, (x - 5, cy - 14), (x + 60, cy + 12),
                          (0, 0, 0), -1)
            cv2.putText(frame, "%.0f %s" % (value, label), (x, cy + 6),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.55, WHITE, 2)

    def draw_flight_path_marker(self, frame, cv2):
        """Where the aircraft is actually going (hud.py velocity vector)."""
        if np.linalg.norm(self.vel_ned) < 0.5:
            return
        tgt = self.ned + self.vel_ned / np.linalg.norm(self.vel_ned) * 1000.0
        uv = self.project(tgt[None])
        if np.isnan(uv).any():
            return
        c = tuple(uv[0].astype(int))
        cv2.circle(frame, c, 8, self.color, self.lw)
        cv2.line(frame, (c[0] - 16, c[1]), (c[0] - 8, c[1]), self.color, self.lw)
        cv2.line(frame, (c[0] + 8, c[1]), (c[0] + 16, c[1]), self.color, self.lw)
        cv2.line(frame, (c[0], c[1] - 12), (c[0], c[1] - 6), self.color, self.lw)

    def _polyline(self, frame, cv2, uv):
        good = ~np.isnan(uv).any(axis=1)
        pts = uv[good].astype(int)
        for i in range(len(pts) - 1):
            cv2.line(frame, tuple(pts[i]), tuple(pts[i + 1]), self.color,
                     self.lw)


def overlay_video(video_path, out_path, cam: VirtualCamera, state_fn,
                  max_frames=None, alpha=1.0, style="classic"):
    """Render the HUD over a flight video (reference 2-gen-hud-overlay.py).

    state_fn(time_s) → dict(ned, quat, ypr_deg[, vel_ned, airspeed,
    altitude]) interpolated from the correlated flight log.
    """
    import cv2

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    W = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    H = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cam.scale_to(W, H)
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (W, H))
    hud = HUD(cam, style=style)
    idx = 0
    while True:
        ret, frame = cap.read()
        if not ret or (max_frames and idx >= max_frames):
            break
        state = state_fn(idx / fps)
        hud.update_state(**state)
        overlay = frame.copy()
        hud.draw(overlay)
        if alpha < 1.0:
            frame = cv2.addWeighted(overlay, alpha, frame, 1 - alpha, 0)
        else:
            frame = overlay
        writer.write(frame)
        idx += 1
    cap.release()
    writer.release()
    return idx
