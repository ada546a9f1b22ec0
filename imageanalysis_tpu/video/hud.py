"""AR HUD overlay rendering on flight video.

Reference video/hud.py:27-1034 (+ hud_glass.py variant): all symbology is
drawn by projecting NED-space geometry through K·[R|t] for the current
aircraft state (hud.py:214-222), split into conformal symbols (stick to
the world: horizon, compass points, sun/moon, airports, flight track,
feature points, pitch ladder, velocity vector — hud.py:987-1002) and
fixed symbols (tapes, sticks, time — hud.py:1003-1023), plus autopilot
symbology (nose when manual; flight-director vbars, heading bug, bird and
course when auto — hud.py:1025-1032).

Sun/moon come from video/ephemeris.py (Meeus formulas — the reference
uses pyephem, hud.py:189-213); airports from video/airports.py.
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
        # optional state for the extended symbology (each symbol only
        # draws when its data has been supplied, like the reference)
        self.lla = None                 # [lat, lon, alt]
        self.ref_lla = None             # ned reference [lat, lon, alt]
        self.unixtime = None
        self.time = None
        self.ned_history = []           # [(t, ned)] for draw_track
        self.history_seconds = 60.0
        self.features = []              # ned points for draw_features
        self.airports = []              # [ident, lat, lon, alt]
        self.flight_mode = None         # 'manual' | 'auto'
        self.ap_roll = 0.0
        self.ap_pitch = 0.0
        self.ap_hdg = 0.0
        self.ap_speed = 0.0
        self.ap_alt = 0.0
        self.pilot_stick = None         # (ail, ele, thr, rud)
        self.act_stick = None
        self.alpha_beta = None          # (alpha_rad, beta_rad)
        self.ground_m = 0.0
        self.show_compass = False
        self.show_grid = False
        self._grid_pts = []
        self._vel_filt = np.zeros(3)

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

    # -- extended-state updaters (reference hud.py:104-188) ----------------
    def set_ned_ref(self, lat_deg, lon_deg, alt_m=0.0):
        self.ref_lla = [float(lat_deg), float(lon_deg), float(alt_m)]

    def update_lla(self, lla):
        self.lla = [float(v) for v in lla]

    def update_time(self, time_s, unixtime=None):
        self.time = float(time_s)
        if unixtime is not None:
            self.unixtime = float(unixtime)

    def update_ned_history(self, t, ned):
        """Keep the last history_seconds of positions (hud.py:130-139)."""
        self.ned_history.append((float(t), np.asarray(ned, float)))
        cutoff = float(t) - self.history_seconds
        while self.ned_history and self.ned_history[0][0] < cutoff:
            self.ned_history.pop(0)

    def update_features(self, feature_list):
        self.features = [np.asarray(f, float) for f in feature_list]

    def load_airports(self, path, range_m=30000.0):
        from . import airports as apt_mod

        if self.ref_lla is None:
            raise ValueError("set_ned_ref before load_airports")
        self.airports = apt_mod.load(path, self.ref_lla, range_m)

    def update_ap(self, flight_mode, ap_roll=0.0, ap_pitch=0.0, ap_hdg=0.0,
                  ap_speed=0.0, ap_alt=0.0):
        self.flight_mode = flight_mode
        self.ap_roll = ap_roll
        self.ap_pitch = ap_pitch
        self.ap_hdg = ap_hdg
        self.ap_speed = ap_speed
        self.ap_alt = ap_alt

    def update_pilot(self, aileron, elevator, throttle, rudder):
        self.pilot_stick = (aileron, elevator, throttle, rudder)

    def update_act(self, aileron, elevator, throttle, rudder):
        self.act_stick = (aileron, elevator, throttle, rudder)

    def update_airdata(self, airspeed=None, altitude=None, alpha_rad=None,
                       beta_rad=None):
        if airspeed is not None:
            self.airspeed = airspeed
        if altitude is not None:
            self.altitude = altitude
        if alpha_rad is not None or beta_rad is not None:
            self.alpha_beta = (alpha_rad or 0.0, beta_rad or 0.0)

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

    def _pt(self, ned, frame):
        """Project one NED point → integer (u, v) or None (hud.py:214-222).
        Culls points far outside the frame like the reference render-window
        checks."""
        uv = self.project(np.asarray(ned, float)[None])
        if np.isnan(uv).any():
            return None
        h, w = frame.shape[:2]
        u, v = float(uv[0, 0]), float(uv[0, 1])
        if u < -w * 0.25 or u > w * 1.25 or v < -h * 0.25 or v > h * 1.25:
            return None
        return (int(round(u)), int(round(v)))

    def _ladder_uv(self, frame, yaw_rad, pitch_deg, dyaw_deg):
        """Point 1000 m out at the given pitch/horizontal angle relative to
        the given azimuth (reference ladder_helper, hud.py:246-254)."""
        pitch = pitch_deg * D2R
        yaw = yaw_rad + dyaw_deg * D2R
        d = 1000.0
        ned = self.ned + [d * math.cos(pitch) * math.cos(yaw),
                          d * math.cos(pitch) * math.sin(yaw),
                          -d * math.sin(pitch)]
        return self._pt(ned, frame)

    @staticmethod
    def _rotate_pt(p, center, angle_rad):
        """Rotate an image point about a center (hud.py:369-374)."""
        ca, sa = math.cos(angle_rad), math.sin(angle_rad)
        x = p[0] - center[0]
        y = p[1] - center[1]
        return (int(round(center[0] + ca * x - sa * y)),
                int(round(center[1] + sa * x + ca * y)))

    def draw_label(self, frame, cv2, label, uv, scale=0.5, horiz="center",
                   vert="center", color=None):
        size = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX, scale,
                               self.lw)
        u = uv[0] - (size[0][0] // 2 if horiz == "center" else 0)
        v = uv[1] + (size[0][1] if vert == "below"
                     else size[0][1] // 2 if vert == "center" else 0)
        cv2.putText(frame, label, (int(u), int(v)), cv2.FONT_HERSHEY_SIMPLEX,
                    scale, color or self.color, self.lw, cv2.LINE_AA)

    def draw_ned_point(self, frame, cv2, ned, label=None, scale=1.0,
                       vert="above"):
        """Labeled world point (hud.py:521-532)."""
        uv = self._pt(ned, frame)
        if uv is not None:
            cv2.circle(frame, uv, 4 + self.lw, self.color, self.lw,
                       cv2.LINE_AA)
        if label:
            off = -0.02 if vert == "above" else 0.02
            uv2 = self._pt([ned[0], ned[1], ned[2] + off], frame)
            if uv2 is not None:
                self.draw_label(frame, cv2, label, uv2, scale, vert=vert)

    def draw_lla_point(self, frame, cv2, lla, label):
        """Labeled geographic point with distance callout when within
        10 sm (hud.py:534-557)."""
        if self.ref_lla is None:
            return
        pt = geodesy.lla2ned(lla[0], lla[1], lla[2], *self.ref_lla)
        rel = np.asarray(pt, float) - self.ned
        hdist = math.hypot(rel[0], rel[1])
        dist = float(np.linalg.norm(rel))
        hdist_sm = hdist * 0.000621371
        if hdist_sm > 10.0 or dist < 1e-6:
            return
        scale = 0.7 - (hdist_sm / 10.0) * 0.4
        if hdist_sm <= 7.5:
            label += " (%.1f)" % hdist_sm
        rel /= dist
        self.draw_ned_point(frame, cv2, self.ned + rel, label, scale=scale,
                            vert="below")

    # -- drawing ----------------------------------------------------------
    def draw(self, frame):
        import cv2

        # conformal symbols (hud.py:987-1002)
        self.draw_horizon(frame, cv2)
        if self.show_compass:
            self.draw_compass_points(frame, cv2)
        if self.unixtime is not None and self.lla is not None:
            self.draw_astro(frame, cv2)
        if self.airports:
            self.draw_airports(frame, cv2)
        if self.ned_history:
            self.draw_track(frame, cv2)
        if self.features:
            self.draw_features(frame, cv2)
        if self.show_grid:
            self.draw_grid(frame, cv2)
        self.draw_pitch_ladder(frame, cv2)
        if self.alpha_beta is not None:
            self.draw_alpha_beta_marker(frame, cv2)
        self.draw_heading(frame, cv2)
        # fixed symbols (hud.py:1003-1023)
        if self.style == "glass":
            self.draw_tapes_glass(frame, cv2)
            self.draw_roll_indicator(frame, cv2)
            self.draw_dg(frame, cv2)
        else:
            self.draw_tapes(frame, cv2)
        if self.pilot_stick is not None or self.act_stick is not None:
            self.draw_sticks(frame, cv2)
        if self.time is not None:
            self.draw_time(frame, cv2)
        # autopilot symbology (hud.py:1025-1032)
        if self.flight_mode == "manual":
            self.draw_nose(frame, cv2)
        elif self.flight_mode == "auto":
            self.draw_vbars(frame, cv2)
            self.draw_heading_bug(frame, cv2)
            self.draw_bird(frame, cv2)
            self.draw_course(frame, cv2)
        self.draw_flight_path_marker(frame, cv2)
        return frame

    # -- conformal extras ---------------------------------------------------
    def draw_astro(self, frame, cv2):
        """Sun, shadow and moon markers (hud.py:594-618 draw_astro)."""
        from . import ephemeris

        sun, moon = ephemeris.sun_moon_ned(self.lla[1], self.lla[0],
                                           self.lla[2], self.unixtime)
        self.draw_ned_point(frame, cv2, self.ned + sun, "Sun")
        if sun[2] < 0.0:   # shadow point opposite an above-horizon sun
            self.draw_ned_point(frame, cv2, self.ned - np.asarray(sun),
                                "shadow", scale=0.7)
        self.draw_ned_point(frame, cv2, self.ned + moon, "Moon")

    def draw_airports(self, frame, cv2):
        for apt in self.airports:
            self.draw_lla_point(frame, cv2, [apt[1], apt[2], apt[3]], apt[0])

    def draw_compass_points(self, frame, cv2):
        """Unit-distance compass ticks + N/S/E/W labels (hud.py:559-592)."""
        for i in range(12):
            a = i * 30.0 * D2R
            n, e = math.cos(a), math.sin(a)
            uv1 = self._pt(self.ned + [n, e, 0.0], frame)
            uv2 = self._pt(self.ned + [n, e, -0.02], frame)
            if uv1 and uv2:
                cv2.line(frame, uv1, uv2, self.color, self.lw, cv2.LINE_AA)
        for label, n, e in (("N", 1, 0), ("S", -1, 0), ("E", 0, 1),
                            ("W", 0, -1)):
            uv = self._pt(self.ned + [n, e, -0.03], frame)
            if uv:
                self.draw_label(frame, cv2, label, uv, 1.0, vert="above")

    def draw_track(self, frame, cv2):
        """Flight-track breadcrumbs, sized by distance (hud.py:897-941)."""
        prev = None
        for _, ned in self.ned_history:
            dist = float(np.linalg.norm(self.ned - ned))
            uv = self._pt(ned, frame) if dist > 5.0 else None
            if uv is not None:
                size = max(int(round(200.0 / max(dist, 1e-6))), 2)
                cv2.circle(frame, uv, size, WHITE, self.lw, cv2.LINE_AA)
                if prev is not None:
                    cv2.line(frame, prev, uv, WHITE, 1, cv2.LINE_AA)
            prev = uv

    def draw_features(self, frame, cv2):
        """Externally supplied feature points (hud.py:942-956)."""
        for ned in self.features:
            uv = self._pt(ned, frame)
            if uv is not None:
                cv2.circle(frame, uv, 2, WHITE, self.lw, cv2.LINE_AA)

    def draw_grid(self, frame, cv2):
        """3-D reference grid in space (hud.py:958-985)."""
        if not self._grid_pts:
            h, v = 100, 75
            for n in range(-500, 501, h):
                for e in range(-500, 501, h):
                    for d in range(int(-self.ground_m) - 4 * v,
                                   int(-self.ground_m) + 1, v):
                        self._grid_pts.append(np.array([n, e, d], float))
        for ned in self._grid_pts:
            dist = float(np.linalg.norm(self.ned - ned))
            uv = self._pt(ned, frame)
            if uv is not None:
                size = max(int(round(1000.0 / max(dist, 1e-6))), 1)
                cv2.circle(frame, uv, size, WHITE, 1, cv2.LINE_AA)

    def draw_alpha_beta_marker(self, frame, cv2):
        """Alpha/beta dot relative to the boresight (hud.py:339-367)."""
        alpha, beta = self.alpha_beta
        yaw = self.ypr[0] * D2R
        pitch = self.ypr[1]
        center = self._ladder_uv(frame, yaw, pitch, 0.0)
        alpha_uv = self._ladder_uv(frame, yaw, pitch - alpha * R2D,
                                   beta * R2D)
        if center is None or alpha_uv is None:
            return
        cv2.circle(frame, alpha_uv, 4, self.color, self.lw, cv2.LINE_AA)
        cv2.line(frame, center, alpha_uv, self.color, 1, cv2.LINE_AA)

    # -- fixed extras -------------------------------------------------------
    def draw_sticks(self, frame, cv2):
        """Pilot/actuator stick boxes, auto selects the active source
        (hud.py:835-874)."""
        stick = (self.act_stick if self.flight_mode == "auto"
                 else self.pilot_stick) or (0.0, 0.0, 0.0, 0.0)
        ail, ele, thr, rud = stick
        h, w = frame.shape[:2]
        lx, ly = int(h * 0.1), int(h * 0.8)
        rx, ry = w - int(h * 0.1), int(h * 0.8)
        r1 = max(int(round(h * 0.09)), 10)
        r2 = max(int(round(h * 0.01)), 2)
        for cx, cy in ((lx, ly), (rx, ry)):
            cv2.circle(frame, (cx, cy), r1, self.color, self.lw, cv2.LINE_AA)
            cv2.line(frame, (cx, cy - r1), (cx, cy + r1), self.color, 1,
                     cv2.LINE_AA)
            cv2.line(frame, (cx - r1, cy), (cx + r1, cy), self.color, 1,
                     cv2.LINE_AA)
        cv2.circle(frame, (lx + int(round(rud * r1)),
                           ly + r1 - int(round(2 * thr * r1))), r2,
                   self.color, self.lw, cv2.LINE_AA)
        cv2.circle(frame, (rx + int(round(ail * r1)),
                           ry - int(round(ele * r1))), r2,
                   self.color, self.lw, cv2.LINE_AA)

    def draw_time(self, frame, cv2):
        """Elapsed-time stamp, lower left (hud.py:876-882)."""
        h = frame.shape[0]
        cv2.putText(frame, "%.1f" % self.time, (2, h - 8),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, self.color, self.lw,
                    cv2.LINE_AA)

    # -- autopilot symbology -------------------------------------------------
    def draw_nose(self, frame, cv2):
        """Double circle on the body x-axis (hud.py:623-634)."""
        yaw = self.ypr[0] * D2R
        uv = self._ladder_uv(frame, yaw, self.ypr[1], 0.0)
        if uv is None:
            return
        h = frame.shape[0]
        cv2.circle(frame, uv, max(h // 80, 2), self.color, self.lw,
                   cv2.LINE_AA)
        cv2.circle(frame, uv, max(h // 40, 4), self.color, self.lw,
                   cv2.LINE_AA)

    def draw_vbars(self, frame, cv2):
        """Flight-director command bars at the AP pitch/roll target
        (hud.py:376-425)."""
        color = (211, 85, 186)  # medium orchid (BGR)
        yaw = self.ypr[0] * D2R
        a0, a1, a2, a3 = self.ap_pitch, 10.0, 1.5, 3.0
        rot = self._ladder_uv(frame, yaw, self.ypr[1], 0.0)
        center0 = self._ladder_uv(frame, yaw, a0, 0.0)
        if rot is None or center0 is None:
            return
        roll = self.ap_roll * D2R
        center = self._rotate_pt(center0, rot, roll)
        for sgn in (1, -1):
            p1 = self._ladder_uv(frame, yaw, a0 - a3, sgn * a1)
            p2 = self._ladder_uv(frame, yaw, a0 - a3, sgn * (a1 + a3))
            p3 = self._ladder_uv(frame, yaw, a0 - a2, sgn * (a1 + a3))
            if p1 is None or p2 is None or p3 is None:
                continue
            uv1 = self._rotate_pt(p1, rot, roll)
            uv2 = self._rotate_pt(p2, rot, roll)
            uv3 = self._rotate_pt(p3, rot, roll)
            for a, b in ((center, uv1), (center, uv3), (uv1, uv2),
                         (uv1, uv3), (uv2, uv3)):
                cv2.line(frame, a, b, color, self.lw, cv2.LINE_AA)

    def draw_heading_bug(self, frame, cv2):
        """AP heading bug on the horizon (hud.py:427-451)."""
        color = (211, 85, 186)
        hdg = self.ap_hdg * D2R
        pts = [self._ladder_uv(frame, hdg, 0.0, 2.0),
               self._ladder_uv(frame, hdg, 0.0, -2.0),
               self._ladder_uv(frame, hdg, 1.5, -2.0),
               self._ladder_uv(frame, hdg, 1.5, -1.0),
               self._ladder_uv(frame, hdg, 0.0, 0.0),
               self._ladder_uv(frame, hdg, 1.5, 1.0),
               self._ladder_uv(frame, hdg, 1.5, 2.0)]
        if any(p is None for p in pts):
            return
        for i in range(len(pts)):
            cv2.line(frame, pts[i], pts[(i + 1) % len(pts)], color, self.lw,
                     cv2.LINE_AA)

    def draw_bird(self, frame, cv2):
        """Attitude 'bird' wings at current pitch, rolled with the aircraft
        (hud.py:453-487)."""
        color = (0, 220, 220)  # yellow-ish (BGR)
        yaw = self.ypr[0] * D2R
        a0, a1, a2 = self.ypr[1], 10.0, 3.0
        center = self._ladder_uv(frame, yaw, a0, 0.0)
        if center is None:
            return
        roll = self.ypr[2] * D2R
        for sgn in (1, -1):
            p1 = self._ladder_uv(frame, yaw, a0 - a2, sgn * a1)
            p2 = self._ladder_uv(frame, yaw, a0 - a2, sgn * (a1 - a2))
            if p1 is None or p2 is None:
                continue
            uv1 = self._rotate_pt(p1, center, roll)
            uv2 = self._rotate_pt(p2, center, roll)
            cv2.line(frame, center, uv1, color, self.lw, cv2.LINE_AA)
            cv2.line(frame, center, uv2, color, self.lw, cv2.LINE_AA)
            cv2.line(frame, uv1, uv2, color, self.lw, cv2.LINE_AA)

    def draw_course(self, frame, cv2):
        """Ground-course caret on the horizon from filtered velocity
        (hud.py:488-502)."""
        color = (0, 220, 220)
        tf = 0.2
        self._vel_filt = (1.0 - tf) * self._vel_filt + tf * self.vel_ned
        if np.linalg.norm(self._vel_filt[:2]) < 0.1:
            return
        a = math.atan2(self._vel_filt[1], self._vel_filt[0])
        uv1 = self._ladder_uv(frame, a, 0.0, 0.0)
        uv2 = self._ladder_uv(frame, a, 1.5, 1.0)
        uv3 = self._ladder_uv(frame, a, 1.5, -1.0)
        if uv1 and uv2 and uv3:
            cv2.line(frame, uv1, uv2, color, self.lw, cv2.LINE_AA)
            cv2.line(frame, uv1, uv3, color, self.lw, cv2.LINE_AA)

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

    def draw_dg(self, frame, cv2):
        """Glass directional gyro: rotating compass rose at bottom center
        with nose marker, AP heading bug and ground-course arrow
        (hud_glass.py:584-712 — the reference composites a PNG rose; here
        the rose is drawn programmatically, same symbology)."""
        h, w = frame.shape[:2]
        radius = int(w * 0.125)
        cx = w // 2
        cy = h - int(radius * 0.35)       # face mostly below the frame edge
        yaw = self.ypr[0] * D2R

        overlay = frame.copy()
        cv2.circle(overlay, (cx, cy), radius, (40, 40, 40), -1)
        cv2.addWeighted(overlay, 0.5, frame, 0.5, 0, dst=frame)
        cv2.circle(frame, (cx, cy), radius, WHITE, 1, cv2.LINE_AA)

        for hdg in range(0, 360, 5):
            a = (hdg * D2R) - yaw - math.pi / 2
            major = hdg % 30 == 0
            r0 = radius - (12 if major else 6)
            p0 = (int(cx + r0 * math.cos(a)), int(cy + r0 * math.sin(a)))
            p1 = (int(cx + radius * math.cos(a)),
                  int(cy + radius * math.sin(a)))
            cv2.line(frame, p0, p1, WHITE, 1, cv2.LINE_AA)
            if major:
                lbl = {0: "N", 90: "E", 180: "S", 270: "W"}.get(
                    hdg, str(hdg // 10))
                rl = radius - 24
                pl = (int(cx + rl * math.cos(a)),
                      int(cy + rl * math.sin(a)))
                self.draw_label(frame, cv2, lbl, pl, 0.4, color=WHITE)

        # nose marker (fixed, top of the rose)
        cv2.fillPoly(frame, [np.array([[cx, cy - radius - 2],
                                       [cx - 6, cy - radius - 12],
                                       [cx + 6, cy - radius - 12]])],
                     WHITE)
        # AP heading bug (rotates with the rose)
        if self.flight_mode == "auto":
            a = (self.ap_hdg * D2R) - yaw - math.pi / 2
            for rr, ss in ((radius - 4, 8),):
                bx = int(cx + rr * math.cos(a))
                by = int(cy + rr * math.sin(a))
                cv2.rectangle(frame, (bx - ss, by - 4), (bx + ss, by + 4),
                              (211, 85, 186), -1)
        # ground-course arrow from filtered velocity
        gs = math.hypot(self._vel_filt[0], self._vel_filt[1])
        if gs > 0.5:
            crs = math.atan2(self._vel_filt[1], self._vel_filt[0])
            a = crs - yaw - math.pi / 2
            p1 = (int(cx + (radius - 18) * math.cos(a)),
                  int(cy + (radius - 18) * math.sin(a)))
            cv2.line(frame, (cx, cy), p1, (0, 220, 220), 2, cv2.LINE_AA)

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
