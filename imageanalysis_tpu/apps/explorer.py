"""Interactive map explorer — the reference's panda3d viewer, rebuilt.

Reference scripts/explorer.py + scripts/explore/ (L7): loads the Step-5
models (per-image textured meshes + surface.bin), renders the "pile of
original images" orthomosaic, lets the user pan/zoom, inspect elevation
under the cursor, and place/edit/persist annotations (json/csv/kml).

panda3d is not available in this environment, so the viewer is built on
matplotlib: each image's projected grid is drawn as a texture warped onto
its ground quad (the same models/*.egg geometry + models/*.JPG textures the
panda3d viewer would load — the artifacts stay panda3d-compatible). Usable
both interactively (``python -m imageanalysis_tpu.apps.explorer <dir>``)
and headless (``render_to(path)`` for tests/reports).

Keys: scroll = zoom, drag = pan, 'a' + click = add annotation,
'd' + click = delete nearest annotation, 's' = save annotations.
"""

from __future__ import annotations

import os
import pickle
import sys

import numpy as np

from ..io.logger import log
from ..io.project import ProjectMgr
from ..render.annotations import Annotations


def load_egg_grid(path):
    """Parse the vertex/uv grid back out of a models/*.egg file.

    Returns (verts (n,3) [e,n,up], uvs (n,2) texture coords, quads (m,4))."""
    verts, uvs, quads = [], [], []
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        ln = lines[i].strip()
        if ln.startswith("<Vertex>"):
            xyz = [float(v) for v in lines[i + 1].split()]
            uv_ln = lines[i + 2].strip()
            uv = [float(v) for v in
                  uv_ln.replace("<UV> {", "").replace("}", "").split()]
            verts.append(xyz)
            uvs.append(uv)
            i += 3
        elif ln.startswith("<VertexRef>"):
            ids = [int(v) for v in ln.split("{")[1].split("<")[0].split()]
            quads.append([v - 1 for v in ids])
            i += 1
        else:
            i += 1
    return np.asarray(verts), np.asarray(uvs), np.asarray(quads, int)


class Explorer:
    def __init__(self, project_dir):
        self.proj = ProjectMgr(project_dir)
        self.proj.load_images_info()
        self.models_dir = self.proj.models_dir
        ref = self.proj.ned_reference_lla()
        self.annotations = Annotations(self.proj.analysis_dir, ref).load()
        self.surface = self._load_surface()
        self.mode = None

    def _load_surface(self):
        path = os.path.join(self.models_dir, "surface.bin")
        if not os.path.isfile(path):
            return None
        with open(path, "rb") as f:
            surf = pickle.load(f)
        import scipy.interpolate
        import scipy.spatial

        pts = np.asarray(surf["points"])  # [e, n]
        vals = np.asarray(surf["values"])
        tri = scipy.spatial.Delaunay(pts)
        return scipy.interpolate.LinearNDInterpolator(tri, vals)

    def get_elevation(self, e, n):
        """Surface elevation (m, positive up) under (e, n) — reference
        explore/surface.py:18."""
        if self.surface is None:
            return 0.0
        v = self.surface([[e, n]])[0]
        return 0.0 if np.isnan(v) else float(-v)

    # -- rendering --------------------------------------------------------
    def draw(self, ax, max_images=None, annotate=True):
        import cv2
        import matplotlib.tri as mtri

        eggs = sorted(f for f in os.listdir(self.models_dir)
                      if f.endswith(".egg"))
        if max_images:
            eggs = eggs[:max_images]
        drawn = 0
        for egg in eggs:
            name = egg[:-4]
            tex_path = os.path.join(self.models_dir, name + ".JPG")
            if not os.path.isfile(tex_path):
                continue
            verts, uvs, quads = load_egg_grid(os.path.join(self.models_dir, egg))
            if len(quads) == 0:
                continue
            tex = cv2.imread(tex_path)
            tex = cv2.cvtColor(tex, cv2.COLOR_BGR2RGB)
            th, tw = tex.shape[:2]
            # sample the texture at each vertex and Gouraud-shade triangles
            px = np.clip((uvs[:, 0] * (tw - 1)).astype(int), 0, tw - 1)
            py = np.clip(((1.0 - uvs[:, 1]) * (th - 1)).astype(int), 0, th - 1)
            colors = tex[py, px].astype(float) / 255.0
            tris = np.concatenate([quads[:, [0, 1, 2]], quads[:, [0, 2, 3]]])
            good = ~np.all(verts[:, :2] == 0, axis=1)
            tris = tris[np.all(good[tris], axis=1)]
            if len(tris) == 0:
                continue
            t = mtri.Triangulation(verts[:, 0], verts[:, 1], tris)
            lum = colors.mean(axis=1)
            ax.tripcolor(t, lum, cmap="gray", shading="gouraud", vmin=0,
                         vmax=1)
            drawn += 1
        if annotate:
            for m in self.annotations.markers:
                e, n = m["ned"][1], m["ned"][0]
                ax.plot(e, n, "yo", markersize=8, markeredgecolor="red")
                ax.annotate(f'{self.annotations.id_prefix}{m["id"]:03d}',
                            (e, n), color="yellow", fontsize=8,
                            xytext=(5, 5), textcoords="offset points")
        ax.set_aspect("equal")
        ax.set_xlabel("east (m)")
        ax.set_ylabel("north (m)")
        return drawn

    def render_to(self, out_path, dpi=130, max_images=None):
        """Headless render of the mosaic view to an image file."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 8))
        drawn = self.draw(ax, max_images=max_images)
        fig.savefig(out_path, dpi=dpi, bbox_inches="tight")
        plt.close(fig)
        log(f"explorer: rendered {drawn} image models to {out_path}")
        return drawn

    # -- interactive ------------------------------------------------------
    def run(self):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(12, 9))
        self.draw(ax)
        status = fig.text(0.01, 0.01, "a+click add, d+click delete, s save",
                          fontsize=9)

        def on_key(ev):
            if ev.key in ("a", "d"):
                self.mode = ev.key
                status.set_text(f"mode: {self.mode}")
            elif ev.key == "s":
                cams = [im.get_camera_pose(opt=im.has_opt_pose())[0]
                        for im in self.proj.image_list]
                self.annotations.save(np.asarray(cams))
                status.set_text("annotations saved")
            fig.canvas.draw_idle()

        def on_click(ev):
            if ev.inaxes != ax or self.mode is None:
                return
            e, n = ev.xdata, ev.ydata
            if self.mode == "a":
                down = -self.get_elevation(e, n)
                self.annotations.add_marker_ned([n, e, down], comment="")
            elif self.mode == "d" and self.annotations.markers:
                d = [np.hypot(m["ned"][1] - e, m["ned"][0] - n)
                     for m in self.annotations.markers]
                self.annotations.delete_marker(
                    self.annotations.markers[int(np.argmin(d))]["id"])
            self.mode = None
            ax.clear()
            self.draw(ax)
            fig.canvas.draw_idle()

        def on_scroll(ev):
            if ev.inaxes != ax:
                return
            s = 0.8 if ev.button == "up" else 1.25
            xl, yl = ax.get_xlim(), ax.get_ylim()
            ax.set_xlim(ev.xdata + (np.array(xl) - ev.xdata) * s)
            ax.set_ylim(ev.ydata + (np.array(yl) - ev.ydata) * s)
            fig.canvas.draw_idle()

        fig.canvas.mpl_connect("key_press_event", on_key)
        fig.canvas.mpl_connect("button_press_event", on_click)
        fig.canvas.mpl_connect("scroll_event", on_scroll)
        plt.show()


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m imageanalysis_tpu.apps.explorer <project_dir> "
              "[--screenshot out.png]")
        return 1
    ex = Explorer(argv[0])
    if "--screenshot" in argv:
        out = argv[argv.index("--screenshot") + 1]
        ex.render_to(out)
        return 0
    ex.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
