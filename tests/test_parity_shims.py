"""Validate the parity shims (parity/shims) against our core math.

The shims let the actual reference pipeline (/root/reference/scripts)
execute in this environment for the head-to-head fidelity run (BASELINE.md
"match graphs equivalent / RMSE <= CPU pipeline"). These tests pin the shim
math to imageanalysis_tpu's already-golden-tested implementations so the
reference runs on the same geometry we do.
"""

import os
import sys

import numpy as np
import pytest

SHIMS = os.path.join(os.path.dirname(__file__), os.pardir, "parity", "shims")
sys.path.insert(0, os.path.abspath(SHIMS))


@pytest.fixture(scope="module")
def shims():
    import importlib
    mods = {}
    for name in ("props", "props_json", "navpy", "transformations"):
        mods[name] = importlib.import_module(name)
    return mods


def test_navpy_matches_core_geodesy(shims):
    from imageanalysis_tpu.core import geodesy
    navpy = shims["navpy"]
    rng = np.random.default_rng(0)
    ref = (44.97, -93.26, 250.0)
    lat = ref[0] + rng.uniform(-0.05, 0.05, 8)
    lon = ref[1] + rng.uniform(-0.05, 0.05, 8)
    alt = ref[2] + rng.uniform(-50, 150, 8)
    ours = geodesy.lla2ned(lat, lon, alt, *ref)
    theirs = navpy.lla2ned(lat, lon, alt, *ref)
    np.testing.assert_allclose(theirs, ours, atol=1e-6)
    # round trip + tuple convention
    la, lo, al = navpy.ned2lla(ours, *ref)
    np.testing.assert_allclose(la, lat, atol=1e-10)
    np.testing.assert_allclose(lo, lon, atol=1e-10)
    np.testing.assert_allclose(al, alt, atol=1e-6)
    # single point returns scalars (reference srtm.py:164-169 indexes [0])
    single = navpy.ned2lla([100.0, -50.0, 10.0], *ref)
    assert isinstance(single[0], float)


def test_transformations_rzyx_matches_core_rotations(shims):
    from imageanalysis_tpu.core import rotations
    tf = shims["transformations"]
    rng = np.random.default_rng(1)
    for _ in range(10):
        y, p, r = rng.uniform(-np.pi, np.pi), rng.uniform(-1.2, 1.2), \
            rng.uniform(-np.pi, np.pi)
        q_shim = tf.quaternion_from_euler(y, p, r, "rzyx")
        q_ours = np.asarray(rotations.quat_from_ypr(y, p, r))
        # same rotation up to sign
        assert min(np.abs(q_shim - q_ours).max(),
                   np.abs(q_shim + q_ours).max()) < 1e-6
        # matrix agreement
        M = tf.quaternion_matrix(q_shim)[:3, :3]
        np.testing.assert_allclose(
            M, np.asarray(rotations.quat_to_matrix(q_ours)), atol=1e-6)
        # euler round trip
        y2, p2, r2 = tf.euler_from_quaternion(q_shim, "rzyx")
        np.testing.assert_allclose(
            tf.quaternion_matrix(
                tf.quaternion_from_euler(y2, p2, r2, "rzyx")),
            tf.quaternion_matrix(q_shim), atol=1e-9)


def test_transformations_multiply_and_rotation_matrix(shims):
    from imageanalysis_tpu.core import rotations
    tf = shims["transformations"]
    rng = np.random.default_rng(2)
    q0 = tf.quaternion_from_euler(*rng.uniform(-1, 1, 3), "rzyx")
    q1 = tf.quaternion_from_euler(*rng.uniform(-1, 1, 3), "rzyx")
    q01 = tf.quaternion_multiply(q1, q0)
    ours = np.asarray(rotations.quat_multiply(q1, q0))
    np.testing.assert_allclose(q01, ours, atol=1e-9)
    # rotation_matrix about +x by a known angle
    R = tf.rotation_matrix(np.pi / 2, [1, 0, 0])[:3, :3]
    np.testing.assert_allclose(R @ [0, 1, 0], [0, 0, 1], atol=1e-12)


def test_decompose_and_superimposition(shims):
    tf = shims["transformations"]
    rng = np.random.default_rng(3)
    # ground-truth similarity: s * R + t
    s = 1.3
    R = tf.euler_matrix(0.2, -0.4, 1.1)[:3, :3]
    t = np.array([5.0, -2.0, 7.0])
    pts = rng.normal(0, 10, (3, 40))
    dst = s * R @ pts + t[:, None]
    src_h = np.vstack([pts, np.ones(40)])
    dst_h = np.vstack([dst, np.ones(40)])
    A = tf.superimposition_matrix(src_h, dst_h, scale=True)
    np.testing.assert_allclose(A[:3, :3], s * R, atol=1e-8)
    np.testing.assert_allclose(A[:3, 3], t, atol=1e-8)
    scale, shear, angles, trans, persp = tf.decompose_matrix(A)
    np.testing.assert_allclose(scale, [s, s, s], atol=1e-8)
    np.testing.assert_allclose(shear, 0, atol=1e-8)
    np.testing.assert_allclose(trans, t, atol=1e-8)
    np.testing.assert_allclose(persp, [0, 0, 0, 1], atol=1e-10)
    np.testing.assert_allclose(tf.euler_matrix(*angles)[:3, :3], R,
                               atol=1e-8)


def test_props_tree_and_json_roundtrip(shims, tmp_path):
    props, props_json = shims["props"], shims["props_json"]
    n = props.getNode("/config/camera", True)
    n.setString("make", "Synthetic")
    n.setLen("K", 9, init_val=0.0)
    for i, v in enumerate([700.0, 0, 400, 0, 700, 300, 0, 0, 1]):
        n.setFloatEnum("K", i, v)
    assert n.getFloatEnum("K", 4) == 700.0
    assert n.getLen("K") == 9
    assert n.hasChild("K") and not n.hasChild("K_opt")
    assert props.getNode("/config/missing") is None
    sub = n.getChild("mount", True)
    sub.setFloat("pitch_deg", -90.0)
    assert n.getChildren() == ["mount"]
    path = tmp_path / "config.json"
    assert props_json.save(str(path), props.getNode("/config"))
    fresh = props.PropertyNode()
    assert props_json.load(str(path), fresh)
    cam = fresh.getChild("camera")
    assert cam.getString("make") == "Synthetic"
    assert cam.getFloatEnum("K", 0) == 700.0
    assert cam.getChild("mount").getFloat("pitch_deg") == -90.0
    # typed getters on missing attrs return zero-values, don't create
    assert cam.getFloat("nope") == 0.0 and not cam.hasChild("nope")
