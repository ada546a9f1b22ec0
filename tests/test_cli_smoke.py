"""Smoke tests over every CLI surface: imports, --help, bad input handling."""

import importlib

import pytest

cv2 = pytest.importorskip("cv2")

MODULES = [
    "imageanalysis_tpu",
    "imageanalysis_tpu.core", "imageanalysis_tpu.ops",
    "imageanalysis_tpu.match", "imageanalysis_tpu.ba",
    "imageanalysis_tpu.io", "imageanalysis_tpu.surface",
    "imageanalysis_tpu.render", "imageanalysis_tpu.parallel",
    "imageanalysis_tpu.features", "imageanalysis_tpu.video",
    "imageanalysis_tpu.motion",
    "imageanalysis_tpu.apps.process", "imageanalysis_tpu.apps.stages",
    "imageanalysis_tpu.apps.cull", "imageanalysis_tpu.apps.inspect",
    "imageanalysis_tpu.apps.utils", "imageanalysis_tpu.apps.explorer",
    "imageanalysis_tpu.apps.zooniverse",
    "imageanalysis_tpu.render.geotiff", "imageanalysis_tpu.render.ac3d",
    "imageanalysis_tpu.render.annotations", "imageanalysis_tpu.render.histogram",
    "imageanalysis_tpu.video.stabilize", "imageanalysis_tpu.video.aruco",
    "imageanalysis_tpu.video.mount", "imageanalysis_tpu.motion.lens_distortion",
    "imageanalysis_tpu.match.store", "imageanalysis_tpu.ba.calibrate",
    "imageanalysis_tpu.surface.coverage", "imageanalysis_tpu.testing.synthetic",
]


@pytest.mark.parametrize("mod", MODULES)
def test_imports(mod):
    importlib.import_module(mod)


@pytest.mark.parametrize("mod,args", [
    ("imageanalysis_tpu.apps.process", ["--help"]),
    ("imageanalysis_tpu.apps.stages", ["--help"]),
    ("imageanalysis_tpu.apps.cull", ["--help"]),
    ("imageanalysis_tpu.apps.inspect", ["--help"]),
    ("imageanalysis_tpu.apps.utils", ["--help"]),
    ("imageanalysis_tpu.apps.zooniverse", ["--help"]),
])
def test_cli_help(mod, args):
    m = importlib.import_module(mod)
    with pytest.raises(SystemExit) as e:
        m.main(args)
    assert e.value.code == 0


def test_process_missing_dir(tmp_path):
    from imageanalysis_tpu.apps import process

    # empty dir: pipeline should fail gracefully, not raise
    empty = tmp_path / "empty"
    empty.mkdir()
    rc = process.main([str(empty)])
    assert rc == 1


def test_explorer_usage():
    from imageanalysis_tpu.apps import explorer

    assert explorer.main([]) == 1
