"""On-TPU kernel test suite (VERDICT r3 item 7).

Unlike tests/ (which forces the CPU backend, so every Pallas kernel runs
in interpret mode), this suite runs on the REAL chip: Mosaic compiles the
packed-key 2-NN kernel, the gated variant, the fused epilogue, the SIFT
pyramid blur, device CLAHE, and the match-compaction path. Run with

    python -m pytest tests_tpu -q

on a TPU host; the whole suite is skipped when no TPU is attached.
scripts_dev/run_tpu_tests.py wraps this and writes TESTS_TPU_r{N}.json —
the committed pass/fail artifact for each bench session.

The test bodies are the SAME functions as the CPU suite (imported from
tests/), so CPU-interpret and TPU-Mosaic behavior cannot drift apart
silently. Heavier mission-shape checks live in test_mission_shapes_tpu.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

ON_TPU = jax.default_backend() == "tpu"


def pytest_collection_modifyitems(config, items):
    if not ON_TPU:
        skip = pytest.mark.skip(reason="no TPU attached (backend=%s)"
                                % jax.default_backend())
        for item in items:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
