"""On-chip SIFT detector tests: pyramid row-blur Pallas kernel, extrema,
descriptors, and downstream matchability, compiled by Mosaic."""

from test_sift_tpu import (  # noqa: F401
    image_pair,
    test_detect_basic,
    test_match_across_homography,
    test_batch_matches_single,
)
