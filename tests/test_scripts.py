"""Unit tests for analysis-script helpers (scripts/)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_boundary_distance_stats():
    from golden_diff import boundary_distance_stats

    status = np.zeros((16, 16), np.int32)
    status[:, 8:] = 2  # boundary pixels: cols 7 and 8
    mism = np.zeros((16, 16), bool)
    mism[4, 7] = True  # on the boundary
    assert boundary_distance_stats(status, mism) == (0, 1.0)
    mism[4, 11] = True  # Chebyshev distance 3 from col 8
    md, f2 = boundary_distance_stats(status, mism)
    assert md == 3 and f2 == 0.5
    # no mismatches -> trivial pass
    assert boundary_distance_stats(status, np.zeros_like(mism)) == (0, 1.0)
    # mismatch in a uniform-status field -> flagged at the cap
    md, f2 = boundary_distance_stats(np.zeros((8, 8), np.int32), mism[:8, :8])
    assert md == 64 and f2 == 0.0


def test_ssim_identity_and_sensitivity():
    from multires_diff import ssim

    rng = np.random.RandomState(0)
    a = rng.rand(64, 64) * 255.0
    assert ssim(a, a) > 0.9999
    assert ssim(a, np.roll(a, 3, axis=0)) < 0.9
