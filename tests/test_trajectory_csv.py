"""Trajectory CSV format (utils/trajectory.py) — the reference's logging
artifact (global_generate.cpp:194, sample global_matching.csv)."""

import numpy as np
import pytest

from slam_tpu.utils.trajectory import load_trajectory_csv, \
    save_trajectory_csv


def test_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    poses = rng.uniform(-20, 20, (15, 4))
    path = str(tmp_path / "traj.csv")
    assert save_trajectory_csv(path, poses) == 15
    back = load_trajectory_csv(path)
    np.testing.assert_allclose(back, poses, rtol=1e-5, atol=1e-4)


def test_reads_reference_style_rows(tmp_path):
    """Rows exactly as the committed reference artifact writes them
    (`x, y, yaw` with spaces after commas)."""
    path = tmp_path / "ref.csv"
    path.write_text("12.6119, 4.16069, 0.143919\n"
                    "11.6326, 13.556, 0.253566\n")
    t = load_trajectory_csv(str(path))
    assert t.shape == (2, 3)
    np.testing.assert_allclose(t[0], [12.6119, 4.16069, 0.143919])


def test_bad_shape_raises(tmp_path):
    with pytest.raises(ValueError, match="poses"):
        save_trajectory_csv(str(tmp_path / "x.csv"), np.zeros((5, 2)))
