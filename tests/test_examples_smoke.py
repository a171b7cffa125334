"""Smoke-drive every example end-to-end at tiny sizes — the user-facing
drivers broke silently more than once (dead-reckoning shared-map fleets,
live feeds dropped during compilation); this pins them in CI."""

import os
import runpy
import sys

import pytest

_EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "examples")


def _drive(script, argv, capsys):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(_EX, script), run_name="__main__")
    finally:
        sys.argv = old
    return capsys.readouterr().out


def test_run_sim2d(tmp_path, capsys):
    out = _drive("run_sim2d.py",
                 ["--steps", "20", "--out", str(tmp_path)], capsys)
    assert "ATE=" in out and "nan" not in out.lower()


def test_run_sim2d_graph(tmp_path, capsys):
    out = _drive("run_sim2d.py",
                 ["--steps", "16", "--graph", "--out", str(tmp_path)],
                 capsys)
    assert "keyframes=" in out and "nan" not in out.lower()


def test_run_fleet_shared_map_registers(capsys):
    out = _drive("run_fleet.py",
                 ["--batch", "8", "--steps", "8", "--shared-map"], capsys)
    # the fleet must actually register against the shared map, not
    # dead-reckon (the regression this file exists for)
    assert "icp ok 8/8" in out, out


def test_run_reloc_graph(tmp_path, capsys):
    out = _drive("run_reloc.py",
                 ["--steps", "48", "--graph", "--out", str(tmp_path)],
                 capsys)
    assert "loop-closure edge from node 0 injected" in out, out
    assert "relocalized" in out


def test_run_live_consumes_most_frames(capsys):
    pytest.importorskip("ctypes")
    out = _drive("run_live.py", ["--frames", "30"], capsys)
    # warm-up before the producer: the consumer should keep up with most
    # of the 1 kHz feed instead of losing it to compilation
    import re
    m = re.search(r"consumed (\d+) live frames", out)
    assert m, out
    assert int(m.group(1)) >= 15, out


def test_run_fleet_particle_shared_map(capsys):
    # config 5 proper: particle matcher against the ONE shared grid
    # (fleet_rollout_shared, no per-robot map copies)
    out = _drive("run_fleet.py",
                 ["--batch", "8", "--steps", "12", "--shared-map",
                  "--matcher", "particle"], capsys)
    assert "robot-steps/s" in out and "nan" not in out.lower()
    assert "icp ok 8/8" in out, out
