"""run_scaling leg math (bench.py) — pure-Python, no Spark.

The scaling artifact is the north-rule evidence (N→4N efficiency);
these tests pin that adding a third level (the driver's local[32]
width, VERDICT r3 ask #7) changes NOTHING about the headline leg and
only appends per-adjacent-pair legs.
"""

import json

import pytest

import bench


FAKE = {
    2: {"cpus": 2, "docs_per_sec": 100.0, "cpu_calibration": 2.0, "membw_calibration_gbps": 10.0},
    8: {"cpus": 8, "docs_per_sec": 370.0, "cpu_calibration": 7.6, "membw_calibration_gbps": 30.0},
    32: {"cpus": 32, "docs_per_sec": 900.0, "cpu_calibration": 20.0, "membw_calibration_gbps": 40.0},
}


@pytest.fixture()
def fake_children(monkeypatch):
    class _Out:
        def __init__(self, d):
            self.stdout = json.dumps(d) + "\n"

    def run(cmd, **kw):
        # argv: [python, bench.py, --scaling-child, cpus, sf_dir, repl]
        return _Out(FAKE[int(cmd[3])])

    monkeypatch.setattr(bench.subprocess, "run", run)


def test_two_levels_unchanged(fake_children):
    out = bench.run_scaling("unused", levels=(2, 8))
    assert out["scaling_efficiency"] == round((370 / 100) / 4, 3)
    assert out["speedup"] == 3.7
    assert "legs" not in out  # two levels = the classic artifact shape


def test_three_levels_headline_is_first_leg(fake_children):
    out = bench.run_scaling("unused", levels=(2, 8, 32))
    # headline leg identical to the 2-level run — round-over-round
    # comparison must not shift when a 32-wide level is appended
    two = bench.run_scaling("unused", levels=(2, 8))
    for k in ("speedup", "ideal", "scaling_efficiency",
              "hardware_ceiling_speedup", "scaling_efficiency_vs_membw"):
        assert out[k] == two[k], k
    assert [lv["cpus"] for lv in out["levels"]] == [2, 8, 32]
    legs = out["legs"]
    assert [g["cpus"] for g in legs] == [[2, 8], [8, 32]]
    # the 8→32 leg carries its own ceiling ratios (one shared memory
    # bus: membw ceiling 40/30 = 1.333× for an ideal 4×)
    assert legs[1]["speedup"] == round(900 / 370, 3)
    assert legs[1]["ideal"] == 4.0
    assert legs[1]["membw_ceiling_speedup"] == round(40 / 30, 3)
    assert legs[1]["scaling_efficiency_vs_hardware"] == round(
        (900 / 370) / (20 / 7.6), 3
    )
