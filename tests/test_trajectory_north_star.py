"""The north-star acceptance test (VERDICT r02 #1).

Runs the committed replay benchmark end-to-end — ORB → two-stage track
→ keyframes → BA → loop closure → PGO — and asserts the quality gates
the reference system demonstrates on real maps (OpenVSLAM's loop
closing corrects every frame via `SaveMatchedTrajectory` composition,
`/root/reference/modules/slam_module.cc:20-66`):

  - zero lost frames over the 150-frame orbit + revisit,
  - at least one loop closure actually fires,
  - ATE <= 5 cm on the ~1 m-radius orbit,
  - and closing the loop must demonstrably beat tracking alone.
"""

import json
import os

import pytest

from ra_slam_tpu.eval.trajectory_bench import run_trajectory_eval


@pytest.mark.slow
def test_trajectory_north_star(tmp_path):
    out = run_trajectory_eval(n_frames=150, progress=False)
    # commit-ready artifact: the driver's EVAL_r*.json content
    print(json.dumps(out))

    assert out["lost_frames"] == 0, out
    assert out["matched_frames"] == out["total_frames"], out
    assert out["loop_closures"] >= 1, out
    assert out["ate_rmse_m"] <= 0.05, out
    assert out["relocalizations"] <= 2, out  # no reloc thrash


@pytest.mark.slow
def test_loop_closure_reduces_ate():
    """ATE(loop on) < ATE(loop off): the detect→verify→PGO machine must
    pay for itself on the drifted revisit."""
    on = run_trajectory_eval(n_frames=150, progress=False)
    off = run_trajectory_eval(n_frames=150, loop_closure=False,
                              progress=False)
    assert on["loop_closures"] >= 1
    assert off["loop_closures"] == 0
    assert on["ate_rmse_m"] < off["ate_rmse_m"], (on, off)
