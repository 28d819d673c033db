"""Aggregate clutter-removal results across log dirs
(ref: scripts/stat_expresult.py:12-113).

  python scripts/stat_expresult.py data/simgrasp [more dirs...]
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from graspnerf_tpu.sim.clutter_removal import compute_metrics  # noqa: E402


def main(dirs):
    import numpy as np
    per_dir = [compute_metrics(d) for d in dirs]
    n = sum(m["n_grasps"] for m in per_dir)
    agg = {
        "success_rate": float(np.average(
            [m["success_rate"] for m in per_dir],
            weights=[max(m["n_grasps"], 1) for m in per_dir])),
        "percent_cleared": float(np.mean(
            [m["percent_cleared"] for m in per_dir])),
        "first_grasp_sr": float(np.mean(
            [m["first_grasp_sr"] for m in per_dir])),
        "planning_time": float(np.mean(
            [m["planning_time"] for m in per_dir])),
        "n_grasps": n,
        "n_rounds": sum(m["n_rounds"] for m in per_dir),
    }
    print(json.dumps(agg, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:] or ["data/simgrasp"])
