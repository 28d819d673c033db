"""Convert a reference PyTorch checkpoint (model_best.pth) to flax params.

The reference saves {step, best_para, network_state_dict, optimizer_state_dict}
(ref trainer.py:199-218). We map network_state_dict onto the flax param tree
(models/convert.py naming contract) and save it with Orbax for the planner.

The output layout matches the trainer's CheckpointManager payload
({"state": {"params": ...}, "step", "best"}) so the planner/sim_grasp loader
consumes trainer checkpoints and converted reference checkpoints through the
same code path.

Usage:
  python scripts/convert_checkpoint.py model_best.pth out_dir/ [--cpu]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(pth_path: str, out_dir: str):
    import torch
    import jax
    import numpy as np
    import orbax.checkpoint as ocp
    from graspnerf_tpu.models import GraspNeRF, convert_state_dict
    from graspnerf_tpu.data import SyntheticSceneDataset

    ckpt = torch.load(pth_path, map_location="cpu")
    sd = ckpt["network_state_dict"]

    ds = SyntheticSceneDataset(h=64, w=64, n_rays=32, seed=0, fuse_views=6)
    batch = jax.tree_util.tree_map(jax.numpy.asarray, ds.sample())
    model = GraspNeRF(renderer_cfg={})
    variables = model.init(jax.random.PRNGKey(0), batch["data"], train=True,
                           key=jax.random.PRNGKey(1))
    params, unused = convert_state_dict(variables["params"], sd)
    if unused:
        print(f"[convert] {len(unused)} unused torch keys "
              f"(expected: dead buffers): {unused[:5]}...")
    ckptr = ocp.StandardCheckpointer()
    out = Path(out_dir).absolute() / "params"
    step = int(ckpt.get("step", 0))
    # trainer CheckpointManager layout (train/checkpoint.py:62-64) minus
    # opt_state (a converted reference checkpoint carries no optimizer)
    ckptr.save(out, {"state": {"params": params},
                     "step": np.asarray(step),
                     "best": np.asarray(np.inf)})
    ckptr.wait_until_finished()
    print(f"[convert] saved flax params to {out} (step {step})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("pth")
    ap.add_argument("out_dir")
    ap.add_argument("--cpu", action="store_true",
                    help="pin jax to host CPU (no accelerator needed for a "
                         "weight-format conversion)")
    a = ap.parse_args()
    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    main(a.pth, a.out_dir)
