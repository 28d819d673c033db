"""Convert a reference PyTorch checkpoint (model_best.pth) to flax params.

The reference saves {step, best_para, network_state_dict, optimizer_state_dict}
(ref trainer.py:199-218). We map network_state_dict onto the flax param tree
(models/convert.py naming contract) and save it with Orbax for the planner.

Usage:
  python scripts/convert_checkpoint.py model_best.pth out_dir/
"""
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
    ckptr.save(out, {"params": params, "step": np.asarray(ckpt.get("step", 0))})
    ckptr.wait_until_finished()
    print(f"[convert] saved flax params to {out} (step {ckpt.get('step', 0)})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
