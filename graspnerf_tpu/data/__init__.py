from .synthetic import (SyntheticSceneDataset, Scene, hemisphere_poses,
                        intrinsics, BBOX_MIN, DEPTH_RANGE, WORKSPACE_CENTER)
