from .synthetic import (SyntheticSceneDataset, Scene, hemisphere_poses,
                        intrinsics, BBOX_MIN, DEPTH_RANGE, WORKSPACE_CENTER)
from .database import VGNSynDatabase, discover_scenes
from .dataset import VGNSynDataset, select_ref_views, fg_biased_coords
from .prefetch import PrefetchLoader, collate_scenes
