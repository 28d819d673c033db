from .postprocess import (process, nms, extract_candidates, GraspCandidates,
                          candidates_to_grasps)
from .planner import GraspNeRFPlanner, load_rendered_views
from .vgn_baseline import VGNPlanner
