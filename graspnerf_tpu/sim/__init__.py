from .transform import Transform, Rotation
from .world import AnalyticWorld, PybulletWorld, Label
from . import clutter_removal
from . import io
