from .nn_blocks import (TorchConv, InstanceNorm, BasicBlock, ResidualBlock,
                        ConvINElu, UpConv, ResUNetLight, RayFeatInitNet,
                        VisEncoder)
from .dist_decoder import MixtureLogisticsDistDecoder, compute_prob
from .ibrnet import IBRNetNeus, MultiHeadAttention, positional_table, embed_points
from .aggregator import NeusAggregationNet, SingleVariance, neus_alpha
from .grasp_head import VGNConvNet
from .renderer import NeuralRayRenderer, GraspNeRF, project_to_views
from .convert import convert_state_dict
