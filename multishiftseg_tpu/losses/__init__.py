from .criterion import CriterionConfig, set_criterion
from .matcher import linear_sum_assignment, match
from .rcl import RCLParams, make_rcl_params, rel_contrastive_loss
