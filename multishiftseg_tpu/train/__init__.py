from .checkpoint import CheckpointManager
from .deeplab_trainer import TrainDeepLabOOD
from .m2f_trainer import TrainM2FOOD
from .state import (
    TrainState, build_m2f_official_optimizer, build_stage_optimizer, trainable_mask,
)
from .test_runner import OODEvaluator
