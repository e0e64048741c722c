from .anomaly import (
    ACDC_POC, EVAL_DATASETS, MUAD, CityscapesVal, RoadAnomaly, RoadAnomaly21,
    RoadObstacle21,
)
from .cityscapes import DiverseCityscapes
from .loader import Loader, pad_to_multiple
