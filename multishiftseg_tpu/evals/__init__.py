from .ood_metrics import (
    auroc, average_precision, binned_ood_metrics, eval_ood_measure, fpr_at_recall,
)
from .seg_metrics import compute_metric, confusion_matrix, hist_info
