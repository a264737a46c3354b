"""API-parity mirror of the reference ``utils`` package
(``/root/reference/utils/__init__.py:1-32``).

The reference's utils package was dead code (no script imported it) but is
part of the public API surface; here the same names are live and delegate to
the on-device JAX implementations in :mod:`camouflage_multimodal_tpu.eval`.
"""

from camouflage_multimodal_tpu.utils.metrics import (  # noqa: F401
    calculate_iou,
    calculate_dice,
    calculate_precision_recall_f1,
    calculate_mae,
    calculate_accuracy,
    evaluate_segmentation,
    batch_evaluate,
)
from camouflage_multimodal_tpu.utils.visualization import (  # noqa: F401
    plot_training_history,
    plot_attention_heatmap,
    plot_comparison,
    plot_metrics_summary,
)

__all__ = [
    "calculate_iou",
    "calculate_dice",
    "calculate_precision_recall_f1",
    "calculate_mae",
    "calculate_accuracy",
    "evaluate_segmentation",
    "batch_evaluate",
    "plot_training_history",
    "plot_attention_heatmap",
    "plot_comparison",
    "plot_metrics_summary",
]
