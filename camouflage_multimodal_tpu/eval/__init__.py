from camouflage_multimodal_tpu.eval.metrics import (  # noqa: F401
    iou,
    dice,
    precision_recall_f1,
    mae,
    pixel_accuracy,
    s_measure,
    e_measure,
    evaluate_segmentation,
    batch_evaluate,
)
