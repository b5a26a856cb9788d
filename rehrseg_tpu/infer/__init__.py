from .sliding_window import (
    compute_steps_for_sliding_window,
    sliding_window_starts,
    predict_sliding_window_logits,
    predict_sliding_window_labels,
    predict_sliding_window_dual_labels,
    predict_sliding_window_labels_many,
    predict_sliding_window_labels_streamed,
    evaluate_case_volume,
)
from .sr_infer import (
    infer_wdsr_volume,
    infer_flavr_volume,
    postprocess_sr_volume,
    interpolate_pseudo_sr,
)
