from .sliding_window import (
    compute_steps_for_sliding_window,
    sliding_window_starts,
    predict_sliding_window_logits,
    evaluate_case_volume,
)
