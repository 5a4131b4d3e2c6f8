from llm_bci_tpu.eval.ctc_decode import (  # noqa: F401
    CTCPrefixDecoder,
    ctc_prefix_beam_search,
)
from llm_bci_tpu.eval.eval_bci import (  # noqa: F401
    edit_distance,
    format_ctc,
    smoothed_RMS,
    word_edit_distance,
    word_error_count,
)
from llm_bci_tpu.eval.metrics import (  # noqa: F401
    bits_per_spike,
    metrics_list,
    neg_log_likelihood,
    r2_score_np,
)
