from emcid_tpu.evals.scorers import (
    calculate_single_cls_score,
    cls_scores_batched,
    make_vit_scorer,
)
from emcid_tpu.evals.summary import summary_key, update_summary
from emcid_tpu.evals.iceb import (
    eval_pipe_imgnet,
    emcid_test_text_encoder_imgnet,
    measure_scores,
    measure_specificity,
)
