from emcid_tpu.evals.scorers import (
    calculate_single_cls_score,
    cls_scores_batched,
    make_vit_scorer,
    fid_from_features,
    frechet_distance,
    cal_nudity_rate,
)
from emcid_tpu.evals.summary import summary_key, update_summary
from emcid_tpu.evals.iceb import (
    eval_pipe_imgnet,
    emcid_test_text_encoder_imgnet,
    measure_scores,
    measure_specificity,
)
from emcid_tpu.evals.rectification import emcid_test_imgnet_mend
from emcid_tpu.evals.refact_benchmark import emcid_test as refact_emcid_test
from emcid_tpu.evals.refact_benchmark import eval_all as refact_eval_all
from emcid_tpu.evals.mixed_safety import emcid_test_sd_imgnet_and_i2p
from emcid_tpu.evals.folder_sweep import (
    ImageItem,
    extract_all_images_cls,
    extract_all_images_clip,
)
