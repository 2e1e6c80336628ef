from emcid_tpu.experiments.sequential import sequential_editing
from emcid_tpu.experiments.ablation import (
    edit_weight_ablation,
    layer_combination_ablation,
    num_edit_tokens_ablation,
)
from emcid_tpu.experiments.finetune import finetune_text_encoder
