from emcid_tpu.engine.extract import (
    RequestBatch,
    prepare_request_batch,
    module_io_at_words,
    compute_ks_text_encoder,
)
from emcid_tpu.engine.emcid import (
    apply_emcid_to_text_encoder,
    execute_emcid_text_encoder,
    apply_deltas_to_params,
)
from emcid_tpu.engine.editor import apply_emcid
from emcid_tpu.engine.compute_z import (
    ConceptBatch,
    ZOptimizer,
    compute_z_text_encoder_batch,
    prepare_concept_batch,
)
from emcid_tpu.engine.layer_stats import (
    COV_CACHE,
    get_cov_text_encoder,
    layer_stats_text_encoder,
)
from emcid_tpu.engine.uce import edit_model_uce, edit_text_encoder_uce
from emcid_tpu.engine.debias import apply_emcid_to_text_encoder_debias
from emcid_tpu.engine.sdxl import (
    apply_emcid_to_sdxl_text_encoders,
    compute_z_sdxl_text_encoders,
    execute_emcid_sd_xl_text_encoders,
)
from emcid_tpu.engine.cross_attn import (
    apply_emcid_to_cross_attn,
    execute_emcid_cross_attn,
)
from emcid_tpu.engine.unet_edit import (
    compute_delta_unet,
    execute_emcid_unet,
)
from emcid_tpu.engine.fim import fim_stats, load_fim
